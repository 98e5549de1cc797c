"""North-star queries (BASELINE.json): dedup, similarity search, text
analysis, multimodal columns over documents/embeddings. Populated
incrementally."""

from __future__ import annotations
