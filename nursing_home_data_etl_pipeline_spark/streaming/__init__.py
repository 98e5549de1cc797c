"""Structured Streaming surface: streaming ingest (the manifest-dedup file
source done natively), watermarked event-time aggregation, session windows,
and a custom stateful operator."""
