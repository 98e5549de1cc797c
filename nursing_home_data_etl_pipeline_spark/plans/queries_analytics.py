"""Capability-gap queries (SURVEY.md §2.8): filters, aggregations, windows,
sorts, set ops — the general query surface the reference never exercises.
Populated incrementally."""

from __future__ import annotations
