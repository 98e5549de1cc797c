"""Sources and sinks (SURVEY.md §2.1), plus the ingest ledger/router."""
