"""Append-only pipeline run log — the engine analog of the reference's
``dim_etl_log`` warehouse table (reference README.md:225-231, populated by
every ``SP_MERGE_DIM_*`` call at :254-266).

Stored as JSON-lines next to the zone root: human-readable, append-only,
and trivially loadable for ops queries (``spark.read.json(log.path)``).

All writes go through :func:`pipeline.run_stage`, which owns the
status/retry semantics; this module is just the durable record.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class RunLogEntry:
    run_id: str
    step: str
    status: str  # SUCCESS | FAILURE | RETRIED | SKIPPED
    started_at: float
    finished_at: float
    detail: dict = field(default_factory=dict)


class RunLog:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, entry: RunLogEntry) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(entry)) + "\n")
