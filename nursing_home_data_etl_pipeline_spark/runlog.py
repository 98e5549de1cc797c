"""Append-only pipeline run log — the analog of the reference's
``dim_etl_log`` table (README.md:225-231, populated by SP_MERGE_DIM_* at
:254-266); JSON-lines next to the zone root, loadable via
``spark.read.json(log.path)``. pipeline.run_stage owns status/retry
semantics; this module is just the durable record."""

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
        # Driver-local open(): a URI-scheme path would silently land the
        # durable run record on one machine's disk (round-8 IO hunt) —
        # fail loudly, like the sync/archive file ops.
        if "://" in path:
            raise ValueError(
                f"RunLog requires a local-filesystem path (driver-local "
                f"append), got {path!r} — point it at a local log dir or a "
                "mounted store"
            )
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, entry: RunLogEntry) -> None:
        with open(self.path, "a") as f:
            # default=repr: unserializable detail degrades to repr, never
            # throws — an append failure after side effects committed once
            # re-ran committed work (round-8 IO hunt).
            f.write(json.dumps(asdict(entry), default=repr) + "\n")
