"""Append-only pipeline run log — the engine analog of the reference's
``dim_etl_log`` warehouse table (reference README.md:225-231, populated by
every ``SP_MERGE_DIM_*`` call at :254-266).

Stored as JSON-lines next to the zone root: human-readable, append-only,
and trivially loadable as a DataFrame for ops queries.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession


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

    def step(self, run_id: str, step: str):
        """Context manager: times the step and records SUCCESS/FAILURE."""
        log = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()
                self.detail: dict = {}
                return self

            def __exit__(self, exc_type, exc, tb):
                log.append(
                    RunLogEntry(
                        run_id,
                        step,
                        "FAILURE" if exc else "SUCCESS",
                        self.t0,
                        time.time(),
                        {**self.detail, **({"error": repr(exc)} if exc else {})},
                    )
                )
                return False  # propagate

        return _Ctx()

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.path)
