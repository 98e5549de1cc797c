"""The pipeline DAG as a Python driver (SURVEY.md §3.1).

Replaces the reference's EventBridge -> Step Function -> {Lambda, Glue job}
orchestration (cloudformation/04_stepfunction-pipeline.yml:47-190) with one
driver function over a single SparkSession:

    sync -> universal cleaning -> archive -> validate -> [provider ∥ quality]
         -> warehouse merge -> run log

The parallel stage uses a thread pool: two concurrent *actions* on one
session — Spark's scheduler interleaves both DAGs across the executors,
which is the engine-native version of the reference's two parallel Glue
clusters (and cheaper: no second cluster spin-up, shared broadcast state).

Fail-fast semantics match the state machine's Catch->FailAll, with two
deliberate fixes: the validation gate *raises* (the reference's Lambda
returned an error status that the state machine ignored — SURVEY §3.1.5),
and there is no fixed 10s sleep (WaitForCleaning) because sequencing within
one driver is already consistent.
"""

from __future__ import annotations

import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .operators.joins import merge_scd1
from .runlog import RunLog
from .sources.ingest import (
    DEFAULT_FILE_TYPE_MAPPING,
    IngestLedger,
    archive_source_files,
    sync_landing_to_source,
)
from .sources.readers import path_exists, read_parquet
from .sources.validate import DEFAULT_REQUIRED_DOMAINS, require_staged
from .sources.writers import replace_dir
from .transforms import PK, provider_transform, quality_transform, universal_cleaning
from .zones import ZoneLayout

#: transform-zone output -> warehouse dim name (reference README.md:247-252).
DIM_TABLES = {
    "facility": "dim_facility",
    "staffing": "dim_staffing",
    "rating": "dim_rating",
    "surveys": "dim_surveys",
    "penalties": "dim_penalties",
    "quality": "dim_quality",
}


@dataclass
class PipelineResult:
    run_id: str
    synced: int = 0
    staged: list[str] = field(default_factory=list)
    archived: dict[str, int] = field(default_factory=dict)
    transformed: dict[str, str] = field(default_factory=dict)
    merged: list[str] = field(default_factory=list)


def merge_warehouse(
    spark: SparkSession, zones: ZoneLayout, outputs: dict[str, str]
) -> list[str]:
    """SCD1-merge every transform output into its warehouse dim — the
    engine's replacement for Snowflake SP_MERGE_ALL_DIMS (README.md:238-269).
    First run bootstraps the dim from the source as-is. The merge key is the
    facility PK (plus measure_code for the quality grain).
    """
    merged = []
    for output, dim in DIM_TABLES.items():
        if output not in outputs:
            continue
        source = read_parquet(spark, outputs[output])
        keys = [PK, "measure_code"] if output == "quality" else [PK]
        target_path = zones.warehouse(dim)
        # Bootstrap ONLY when the target verifiably does not exist. A broad
        # except here would turn any transient read or schema-drift error
        # into "first run" and silently replace the whole dim with the
        # current batch (ADVICE round 1) — merge errors must propagate.
        if path_exists(spark, target_path):
            target = read_parquet(spark, target_path)
            result = merge_scd1(target, source.select(*target.columns), keys)
        else:
            result = source  # first run bootstraps the dim
        # Plain Parquet has no transactional MERGE: materialize to a staging
        # suffix and swap in with an atomic delete+rename.
        replace_dir(result, target_path)
        merged.append(dim)
    return merged


def run(
    spark: SparkSession,
    zones: ZoneLayout,
    landing_dir: str | None = None,
    required_domains: tuple[str, ...] = DEFAULT_REQUIRED_DOMAINS,
    mapping: dict[str, str] | None = None,
    run_log_path: str | None = None,
) -> PipelineResult:
    """Execute the full pipeline once (the daily-cron body)."""
    mapping = mapping or DEFAULT_FILE_TYPE_MAPPING
    zones.ensure()
    log = RunLog(run_log_path or f"{zones.root}/run_log.jsonl")
    res = PipelineResult(run_id=uuid.uuid4().hex[:12])

    if landing_dir:
        with log.step(res.run_id, "sync") as s:
            ledger = IngestLedger(spark, f"{zones.root}/ingest_ledger")
            res.synced = sync_landing_to_source(
                spark, landing_dir, zones, ledger, mapping
            )
            s.detail["synced"] = res.synced

    with log.step(res.run_id, "universal_cleaning") as s:
        res.staged = universal_cleaning(spark, zones)
        s.detail["staged"] = res.staged

    with log.step(res.run_id, "archive") as s:
        known = {d for d in mapping.values() if d != "unknown"}
        res.archived = archive_source_files(zones, known)
        s.detail.update(res.archived)

    with log.step(res.run_id, "validate"):
        require_staged(spark, zones, required_domains)

    with log.step(res.run_id, "transform_parallel") as s:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_provider = pool.submit(provider_transform, spark, zones)
            f_quality = pool.submit(quality_transform, spark, zones)
            res.transformed = {**f_provider.result(), **f_quality.result()}
        s.detail["outputs"] = sorted(res.transformed)

    with log.step(res.run_id, "warehouse_merge") as s:
        res.merged = merge_warehouse(spark, zones, res.transformed)
        s.detail["dims"] = res.merged

    return res
