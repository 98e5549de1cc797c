"""Driver-visible queries for the multi-resolution time rollup and the
distributed Bloom filter (previously pytest-only surface).

The Bloom filter is probabilistic, so its oracle twin checks the DERIVED
EXACT RESULT, not the bitmap: a Bloom prefilter composed with an exact
refine join returns precisely the exact anti-join's rows (no false
negatives by construction; false positives are removed by the refine), so
the pattern is checkable against plain SQL while still exercising the
build/probe plan end-to-end.

Registered after queries_packing — keep additions at the registration tail
so an evaluation-count cap can never displace established entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import bloom_build, bloom_might_contain
from ..functions.text import fingerprint
from ..operators.aggregates import time_rollup
from ..sources.readers import read_table
from .catalog import register

_LEVELS = ("hour", "day", "month")

#: Bloom sizing for the benchmark-fingerprint set (~n/17 docs): ~1k words of
#: bitmap, broadcast-joined at probe time.
_BLOOM_BITS = 1 << 16
_BLOOM_K = 5

#: DuckDB twin of functions.text.fingerprint (md5 of normalized text).
_DUCK_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


def _rollup_oracle() -> str:
    return "\n    UNION ALL\n".join(
        f"""
    SELECT '{lv}' AS resolution,
           date_trunc('{lv}', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 2, 3"""
        for lv in _LEVELS
    )


@register(
    "time_rollup_events",
    oracle=_rollup_oracle(),
    doc="Hypertable-style multi-resolution rollup: hour/day/month buckets "
    "per event type from ONE fact-table scan and one shuffle (grouping "
    "sets over pre-truncated timestamps, level tagged via grouping_id) — "
    "instead of one scan per resolution. Oracle: UNION ALL of the three "
    "plain GROUP BYs.",
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return time_rollup(
        ev,
        "ts",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
        levels=_LEVELS,
        extra_keys=("event_type",),
    )


@register(
    "bloom_exact_decontaminate",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT {_DUCK_FP} AS fp FROM documents WHERE doc_id % 17 = 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE b.fp = {_DUCK_FP})
    """,
    doc="Exact fingerprint decontamination accelerated by a distributed "
    "Bloom filter: build a bitmap DataFrame over the benchmark "
    "fingerprints (one pass, bit_or partials), broadcast-probe the corpus, "
    "and exact-check only rows whose probes all hit (rows failing any "
    "probe bit are provably clean). ONE corpus scan, zero corpus "
    "exchanges: k bitmap probes + the bench-fingerprint check are all "
    "broadcast joins, composed with a row-local filter. At 100 TB, when "
    "the exact refine must be a shuffle join instead of a broadcast, the "
    "same gate means only the ~FPP candidate sliver shuffles — never the "
    "corpus. Result is byte-identical to the plain anti-join the oracle "
    "runs (NOT EXISTS, so NULL fingerprints stay clean on both sides).",
)
def bloom_exact_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "source", fingerprint(F.col("text")).alias("_fp"))
    bench_fps = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select(fingerprint(F.col("text")).alias("_fp"))
        .distinct()
    )
    # The bitmap is consumed once per probe join (k=5 broadcasts of the
    # same ~1k-row frame): cache so the build subplan runs once, not k times.
    bloom = bloom_build(bench_fps, "_fp", n_bits=_BLOOM_BITS, k=_BLOOM_K).cache()
    probed = bloom_might_contain(
        bloom, corpus, "_fp", n_bits=_BLOOM_BITS, k=_BLOOM_K
    )
    # Exact refine without shuffling the probed side: one more broadcast
    # join marks true benchmark hits; the bloom gate in the filter keeps a
    # provably-clean fast path (and keeps the probe chain live in the plan).
    bench_marked = bench_fps.withColumn("_bench", F.lit(True))
    return (
        probed.join(F.broadcast(bench_marked), "_fp", "left")
        .filter(~F.col("might_contain") | F.col("_bench").isNull())
        .select("doc_id", "source")
    )
