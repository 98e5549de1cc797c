"""Catalog TAIL: the last registration block of the 50-entry driver window
(import order IS catalog order — see plans/__init__.py). Cohesion here is
POSITION, not topic — file index:
  dedup_clusters | tfidf_terms | similarity_ann_ivf | four streaming
  drains (windowed/session/stateful/join+dedup) | pack_training_sequences
  | tpch_shapes_q4_q13_q18

THE EVENT-TIME CONTRACT (canonical statement; every watermark-bearing
oracle in this file points here): (1) a NULL event time belongs to no
window/session and never enters a stateful op; (2) Spark initializes the
watermark to 0 and its late filter drops rows at-or-before it even in the
first microbatch — for plain watermark ops that is epoch_us(ts) > 0, for
session windows the event's own window END tests the watermark, so the
filter is ts + gap > 0 (both probed empirically, round 7); (3) identity-
keyed stateful ops (dedup) also exclude NULL-id rows — the state store
would fold every NULL key into one group and keep an arbitrary first
arrival (round-8 fuzz; same contract as minhash/exact dedup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import duck_words_sql, words
from ..functions.vectors import cosine_rounded_prenorm
from ..functions.vectors import norm as vec_norm
from ..operators.similarity import _rank_topk
from ..operators.components import dup_clusters
from ..operators.dedup import minhash_dedup_pairs
from ..sources.readers import read_table
from .catalog import register
from .queries_northstar import _cc_comp_cte, _minhash_pairs_cte


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    {_cc_comp_cte("documents WHERE doc_id IS NOT NULL")},
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
    FROM comp JOIN sizes USING (cluster_id)
    """


@register(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    doc="Near-dup CLUSTERS from MinHash-LSH pairs via distributed "
    "connected components (min-label propagation, diameter rounds, two "
    "hash joins each); keep-one dedup is doc_id == cluster_id. Oracle: "
    "recursive-CTE reachability. Contract: NULL-id rows excluded both "
    "sides (no identity to propagate or join on).",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    pairs = minhash_dedup_pairs(docs)
    return dup_clusters(docs, pairs)

# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


@register(
    "tfidf_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({duck_words_sql('lower(text)')}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term,
             COUNT(*) AS n,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
      FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n_docs AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id,
           tf.term,
           ROUND((CAST(tf.n AS DOUBLE) / tf.doc_len)
                 * (ln((n_docs.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n_docs
    """,
    doc="TF-IDF: per-doc term frequency x smoothed IDF — explode + two "
    "hash aggregations + an equi-join on the vocabulary-sized df table "
    "(AQE sizes the join; a pinned hint would OOM at a billion-term "
    "vocabulary); no Python. Tokenization is the shared blank-safe "
    "words()/duck_words_sql pair — no phantom '' terms.",
)
def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(words(F.lower(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    # doc_len over tf, not toks: the window input is the (doc, term)-sized
    # aggregate. (A row-local size(words) carried through the explode would
    # be cheaper still, but NULL-id docs merge into ONE group here and their
    # doc_len must SUM across the merged docs — the window is the semantic.)
    tf = tf.withColumn("doc_len", F.sum("n").over(Window.partitionBy("doc_id")))
    # Two-level doc frequency: tf already holds one row per (doc, term), so
    # df is a cheap count over tf — reusing tf's exchange — instead of a
    # countDistinct(doc_id) re-aggregation of the token-sized relation
    # (which Spark plans as Expand + two extra shuffles of toks).
    # count("doc_id") skips NULL-id docs, matching COUNT(DISTINCT doc_id).
    df = tf.groupBy("term").agg(F.count("doc_id").alias("df"))
    # Corpus size as a broadcast 1-row aggregate instead of a driver-side
    # .count(): the whole query stays one lazy plan, no extra job.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    return (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("n").cast("double") / F.col("doc_len"))
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-style ANN
# ---------------------------------------------------------------------------

_N_CELLS = 8
_N_PROBE = 2  # query probes its 2 nearest cells — the IVF recall/cost knob

#: Long-form embeddings + norms, the fixed-dim contract, the query-batch /
#: top-k sizes, and the cand->dots->scored/top-k SQL tails: ONE definition
#: each, imported from queries_northstar — a contract change there reaches
#: the IVF oracle automatically instead of via a hand-kept copy.
from .queries_northstar import _DIM_CONTRACT, _N_QUERIES, _TOP_K  # noqa: E402
from .queries_northstar import _DUCK_COSINE_BASE as _DUCK_EX  # noqa: E402
from .queries_northstar import _TOPK_TAIL, _cand_scored_sql  # noqa: E402
import uuid  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from ..streaming.aggregations import (  # noqa: E402
    running_totals_stateful, session_counts, windowed_counts)
from ..operators.dedup import hex_to_bigint_sql  # noqa: E402
from ..operators.packing import pack_sequences  # noqa: E402


def _ivf_oracle() -> str:
    return f"""
    WITH {_DUCK_EX},
    cents AS (
      -- seed slots restricted to VALID vectors (full-dim, non-NULL
      -- elements, nonzero norm) — full rationale at the engine's cents
      -- filter in similarity_ann_ivf below
      SELECT vec_id AS cent_id, i, x FROM ex
      WHERE vec_id < {_N_CELLS} AND vec_id IN (SELECT vec_id FROM norms)
    ),
    assign AS (
      SELECT e.vec_id, c.cent_id,
             SUM((e.x - c.x) * (e.x - c.x)) AS d2
      FROM ex e JOIN cents c USING (i)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT vec_id, cent_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
      FROM assign
    ),
    cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
    qprobe AS (
      SELECT vec_id, cent_id AS cell FROM ranked
      WHERE rn <= {_N_PROBE} AND vec_id < {_N_QUERIES}
    ),
    {_cand_scored_sql('''
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qprobe q JOIN cells c ON q.cell = c.cell
      WHERE c.vec_id <> q.vec_id''')}
    {_TOPK_TAIL}
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    doc="IVF-style ANN: coarse quantizer (first 8 vectors as fixed cells, "
    "training-free), corpus assigned to nearest cell by L2 (min_by with "
    "(distance, cell_id) tiebreak), queries probe their nprobe=2 nearest "
    "cells with exact cosine — the IVF recall/cost knob; near-boundary "
    "queries recover missed neighbors for 2x work on the bounded query "
    "side only. The cell equi-join replaces the cross join.",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-dim contract: a ragged vector would NULL out its L2 distance
    # to every centroid (zip_with NULL-pads) while the long-form oracle
    # would rank it by a partial distance.
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == _DIM_CONTRACT
    )
    # Seed slots must be VALID vectors (all elements non-NULL, nonzero
    # norm — vec_norm is NULL on a NULL element, failing > 0): one broken
    # seed would otherwise NULL every d2 and collapse the whole corpus
    # into its cell (and the oracle, whose SUM skips NULL addends, would
    # assign by partial distances instead). Mirrors the cents CTE.
    cents = (
        emb.filter(
            (F.col("vec_id") < _N_CELLS) & (vec_norm(F.col("embedding")) > 0)
        )
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))
    )
    # L2 distance via zip_with fold; min_by with deterministic tiebreak.
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cvec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored_cells = emb.join(F.broadcast(cents)).select(
        "vec_id", "embedding", "cent_id", d2.alias("d2")
    )
    # Corpus side: ONE cell per vector via a single hash aggregate (never a
    # window over the full corpus). The norm is computed here — once per
    # VECTOR, not per candidate pair (HOF folds are the per-pair cost).
    assigned = (
        scored_cells.groupBy("vec_id")
        .agg(
            F.expr("min_by(cent_id, struct(d2, cent_id))").alias("cell"),
            F.first("embedding").alias("embedding"),
        )
        .withColumn("_nrm", vec_norm(F.col("embedding")))
        # NULL/zero-norm vectors have no cosine — excluded (same contract
        # as operators.similarity; one dirty row must not abort the job).
        .filter(F.col("_nrm") > 0)
    )
    # Query side is a bounded batch — the nprobe ranking window only ever
    # sees n_queries x n_cells rows.
    wq = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cent_id"))
    q = (
        scored_cells.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= _N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("cell"),
            F.col("embedding").alias("_qv"),
            vec_norm(F.col("embedding")).alias("_qn"),
        )
        .filter(F.col("_qn") > 0)
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell"),
        F.col("embedding").alias("_cv"),
        F.col("_nrm").alias("_cn"),
    )
    # A query appears once per probed cell and each neighbor owns ONE cell,
    # so (query, neighbor) pairs are already distinct — no dedup needed.
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_rounded_prenorm(
            F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
        ).alias("cos_sim"),
    )
    return _rank_topk(scored, _TOP_K)


# ===========================================================================
# Streaming queries under the driver contract: each runs a bounded
# ===========================================================================

# ts nanos-as-long here; stream_events substitutes the probed ts type.
_EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField(n, t()) for n, t in (
        ("event_id", T.LongType), ("ts", T.LongType), ("user_id", T.LongType),
        ("event_type", T.StringType), ("value", T.DoubleType),
        ("props", T.StringType),
    )
])


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded file stream over the events table, with ``ts`` normalized to
    TimestampType (LTZ, UTC session tz) — the streaming twin of
    ``sources.readers.read_table``. The on-disk encoding has varied across
    testdata generations (TIMESTAMP(NANOS) vs plain micros / NTZ), so probe
    the batch-inferred type once (footer-only) and build the matching
    streaming schema.

    ``max_files_per_trigger`` (round-10 directive #2) splits a multi-file
    table across MICROBATCHES — real streams are never single-batch; the
    complete-mode drains must (and do) converge to the same final table
    under incremental delivery, which only holds because complete mode
    retains all aggregate state (watermark never evicts it)."""
    from ..sources.readers import (
        normalize_events_ts,
        path_is_dir,
        pin_events_time_confs,
    )

    pin_events_time_confs(spark)  # shared encoding contract (readers.py)
    events_path = f"{sf_dir}/events.parquet"
    ts_type = dict(spark.read.parquet(events_path).dtypes).get("ts")
    # Directory-shaped tables stream directly; a single file needs the glob
    # filter — but pathGlobFilter matches LEAF names, so applying it to a
    # directory table would silently drain an empty stream.
    if path_is_dir(spark, events_path):
        reader, stream_path = spark.readStream, events_path
    else:
        reader = spark.readStream.option("pathGlobFilter", "events.parquet")
        stream_path = sf_dir
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # readStream needs an EXPLICIT schema: substitute the probed ts type,
    # then normalize through the same shared helper the batch reader uses.
    if ts_type == "bigint":  # nanos-as-long generation
        raw = reader.schema(_EVENTS_RAW_SCHEMA).parquet(stream_path)
    else:
        fields = [
            f if f.name != "ts" else T.StructField(
                "ts",
                T.TimestampNTZType()
                if ts_type == "timestamp_ntz"
                else T.TimestampType(),
            )
            for f in _EVENTS_RAW_SCHEMA.fields
        ]
        raw = reader.schema(T.StructType(fields)).parquet(stream_path)
    return normalize_events_ts(raw, ts_type)


def _drain_to_memory(
    df: DataFrame,
    output_mode: str,
    state_partitions: int = 8,
    require_single_batch: bool = False,
    require_multi_batch: bool = False,
) -> DataFrame:
    """Run the streaming plan to completion into a memory sink; return the
    result table. Bounded input + processAllAvailable => deterministic.

    Stateful streaming cost scales with state-store instances — one per
    shuffle partition, each with a maintenance thread, checkpoint files,
    and (applyInPandasWithState) a Python worker. The batch default (32)
    is far past the sweet spot for bounded drains, so pin the stream's
    state partitioning low (captured into the checkpoint at query start;
    the conf is restored for batch plans). On a real cluster size this to
    state volume / executor count.

    ``require_single_batch``: the exact-oracle contract for watermark-
    bearing drains holds because the file source delivers the whole
    bounded input in ONE microbatch (no maxFilesPerTrigger), so the
    watermark never advances past unprocessed rows — True ASSERTS that,
    so a trigger/option change fails loudly instead of silently turning
    the exact contract probabilistic.

    ``require_multi_batch``: the inverse guard for the INCREMENTAL-delivery
    contract (complete-mode drains over a maxFilesPerTrigger source): a
    single-file fixture would silently degrade the multi-batch check back
    to the single-batch case — True asserts >1 fed microbatches. Only
    complete-mode drains can carry this flag exactly: update-mode memory
    sinks append one row per key per TRIGGER (duplicated keys across
    batches), and append-mode watermark drains drop rows that arrive after
    the watermark passed them (delivery-order-dependent), so neither has a
    batching-independent exact oracle.

    Lifecycle: the returned DataFrame reads the ``stream_out_<uuid>``
    memory-sink table, so it cannot be dropped here; retained rows are
    result-sized. A long-lived service would write a real sink instead.
    """
    spark = df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
            if require_single_batch or require_multi_batch:
                prog = q.recentProgress
                # recentProgress is a RING BUFFER (default cap 100): a
                # drain spanning more microbatches than the cap would
                # silently undercount fed batches (ADVICE r10) — refuse to
                # trust a possibly-saturated buffer.
                cap = int(spark.conf.get(
                    "spark.sql.streaming.numRecentProgressUpdates", "100"))
                if len(prog) >= cap:
                    raise AssertionError(
                        f"recentProgress holds {len(prog)} >= cap {cap} "
                        "entries; batch-count guards would undercount"
                    )
                fed = [p for p in prog if p.numInputRows > 0]
                if require_single_batch and len(fed) > 1:
                    raise AssertionError(
                        f"bounded drain spanned {len(fed)} microbatches; "
                        "the exact-oracle watermark contract assumes one"
                    )
                if require_multi_batch and len(fed) < 2:
                    raise AssertionError(
                        f"drain fed {len(fed)} microbatch(es); the "
                        "incremental-delivery contract needs >1"
                    )
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(name)


@register(
    "streaming_windowed_agg",
    oracle="""
    -- FLOORED division to the window start: DuckDB's // truncates toward
    -- zero, which would snap a pre-epoch (negative-us) event to window 0
    -- instead of its true 1969 window; Spark's window() floors.
    SELECT make_timestamp(
             epoch_us(ts)
               - (((epoch_us(ts) % 21600000000) + 21600000000) % 21600000000)
           ) AS window_start,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 4)  AS sum_value
    FROM events
    -- event-time contract (1), module docstring
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Streaming tumbling-window aggregation (watermark + complete mode, "
    "drained over the bounded events table) — must equal the batch window "
    "query exactly: the batch/stream equivalence contract.",
)
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(windowed_counts(ev), "complete")


@register(
    "streaming_session_counts",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             ts,
             event_id,
             epoch_us(ts) AS us,
             -- STRICTLY greater: session_window MERGES an event at
             -- exactly last+gap (probed on a 12:00/12:30 pair, round-8
             -- hunt — the inclusive-boundary contract in BASELINE.md)
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                        > 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      -- event-time contract (1)+(2), module docstring: session windows
      -- test the event's own window END, so ts + gap > 0, NOT ts >= 0
      WHERE ts IS NOT NULL AND epoch_us(ts) + 1800000000::BIGINT > 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST)
    ), sessions AS (
      SELECT user_id, us,
             -- same (ts, event_id) tiebreak as the flagged window: with a
             -- bare ORDER BY ts, equal-ts rows could order differently in
             -- the two windows and a session-start flag could land inside
             -- the PREVIOUS session's cumulative range
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(us)  AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Streaming session windows (30-min gap): the stream twin of batch "
    "sessionization. Gap-boundary semantics (execution-probed, round 8): "
    "an event at exactly last+gap MERGES into the running session — "
    "session_window extends inclusively — so the oracle splits only on "
    "strictly-greater gaps.",
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(session_counts(ev), "complete")


@register(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id,
           COUNT(*)             AS n_events,
           -- NaN totals emit as NULL: the Arrow pandas-worker boundary
           -- uses NaN as its null sentinel, so the Python-side stateful
           -- operator cannot represent a NaN result (documented in
           -- streaming/aggregations._accumulate); Inf round-trips fine
           CASE WHEN isnan(SUM(value)) THEN NULL
                ELSE ROUND(SUM(value), 4) END AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState): per-user running "
    "totals. Over bounded single-batch input the final state equals the "
    "batch aggregate — checked against plain SQL. Single-batch delivery is "
    "ASSERTED: the update-mode memory sink appends one row per key per "
    "trigger, so a multi-batch drain would duplicate keys (the complete-"
    "mode drains above replace the table each trigger and don't need the "
    "guard).",
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return _drain_to_memory(
        running_totals_stateful(ev), "update", require_single_batch=True
    )

# ===========================================================================
# (merged from queries_packing) Sequence-packing catalog query: documents -> fixed-budget training
# ===========================================================================

_BUDGET = 512
_N_SHARDS = 64
_DUCK_SHARD = (
    hex_to_bigint_sql(
        "md5('pack' || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || '<null>'))",
        n_chars=8,
    )
    + f" % {_N_SHARDS}"
)


def _packing_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             len({duck_words_sql("text")}) AS tok,
             {_DUCK_SHARD} AS shard
      FROM documents
      -- blank/NULL-text docs own no token interval (pack_sequences
      -- filters _tok > 0)
      WHERE tok > 0
    ),
    placed AS (
      SELECT doc_id, tok,
             CAST(COALESCE(SUM(tok) OVER (
               -- tok mirrors pack_sequences' duplicate-id tiebreaker:
               -- two NULL-id docs tie on (shard, id) alone and their
               -- placement order was engine-partition-dependent
               ORDER BY shard, doc_id NULLS FIRST, tok NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS s0
      FROM toks
    ),
    spans AS (
      SELECT doc_id, s0, tok,
             unnest(generate_series(s0 // {_BUDGET}, (s0 + tok - 1) // {_BUDGET}))
               AS seq_id
      FROM placed
    )
    SELECT doc_id,
           seq_id,
           GREATEST(s0, seq_id * {_BUDGET}) - seq_id * {_BUDGET} AS seq_offset,
           LEAST(s0 + tok, (seq_id + 1) * {_BUDGET})
             - GREATEST(s0, seq_id * {_BUDGET}) AS n_tokens,
           GREATEST(s0, seq_id * {_BUDGET}) = s0 AS is_head
    FROM spans
    """


@register(
    "pack_training_sequences",
    oracle=_packing_oracle(),
    doc="GPT-style concat-and-chunk sequence packing: place every document's "
    "word-token interval into a stream of back-to-back 512-token training "
    "sequences; long documents straddle boundaries. Spark side is the "
    "two-level distributed prefix sum (per-shard window cumsum + broadcast "
    "shard offsets — no corpus-sized single-partition stage); the oracle "
    "replays the same placement with one flat window.",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", F.size(words(F.col("text"))).cast("long").alias("n_tok")
    )
    return pack_sequences(
        with_tok, "n_tok", budget=_BUDGET, id_col="doc_id", n_shards=_N_SHARDS
    )

# ===========================================================================
# (merged from queries_streamjoin_cms) Driver-visible query for the watermark-bearing streaming operators:
# ===========================================================================

_WINDOW = "INTERVAL 1 HOUR"


@register(
    "streaming_join_dedup",
    oracle=f"""
    SELECT 'interval_join' AS variant,
           c.event_id,
           c.user_id,
           p.value AS num,
           CAST(epoch_us(p.ts) AS VARCHAR) AS tag
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + {_WINDOW}
    -- event-time contract (2) on BOTH join inputs, module docstring
    WHERE epoch_us(c.ts) > 0 AND epoch_us(p.ts) > 0
    UNION ALL
    -- DISTINCT mirrors dedup-by-event_id for VERBATIM duplicate source
    -- rows (a re-delivered event collapses on both sides — round-8 fuzz).
    -- Duplicate ids with DIFFERING payloads are excluded by fixture
    -- policy: the engine keeps whichever copy arrives first, an
    -- order-dependent pick no SQL oracle can reproduce (same class as
    -- DuckDB's native ASOF under ties).
    SELECT DISTINCT 'dedup', event_id, user_id, CAST(NULL AS DOUBLE), event_type
    FROM events
    -- event-time contract (1)+(2)+(3), module docstring
    WHERE epoch_us(ts) > 0 AND event_id IS NOT NULL
    """,
    doc="Watermark-bearing streaming operators, one tagged row set per "
    "drain. variant='interval_join' (num = purchase value, tag = purchase "
    "ts micros): stream-stream interval join, clicks to same-user "
    "purchases within 1 hour; both sides buffer bounded state keyed by "
    "watermark + time-range; over bounded input it must equal the batch "
    "interval join (stream-stream twin of the equivalence contract). "
    "variant='dedup' (tag = event_type): every event delivered twice "
    "(self-union), deduped on event_id via dropDuplicatesWithinWatermark; "
    "per-key state drops once the watermark passes, so state scales with "
    "the in-flight window, not all history — the difference between a "
    "dedup that survives a year of stream and one that OOMs.",
)
def streaming_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_cols = ["variant", "event_id", "user_id", "num", "tag"]

    ev = stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(f"c_user = p_user AND p_ts >= c_ts AND p_ts < c_ts + {_WINDOW}"),
    ).select(
        F.lit("interval_join").alias("variant"),
        "event_id",
        F.col("c_user").alias("user_id"),
        F.col("value").alias("num"),
        F.unix_micros(F.col("p_ts")).cast("string").alias("tag"),
    )
    interval = _drain_to_memory(joined, "append", require_single_batch=True)

    cols = ["event_id", "user_id", "event_type", "ts"]
    # SELF-union: each union leg re-reads the file source, so every event
    # arrives twice — identical to two separately built streams; reusing
    # `ev` (a plan, not a running query) skips a second footer probe.
    a = ev.select(cols)
    deduped = (
        # event-time contract (1)+(3), module docstring — explicit filter
        # because dropDuplicatesWithinWatermark would otherwise pass
        # NULL-ts rows (NULL < watermark is NULL, not true)
        a.unionByName(a)
        .filter(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.lit("dedup").alias("variant"),
            "event_id",
            "user_id",
            F.lit(None).cast("double").alias("num"),
            F.col("event_type").alias("tag"),
        )
    )
    dedup = _drain_to_memory(deduped, "append", require_single_batch=True)

    return interval.select(*out_cols).unionByName(dedup.select(*out_cols))

# ===========================================================================
# (merged from queries_tail2) TPC-H-shaped multi-join queries beyond Q3/Q5/Q10/Q14: Q4 (EXISTS
# ===========================================================================

_NULL_COLS_SQL = (
    "CAST(NULL AS BIGINT) AS k_id, CAST(NULL AS BIGINT) AS k_id2, "
    "CAST(NULL AS VARCHAR) AS k_date, CAST(NULL AS DOUBLE) AS price, "
    "CAST(NULL AS DOUBLE) AS qty"
)


@register(
    "tpch_shapes_q4_q13_q18",
    oracle=f"""
    SELECT 'q4' AS variant,
           o.o_orderpriority AS k_str,
           {_NULL_COLS_SQL},
           COUNT(*) AS cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    UNION ALL
    SELECT 'q13',
           CAST(NULL AS VARCHAR),
           c_count,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           COUNT(*)
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    UNION ALL
    SELECT 'q18',
           c.c_name,
           o.o_orderkey,
           c.c_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d'),
           ROUND(o.o_totalprice, 2),
           -- qty rounded like price: a raw double SUM is summation-order
           -- sensitive (Spark partial-merge vs DuckDB scan order) past the
           -- verifier's 6-decimal canon under catastrophic cancellation
           ROUND(SUM(l.l_quantity), 2),
           CAST(NULL AS BIGINT)
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 260
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="Three TPC-H shapes, one tagged row set per query. variant='q4': "
    "a quarter of orders EXISTS-correlated to late-shipping lineitems, "
    "counted per priority — plans as a LEFT SEMI join that never "
    "duplicates orders, with the correlated date comparison riding the "
    "join condition. variant='q13': per-customer order counts INCLUDING "
    "zero-order customers (left outer join, COUNT of the nullable key, "
    "not COUNT(*)), then the histogram of counts — its shuffle input is "
    "one row per customer. variant='q18': orders whose total quantity "
    "clears a threshold (HAVING subquery -> aggregate + semi join), "
    "re-joined to customer detail — only the tiny big-order key set "
    "carries a broadcast hint; the sf-scaling joins are left to AQE.",
)
def tpch_shapes_q4_q13_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import tag_union

    types = {
        "k_str": "string", "k_id": "long", "k_id2": "long",
        "k_date": "string", "price": "double", "qty": "double", "cnt": "long",
    }

    def tag(df: DataFrame, variant: str, **cols) -> DataFrame:
        return tag_union(df, variant, types, **cols)

    # --- q4: EXISTS semi-join with correlated date bound ------------------
    o4 = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l4 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o4.join(
        l4,
        (o4["o_orderkey"] == l4["l_orderkey"])
        & (l4["l_shipdate"] > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    q4 = tag(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")),
        "q4",
        k_str=F.col("o_orderpriority"),
        cnt=F.col("cnt"),
    )

    # --- q13: outer-join count distribution -------------------------------
    c13 = read_table(spark, sf_dir, "customer").select("c_custkey")
    o13 = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c13.join(o13, c13["c_custkey"] == o13["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    q13 = tag(
        per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("cnt")),
        "q13",
        k_id=F.col("c_count"),
        cnt=F.col("cnt"),
    )

    # --- q18: having-subquery detail join ---------------------------------
    l18 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l18.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_s"))
        .filter(F.col("_s") > 260)
        .select("l_orderkey")
    )
    # Only the tiny big-order key set gets an explicit broadcast hint; the
    # orders/customer sides are data-dependent — AQE picks their strategy.
    o18 = read_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c18 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = l18.join(o18, l18["l_orderkey"] == o18["o_orderkey"]).join(
        c18, o18["o_custkey"] == c18["c_custkey"]
    )
    q18 = tag(
        joined.groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        ).agg(F.round(F.sum("l_quantity"), 2).alias("qty")),
        "q18",
        k_str=F.col("c_name"),
        k_id=F.col("o_orderkey"),
        k_id2=F.col("c_custkey"),
        k_date=F.date_format("o_orderdate", "yyyy-MM-dd"),
        price=F.round(F.col("o_totalprice"), 2),
        qty=F.col("qty"),
    )

    return q4.unionByName(q13).unionByName(q18)
