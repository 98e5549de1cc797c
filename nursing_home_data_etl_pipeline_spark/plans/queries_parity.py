"""Reference-parity queries (SURVEY.md §2.1-2.6) over the driver test tables.

Role mapping (FIXTURES.md §2): ``customer`` plays the wide provider_info
entity table, ``nation``/``region`` the small enrich dims (survey_summary),
``orders`` the multi-row-per-key penalties table, ``lineitem`` the
facility x measure fact grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import duck_trim_sql
from ..operators.cleaning import cast_all_to_string, clean_table
from ..operators.ids import with_dense_id, with_etl_date, with_etl_metadata
from ..operators.joins import anti_join, left_enrich, merge_scd1, merge_scd2
from ..operators.projections import select_columns
from ..sources.readers import read_table
from .catalog import register, tag_union

# ---------------------------------------------------------------------------
# P1+P2+P3+F1: universal cleaning (nh-etl-universal-cleaning.py:35-52,81-83)
# ---------------------------------------------------------------------------

#: Dirty CMS-style headers mapped onto the customer table — exercises name
#: normalization (specials/case), the semantic rename map (CCN ->
#: facility_number), and whole-row trim, exactly the universal-cleaning path.
_DIRTY_CUSTOMER_HEADERS = [
    " CMS Certification Number (CCN) ",  # -> cms_certification_number_ccn -> facility_number
    "Provider Name",  # -> provider_name -> facility_name
    "Nation-Key",  # -> nation_key
    "Account.Balance",  # -> account_balance
    "Market Segment/Code",  # -> market_segment_code
]


def _dense_id_sql(*cols: str) -> str:
    """Oracle tail of the etl-metadata stamp — the dense-id tie contract
    (ids._tiebreak): row_id is a ROW_NUMBER over the CLEANED key then every
    remaining display column in frame order, NULLS FIRST each, so duplicate
    keys (a re-registered CCN) and trim-collided groups get deterministic
    ids on both sides; plus the CURRENT_DATE etl stamp."""
    order = ",\n                              ".join(
        f"{c} NULLS FIRST" for c in cols
    )
    return (f"ROW_NUMBER() OVER (ORDER BY {order}) AS row_id,\n"
            "           CURRENT_DATE AS etl_date")


@register(
    "cms_clean_project",
    oracle=f"""
    WITH cleaned AS (
      -- mirrors the pipeline exactly: whole-row SPACE-ONLY trim
      -- (duck_trim_sql — clean_table trims every string column with
      -- F.trim, which strips 0x20 only; DuckDB's TRIM would over-strip
      -- NBSP/U+3000) and TRY_CAST for the DECIMAL money render (Spark
      -- ANSI casts a NaN double to DECIMAL as NULL; DuckDB's plain CAST
      -- hard-errors)
      SELECT CAST(c_custkey AS VARCHAR)    AS facility_number,
             {duck_trim_sql("c_name")}     AS facility_name,
             CAST(c_nationkey AS VARCHAR)  AS nation_key,
             CAST(CASE WHEN isnan(c_acctbal) THEN NULL ELSE TRY_CAST(c_acctbal AS DECIMAL(18,2)) END AS VARCHAR) AS account_balance,
             {duck_trim_sql("c_mktsegment")} AS market_segment_code
      FROM customer
    )
    SELECT *,
           {_dense_id_sql("facility_number", "facility_name", "nation_key",
                          "account_balance", "market_segment_code")}
    FROM cleaned
    """,
    doc="The universal-cleaning -> stamp pipeline exactly as the reference chains "
    "it: dirty CMS headers -> normalized names, semantic rename map, all-string "
    "ingest parity. Full contract: docs/CONTRACTS.md#cms_clean_project",
)
def cms_clean_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_table(spark, sf_dir, "customer").toDF(*_DIRTY_CUSTOMER_HEADERS)
    # money renders via DECIMAL on both engines: Spark's double->string
    # switches to scientific notation at 1e7 where DuckDB never does
    # (skew-axis finding, round 7)
    raw = raw.withColumn(
        "Account.Balance", F.col("`Account.Balance`").cast("decimal(18,2)")
    )
    raw = cast_all_to_string(raw)
    # Pad one column with whitespace so trim provably does work.
    raw = raw.withColumn(
        "Provider Name", F.concat(F.lit("  "), F.col("`Provider Name`"), F.lit("   "))
    )
    cleaned = clean_table(raw)
    # with_etl_metadata, not flat with_dense_id: the size-aware flat/sharded
    # switch keeps a fact-sized table off a single-partition window sort —
    # identical ids either way (same order_by, same tiebreak)
    return with_etl_metadata(cleaned, order_by=["facility_number"])


# ---------------------------------------------------------------------------
# J1: left equi-join enrich chain (nh-etl-provider-transform.py:84-88)
# ---------------------------------------------------------------------------


@register(
    "left_join_enrich",
    oracle="""
    SELECT c.c_custkey  AS facility_number,
           c.c_name     AS facility_name,
           c.c_acctbal  AS account_balance,
           n.n_name     AS nation_name,
           r.r_name     AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Left equi-join enrichment against broadcast dimension tables (nh-etl- "
    "provider- transform.py:84-88); two-hop chain, both. Full contract: "
    "docs/CONTRACTS.md#left_join_enrich",
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    region = read_table(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    out = left_enrich(customer, nation, on="c_nationkey")
    out = left_enrich(out, region, on="n_regionkey")
    renames = {"c_custkey": "facility_number", "c_name": "facility_name",
               "c_acctbal": "account_balance", "n_name": "nation_name",
               "r_name": "region_name"}
    return out.select(*[F.col(s).alias(d) for s, d in renames.items()])


# ---------------------------------------------------------------------------
# J2: left join with fan-out (nh-etl-provider-transform.py:104-108)
# ---------------------------------------------------------------------------


@register(
    "left_join_fanout",
    oracle="""
    SELECT c.c_custkey    AS facility_number,
           c.c_name       AS facility_name,
           o.o_orderkey   AS penalty_id,
           o.o_totalprice AS penalty_amount,
           o.o_orderstatus AS penalty_status
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="Left join against a multi-row-per-key detail table — fan-out plus "
    "unmatched-left null semantics. Full contract: "
    "docs/CONTRACTS.md#left_join_fanout",
)
def left_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    # Detail side is larger than the entity side: do NOT broadcast it.
    out = left_enrich(customer, orders, on="c_custkey", broadcast_other=False)
    renames = {"c_custkey": "facility_number", "c_name": "facility_name",
               "o_orderkey": "penalty_id", "o_totalprice": "penalty_amount",
               "o_orderstatus": "penalty_status"}
    return out.select(*[F.col(s).alias(d) for s, d in renames.items()])


# ---------------------------------------------------------------------------
# J3/S7: manifest anti-join (sync-drive-to-s3.py:47-48,109-111)
# ---------------------------------------------------------------------------


@register(
    "manifest_anti_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    """,
    doc="Incremental-ingest dedup as a relational anti-join: keep rows whose key is "
    "absent from the ledger (sync-drive-to-s3.py:47-48,109-111). Full contract: "
    "docs/CONTRACTS.md#manifest_anti_join",
)
def manifest_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    ledger = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return anti_join(lineitem, ledger, on="l_orderkey").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# J4: SCD merges (reference README.md:238-269, SP_MERGE_DIM_*) — type 1
# (overwrite) and type 2 (history-keeping) in one tagged union
# ---------------------------------------------------------------------------

_SCD_ORACLE = """
WITH src1 AS (
  SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal
  FROM customer WHERE c_mktsegment = 'BUILDING'
),
scd1 AS (
  SELECT c_custkey, c_acctbal FROM src1
  UNION ALL
  SELECT t.c_custkey, t.c_acctbal FROM customer t
  WHERE NOT EXISTS (SELECT 1 FROM src1 s WHERE s.c_custkey = t.c_custkey)
),
src2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_mktsegment = 'BUILDING'
),
changed AS (
  -- per-ROW classification with NULL-SAFE comparison, mirroring
  -- merge_scd2's full-outer join + eqNullSafe: each duplicate-key target
  -- copy joins the source row INDEPENDENTLY (SQL MERGE's one-source-to-
  -- many-targets is legal); a key-level NOT EXISTS dropped the unchanged
  -- copy whenever any copy changed (round-8 hunt, execution-confirmed)
  SELECT t.c_custkey, t.c_acctbal AS old_bal, s.c_acctbal AS new_bal
  FROM customer t JOIN src2 s
    ON s.c_custkey = t.c_custkey
   AND s.c_acctbal IS DISTINCT FROM t.c_acctbal
),
scd2 AS (
  SELECT c_custkey, old_bal AS c_acctbal, DATE '1990-01-01' AS valid_from,
         DATE '1995-06-17' AS valid_to, FALSE AS is_current
  FROM changed
  UNION ALL
  SELECT c_custkey, new_bal, DATE '1995-06-17', NULL, TRUE FROM changed
  UNION ALL
  -- carry branch, also per-ROW: a copy carries forward iff no source row
  -- with its key differs from THIS copy's balance
  SELECT t.c_custkey, t.c_acctbal, DATE '1990-01-01', NULL, TRUE
  FROM customer t
  WHERE NOT EXISTS (SELECT 1 FROM src2 s WHERE s.c_custkey = t.c_custkey
                    AND s.c_acctbal IS DISTINCT FROM t.c_acctbal)
  UNION ALL
  -- not-matched insert (SQL MERGE): unmatched source keys open a new
  -- version; reached by NULL-key source rows — equality never matches
  -- NULL, so the full-outer join classifies them brand-new (round-8 fuzz)
  SELECT s.c_custkey, s.c_acctbal, DATE '1995-06-17', NULL, TRUE
  FROM src2 s
  WHERE NOT EXISTS (SELECT 1 FROM customer t WHERE t.c_custkey = s.c_custkey)
)
SELECT 'scd1' AS variant, c_custkey, c_acctbal,
       CAST(NULL AS DATE) AS valid_from, CAST(NULL AS DATE) AS valid_to,
       CAST(NULL AS BOOLEAN) AS is_current
FROM scd1
UNION ALL
SELECT 'scd2', c_custkey, c_acctbal, valid_from, valid_to, is_current FROM scd2
"""


@register(
    "scd_merge",
    oracle=_SCD_ORACLE,
    doc="Both warehouse merge flavors replacing Snowflake SP_MERGE_DIM_* (reference "
    "README.md:238-269), tagged-unioned: SCD-type-1 upsert (source rows win, "
    "unmatched target rows survive. Full contract: docs/CONTRACTS.md#scd_merge",
)
def scd_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    target1 = customer.select("c_custkey", "c_acctbal")
    source1 = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal")
    )
    scd1 = tag_union(
        merge_scd1(target1, source1, keys=["c_custkey"]),
        "scd1",
        {"c_custkey": "long", "c_acctbal": "double", "valid_from": "date",
         "valid_to": "date", "is_current": "boolean"},
        c_custkey=F.col("c_custkey"),
        c_acctbal=F.col("c_acctbal"),
    )
    target2 = customer.select(
        "c_custkey",
        "c_acctbal",
        F.to_date(F.lit("1990-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    source2 = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.col("c_acctbal") + F.lit(1000.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    scd2 = merge_scd2(
        target2, source2, keys=["c_custkey"], batch_date="1995-06-17"
    ).select(F.lit("scd2").alias("variant"), "*")
    return scd1.unionByName(scd2)


# ---------------------------------------------------------------------------
# A2/S6: validation gate as a query (validate_staging.py:15-47)
# ---------------------------------------------------------------------------


#: the required-input domains — ONE tuple drives both the Spark query and
#: its generated oracle (a missed edit in a hand-kept copy would silently
#: drop a domain from one side of the gate).
_GATE_DOMAINS = ("customer", "nation", "orders", "lineitem")


@register(
    "validation_counts",
    oracle="\n    UNION ALL\n".join(
        f"SELECT '{t}' AS domain, COUNT(*) AS row_count, "
        f"COUNT(*) > 0 AS non_empty FROM {t}"
        for t in _GATE_DOMAINS
    ),
    doc="Required-input gate: per-domain non-emptiness (validate_staging.py:15-47) "
    "expressed as a unioned count query. Full contract: "
    "docs/CONTRACTS.md#validation_counts",
)
def validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    parts = [
        read_table(spark, sf_dir, name)
        .agg(F.count(F.lit(1)).alias("row_count"))
        .select(
            F.lit(name).alias("domain"),
            F.col("row_count"),
            (F.col("row_count") > 0).alias("non_empty"),
        )
        for name in _GATE_DOMAINS
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


# ---------------------------------------------------------------------------
# P5/P6: the quality and penalty transforms over CMS-shaped staging
# (nh-etl-quality-transform.py:38-47; nh-etl-provider-transform.py:93-102)
# ---------------------------------------------------------------------------

#: Dirty CMS quality-measure headers synthesized over a lineitem pivot —
#: the real quality-transform header set (pre-pivoted quarterly scores).
_DIRTY_QUALITY_HEADERS = [
    " CMS Certification Number (CCN) ",
    "Measure Code",
    "Q1 Measure Score",
    "Q2 Measure Score",
    "Q3 Measure Score",
    "Q4 Measure Score",
    "Four Quarter Average Score",
]

_DIRTY_PENALTY_HEADERS = [
    " CMS Certification Number (CCN) ",
    "Number of Fines",
    "Total Amount of Fines in Dollars",
    "Number of Payment Denials",
    "Total Number of Penalties",
]


@register(
    "cms_quality_transform",
    oracle=f"""
    WITH q AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS ccn,
             l_returnflag               AS mcode,
             ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 1 THEN l_quantity END), 2) AS q1,
             ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 2 THEN l_quantity END), 2) AS q2,
             ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 3 THEN l_quantity END), 2) AS q3,
             ROUND(SUM(CASE WHEN QUARTER(l_shipdate) = 4 THEN l_quantity END), 2) AS q4
      FROM lineitem GROUP BY 1, 2
    )
    , d AS (
      -- display mirrors clean_table: a padded ' R' groups separately from
      -- 'R' but DISPLAYS trimmed; isnan() + TRY_CAST for DECIMAL renders
      -- (Spark ANSI casts NaN->DECIMAL NULL; DuckDB plain CAST hard-errors)
      SELECT ccn                                       AS facility_number,
             {duck_trim_sql("mcode")}                  AS measure_code,
             CAST(CASE WHEN isnan(q1) THEN NULL ELSE TRY_CAST(q1 AS DECIMAL(18,2)) END AS VARCHAR) AS q1_measure_score,
             CAST(CASE WHEN isnan(q2) THEN NULL ELSE TRY_CAST(q2 AS DECIMAL(18,2)) END AS VARCHAR) AS q2_measure_score,
             CAST(CASE WHEN isnan(q3) THEN NULL ELSE TRY_CAST(q3 AS DECIMAL(18,2)) END AS VARCHAR) AS q3_measure_score,
             CAST(CASE WHEN isnan(q4) THEN NULL ELSE TRY_CAST(q4 AS DECIMAL(18,2)) END AS VARCHAR) AS q4_measure_score,
             CAST(CASE WHEN isnan(ROUND((q1 + q2 + q3 + q4) / 4, 6)) THEN NULL ELSE TRY_CAST(ROUND((q1 + q2 + q3 + q4) / 4, 6) AS DECIMAL(28,6)) END AS VARCHAR)
                                                       AS four_quarter_average_score
      FROM q
    )
    SELECT *,
           {_dense_id_sql("facility_number", "measure_code",
                          "q1_measure_score", "q2_measure_score",
                          "q3_measure_score", "q4_measure_score",
                          "four_quarter_average_score")}
    FROM d
    """,
    doc="P5 quality transform over a CMS-shaped staging fixture: quarterly measure "
    "scores synthesized from a lineitem pivot. Full contract: "
    "docs/CONTRACTS.md#cms_quality_transform",
)
def cms_quality_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transforms import PK, QUALITY_COLUMNS

    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "quarter", F.quarter("l_shipdate")
    )
    wide = (
        li.groupBy(
            F.col("l_suppkey").cast("string").alias("ccn"),
            F.col("l_returnflag").alias("mcode"),
        )
        .pivot("quarter", [1, 2, 3, 4])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    qs = [F.col(str(i)) for i in (1, 2, 3, 4)]
    # the avg is computed in DOUBLE on both engines (decimal arithmetic
    # precision/scale inference differs between them), then each display
    # column renders via DECIMAL so a score >= 1e7 can't flip Spark's
    # double->string into scientific notation (skew-axis finding, round 7)
    staged = wide.select(
        "ccn", "mcode",
        *[q.cast("decimal(18,2)") for q in qs],
        F.round((qs[0] + qs[1] + qs[2] + qs[3]) / 4, 6)
        .cast("decimal(28,6)").alias("avg4"),
    ).toDF(*_DIRTY_QUALITY_HEADERS)
    cleaned = clean_table(cast_all_to_string(staged))
    out = select_columns(cleaned, QUALITY_COLUMNS, strict=False)
    return with_etl_metadata(out, order_by=[PK, "measure_code"])


@register(
    "cms_penalty_transform",
    oracle=f"""
    WITH p AS (
      SELECT CAST(o_custkey AS VARCHAR) AS ccn,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F')                    AS n_fines,
             CAST(CASE WHEN isnan(ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)) THEN NULL ELSE TRY_CAST(ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS DECIMAL(18,2)) END AS VARCHAR)                              AS fine_total,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P')                    AS n_denials
      FROM orders GROUP BY 1
    )
    SELECT ccn                                    AS facility_number,
           CAST(n_fines AS VARCHAR)               AS number_of_fines,
           CAST(fine_total AS VARCHAR)            AS total_amount_of_fines_in_dollars,
           CAST(n_denials AS VARCHAR)             AS number_of_payment_denials,
           CAST(n_fines + n_denials AS VARCHAR)   AS total_number_of_penalties,
           {_dense_id_sql("ccn")}
    FROM p
    """,
    doc="P6 penalty transform over a CMS-shaped staging fixture: per-facility "
    "fine/denial rollups synthesized from orders. Full contract: "
    "docs/CONTRACTS.md#cms_penalty_transform",
)
def cms_penalty_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..transforms import PK, PENALTY_COLUMNS

    o = read_table(spark, sf_dir, "orders")
    rolled = o.groupBy(F.col("o_custkey").cast("string").alias("ccn")).agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_fines"),
        # decimal, not double, under the downstream all-string cast: Spark
        # renders a double >= 1e7 as '6.18E8' where DuckDB keeps decimal
        # notation (skew-axis finding, round 7); decimal(18,2) strings
        # identically on both engines and is lossless after ROUND(..., 2)
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 2
        ).cast("decimal(18,2)").alias("fine_total"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_denials"),
    )
    staged = rolled.select(
        "ccn", "n_fines", "fine_total", "n_denials",
        (F.col("n_fines") + F.col("n_denials")).alias("total"),
    ).toDF(*_DIRTY_PENALTY_HEADERS)
    cleaned = clean_table(cast_all_to_string(staged))
    out = select_columns(cleaned, PENALTY_COLUMNS, strict=False)
    return with_etl_metadata(out, order_by=[PK])
