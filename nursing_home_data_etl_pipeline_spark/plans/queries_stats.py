"""Statistical aggregates (SURVEY.md §2.8): exact-decimal moments
(sd/var/corr/cov) + frequency-weighted exact percentiles in one scale-first
plan. Split from queries_sampling in round 12 (family cohesion, directive
#6); catalog name and semantics unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import duck_round_sql, round_half_away
from ..sources.readers import read_table
from .catalog import register

#: Decimal type for the exact moment sums: (18,4) x (18,4) products are
#: (36/37, 8) — inside the 38-digit cap in BOTH engines, so no product or
#: sum ever rounds. Domain contract: |value| < 1e14 on ≤4-decimal grids
#: (the lineitem data contract), so the casts themselves are exact.
_MOMENT_DEC = "decimal(18,4)"
#: DuckDB widening partner: (18,4)x(18,4) products stay in the int64
#: physical family and OVERFLOW; (18,4)x(20,4) -> (38,8) runs in
#: hugeint, still exact. Spark needs no widening ((18,4)x(18,4) ->
#: (37,8) automatically).
_MOMENT_DEC_WIDE = "decimal(20,4)"


#: DECIMAL -> DOUBLE goes THROUGH VARCHAR (round-11 fuzz seed 5284):
#: past 2^53 the direct casts diverge one ulp between engines; exact
#: digits + correctly-rounded strtod is bit-identical in both. Group-
#: count rows only — free.
def _dsum(col: str) -> str:
    """Exact-decimal SUM rendered back to DOUBLE (via VARCHAR, see above)."""
    return f"CAST(CAST(SUM(CAST({col} AS {_MOMENT_DEC})) AS VARCHAR) AS DOUBLE)"


def _dsum2(a: str, b: str) -> str:
    """Exact-decimal SUM of a product (second factor widened for DuckDB)."""
    return (f"CAST(CAST(SUM(CAST({a} AS {_MOMENT_DEC})"
            f" * CAST({b} AS {_MOMENT_DEC_WIDE})) AS VARCHAR) AS DOUBLE)")


@register(
    "stats_aggregates",
    oracle=f"""
    -- EXACT-DECIMAL MOMENT SUMS (fuzz seed 621): the engines' one-pass
    -- covar/stddev accumulate in different orders and straddled a rounding
    -- boundary no discipline can absorb; both sides compute textbook
    -- moments from EXACT decimal sums (the revenue-DECIMAL pattern) and
    -- run identical double ops on identical inputs — bit-identical.
    WITH m AS (
      SELECT l_returnflag,
             COUNT(l_extendedprice) AS np,
             {_dsum("l_extendedprice")} AS sp,
             {_dsum2("l_extendedprice", "l_extendedprice")} AS spp,
             COUNT(l_discount) AS nd,
             {_dsum("l_discount")} AS sd,
             {_dsum2("l_discount", "l_discount")} AS sdd,
             COUNT(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL THEN 1 END) AS n,
             CAST(CAST(SUM(CASE WHEN l_extendedprice IS NOT NULL THEN CAST(l_quantity AS {_MOMENT_DEC}) END) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CASE WHEN l_quantity IS NOT NULL THEN CAST(l_extendedprice AS {_MOMENT_DEC}) END) AS VARCHAR) AS DOUBLE) AS sy,
             {_dsum2("l_quantity", "l_extendedprice")} AS sxy,
             CAST(CAST(SUM(CASE WHEN l_extendedprice IS NOT NULL THEN CAST(l_quantity AS {_MOMENT_DEC}) * CAST(l_quantity AS {_MOMENT_DEC_WIDE}) END) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CASE WHEN l_quantity IS NOT NULL THEN CAST(l_extendedprice AS {_MOMENT_DEC}) * CAST(l_extendedprice AS {_MOMENT_DEC_WIDE}) END) AS VARCHAR) AS DOUBLE) AS syy,
             min(l_extendedprice) AS min_p,
             max(l_extendedprice) AS max_p,
             quantile_cont(l_quantity, 0.5) AS med_q,
             quantile_cont(l_extendedprice, 0.9) AS p90_p,
             quantile_cont(l_discount, 0.25) AS p25_d
      FROM lineitem GROUP BY l_returnflag
    ),
    v AS (
      SELECT *,
             (spp - sp * sp / nullif(CAST(np AS DOUBLE), 0)) / nullif(CAST(np AS DOUBLE) - 1, 0) AS var_p,
             (sdd - sd * sd / nullif(CAST(nd AS DOUBLE), 0)) / nullif(CAST(nd AS DOUBLE) - 1, 0) AS var_d,
             (sxy - sx * sy / nullif(CAST(n AS DOUBLE), 0)) / nullif(CAST(n AS DOUBLE) - 1, 0) AS cov,
             sxx - sx * sx / nullif(CAST(n AS DOUBLE), 0) AS mx,
             syy - sy * sy / nullif(CAST(n AS DOUBLE), 0) AS my
      FROM m
    )
    SELECT l_returnflag,
           {duck_round_sql("sqrt(CASE WHEN var_p < 0 THEN 0 ELSE var_p END)", 4)} AS sd_price,
           {duck_round_sql("var_d", 6)} AS var_disc,
           {duck_round_sql("CASE WHEN mx > 0 AND my > 0 THEN (sxy - sx * sy / CAST(n AS DOUBLE)) / sqrt(mx * my) END", 6)} AS corr_qty_price,
           {duck_round_sql("cov", 2)} AS cov_qty_price,
           {duck_round_sql("min_p", 2)} AS min_price,
           {duck_round_sql("max_p", 2)} AS max_price,
           {duck_round_sql("med_q", 6)} AS median_qty,
           {duck_round_sql("p90_p", 4)} AS p90_price,
           {duck_round_sql("p25_d", 6)} AS p25_disc
    FROM v
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance from EXACT "
    "decimal moment sums. Full contract: docs/CONTRACTS.md#stats_aggregates",
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast(_MOMENT_DEC)
    pd_ = F.col("l_extendedprice").cast(_MOMENT_DEC)
    dd = F.col("l_discount").cast(_MOMENT_DEC)
    # Pairwise masks mirror corr/covar semantics: only rows where BOTH
    # inputs are non-NULL contribute to the cross moments.
    qp = F.when(F.col("l_extendedprice").isNotNull(), qd)
    pp = F.when(F.col("l_quantity").isNotNull(), pd_)
    agg = li.groupBy("l_returnflag").agg(
        F.count("l_extendedprice").alias("_np"),
        F.sum(pd_).cast("string").cast("double").alias("_sp"),
        F.sum(pd_ * pd_).cast("string").cast("double").alias("_spp"),
        F.count("l_discount").alias("_nd"),
        F.sum(dd).cast("string").cast("double").alias("_sd"),
        F.sum(dd * dd).cast("string").cast("double").alias("_sdd"),
        F.count(F.when(pp.isNotNull() & qp.isNotNull(), 1)).alias("_n"),
        F.sum(qp).cast("string").cast("double").alias("_sx"),
        F.sum(pp).cast("string").cast("double").alias("_sy"),
        F.sum(qd * pd_).cast("string").cast("double").alias("_sxy"),
        F.sum(qp * qp).cast("string").cast("double").alias("_sxx"),
        F.sum(pp * pp).cast("string").cast("double").alias("_syy"),
        round_half_away(F.min("l_extendedprice"), 2).alias("min_price"),
        round_half_away(F.max("l_extendedprice"), 2).alias("max_price"),
    )
    # SCALE-FIRST percentiles: a codegen'd histogram aggregate shuffles
    # only DISTINCT (flag, col, value) rows; the exact percentile runs
    # frequency-weighted over that tiny histogram and rejoins by broadcast
    # (docs/DESIGN.md#stats-histogram-percentiles).
    hist = (
        li.selectExpr(
            "l_returnflag",
            "stack(3, 'q', l_quantity, 'p', l_extendedprice, "
            "'d', l_discount) as (_w, _v)")
        .filter(F.col("_v").isNotNull())
        .groupBy("l_returnflag", "_w", "_v")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    pcts = hist.groupBy(F.col("l_returnflag").alias("_rf")).agg(
        round_half_away(F.expr(
            "percentile(if(_w = 'q', _v, null), 0.5D, _f)"), 6)
        .alias("median_qty"),
        round_half_away(F.expr(
            "percentile(if(_w = 'p', _v, null), 0.9D, _f)"), 4)
        .alias("p90_price"),
        round_half_away(F.expr(
            "percentile(if(_w = 'd', _v, null), 0.25D, _f)"), 6)
        .alias("p25_disc"),
    )
    # LEFT join: a flag whose three columns are all NULL has no histogram
    # rows but must keep its moments row (percentiles NULL, like the
    # oracle's quantile_cont over nothing).
    agg = agg.join(F.broadcast(pcts),
                   F.col("l_returnflag").eqNullSafe(F.col("_rf")),
                   "left").drop("_rf")

    def _nz(c):  # NULL instead of ANSI divide-by-zero
        return F.nullif(c, F.lit(0.0))

    def _var(s1, s2, n):
        n_d = n.cast("double")
        return (s2 - s1 * s1 / _nz(n_d)) / _nz(n_d - 1)

    var_p = _var(F.col("_sp"), F.col("_spp"), F.col("_np"))
    var_d = _var(F.col("_sd"), F.col("_sdd"), F.col("_nd"))
    n_d = F.col("_n").cast("double")
    cov = (F.col("_sxy") - F.col("_sx") * F.col("_sy") / _nz(n_d)) / _nz(n_d - 1)
    mx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / _nz(n_d)
    my = F.col("_syy") - F.col("_sy") * F.col("_sy") / _nz(n_d)
    corr = F.when(
        (mx > 0) & (my > 0),
        (F.col("_sxy") - F.col("_sx") * F.col("_sy") / n_d) / F.sqrt(mx * my),
    )
    sd_price = F.sqrt(F.when(var_p < 0, F.lit(0.0)).otherwise(var_p))
    return agg.select(
        "l_returnflag",
        round_half_away(sd_price, 4).alias("sd_price"),
        round_half_away(var_d, 6).alias("var_disc"),
        round_half_away(corr, 6).alias("corr_qty_price"),
        round_half_away(cov, 2).alias("cov_qty_price"),
        "min_price", "max_price",
        "median_qty", "p90_price", "p25_disc",
    )
