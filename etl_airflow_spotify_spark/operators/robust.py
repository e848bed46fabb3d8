"""Robust (median/MAD) statistics and outlier detection.

Mean/stddev profiling (``profile_lineitem``) breaks down under heavy
tails — one corrupt sensor value drags the mean and inflates sigma until
nothing is "3 sigma out". The robust alternative is the modified
z-score of Iglewicz & Hoaglin (1993): M_i = 0.6745 (x_i - med) / MAD,
flagging |M_i| > 3.5, where MAD = median(|x - median|). Equivalently
|x - med| > 3.5 / 0.6745 * MAD — the form used here (no per-row
division).

Scale design: exact grouped medians via Spark's ``percentile``
aggregate buffer the group's values on its reducer — fine for a
bounded number of groups (this table: 5 event types), but for
million-row groups at 100 TB swap in ``approx_percentile`` with an
accuracy budget (same plan shape, bounded memory) — the operator takes
an ``exact`` flag for that. The med/MAD frames are group-cardinality
sized and meet the fact table via broadcast joins, so the fact scan
never shuffles: 3 scans total (med, MAD, flag+aggregate), each a
map + tiny-broadcast stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# |x - med| > K * MAD  <=>  modified z-score > 3.5 (Iglewicz-Hoaglin)
IH_K = 3.5 / 0.6745


def _pct(col_expr: str, exact: bool) -> str:
    return (f"percentile({col_expr}, 0.5)" if exact
            else f"approx_percentile({col_expr}, 0.5, 10000)")


def grouped_robust_stats(df: DataFrame, key: str, col: str,
                         exact: bool = True,
                         digits: int = 4) -> DataFrame:
    """(key, n, med, mad, n_outliers, outlier_frac) per group.

    ``n_outliers`` counts |x - med| > IH_K * MAD (modified z > 3.5).
    MAD = 0 (over half the group identical) flags any x != med, the
    standard degenerate-case convention.
    """
    med = df.groupBy(key).agg(F.expr(_pct(col, exact)).alias("_med"))
    with_med = df.join(F.broadcast(med), key)
    mad = (with_med
           .groupBy(key)
           .agg(F.expr(_pct(f"abs({col} - _med)", exact)).alias("_mad")))
    flagged = (with_med.join(F.broadcast(mad), key)
               .withColumn("_is_out",
                           (F.abs(F.col(col) - F.col("_med"))
                            > F.lit(IH_K) * F.col("_mad")).cast("int")))
    return (flagged.groupBy(key)
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.first("_med"), digits).alias("med"),
                 F.round(F.first("_mad"), digits).alias("mad"),
                 F.sum("_is_out").cast("long").alias("n_outliers"),
                 F.round(F.sum("_is_out") / F.count("*"), digits)
                 .alias("outlier_frac")))


def winsorized_stats(df: DataFrame, key: str, col: str,
                     lo: float = 0.05, hi: float = 0.95,
                     exact: bool = True, digits: int = 4) -> DataFrame:
    """Per-group winsorization report: clip ``col`` to its group's
    [lo, hi] percentile band and compare moments before/after —
    (key, n, p_lo, p_hi, n_clipped, mean_raw, mean_winsorized).

    Same scale shape as :func:`grouped_robust_stats`: the percentile
    frame is group-cardinality sized and broadcasts back onto the fact
    scan, which never shuffles; for million-row groups flip ``exact``
    to switch the boundary aggregate to ``approx_percentile`` (bounded
    memory, identical plan).
    """
    q = (f"percentile({col}, array({lo}, {hi}))" if exact
         else f"approx_percentile({col}, array({lo}, {hi}), 10000)")
    band = (df.groupBy(key)
            .agg(F.expr(q).alias("_b"))
            .select(key, F.col("_b")[0].alias("_lo"),
                    F.col("_b")[1].alias("_hi")))
    c = F.col(col)
    clipped = F.least(F.greatest(c, F.col("_lo")), F.col("_hi"))
    return (df.join(F.broadcast(band), key)
            .groupBy(key)
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.first("_lo"), digits).alias("p_lo"),
                 F.round(F.first("_hi"), digits).alias("p_hi"),
                 F.sum(((c < F.col("_lo")) | (c > F.col("_hi")))
                       .cast("int")).cast("long").alias("n_clipped"),
                 F.round(F.avg(c), digits).alias("mean_raw"),
                 F.round(F.avg(clipped), digits).alias("mean_winsorized")))
