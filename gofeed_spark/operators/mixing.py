"""Dataset mixing: deterministic weighted down-sampling of sources to a
target mixture — the step that turns N crawled/curated sources into ONE
training corpus with chosen proportions (the Pile/Dolma/DoReMi recipe
shape).

Reference scope note: the reference engine (a change-feed poller) has no
mixing surface; this module belongs to the added LLM-pipeline surface
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.text import ws_tokens


def mixture_sample(
    docs: DataFrame,
    weight_expr: Column,
    budget_frac: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "m",
) -> DataFrame:
    """Sample each source at the rate that hits its target mixture share.

    Given per-source weights ``weight_expr`` (any integer expression over
    the source row; normalized internally) and a global token budget of
    ``budget_frac`` × the corpus total, each source s with token mass T_s
    gets acceptance rate  min(1, budget·share_s / T_s)  — sources smaller
    than their target share keep everything (rate clips at 1: sampling
    without replacement cannot upsample; the shortfall is reported via the
    emitted rate so a caller can re-weight or replicate).

    The keep decision is content-addressed (md5 of the salted id, the q81
    convention), so the sample is reproducible across engines, runs, and
    re-shards.  Plan, sized for 100 TB: one tiny per-source aggregation
    (|sources| rows) + one 1-row total, broadcast back onto the corpus —
    the corpus itself pays a single filter pass, no shuffle.  The rate
    arithmetic is a fixed left-associative chain over exact integers, so
    any engine computes bit-identical doubles.

    Returns (id, source, rate) for every kept doc.
    """
    toks = F.size(ws_tokens(text_col))
    base = docs.select(
        id_col, source_col, toks.alias("__t"), weight_expr.alias("__w")
    )
    per_src = base.groupBy(source_col).agg(
        F.max("__w").alias("__w"), F.sum("__t").alias("__src_toks")
    )
    totals = per_src.agg(
        F.sum("__src_toks").alias("__T"), F.sum("__w").alias("__W")
    )
    # totals derives from per_src, so the cross join is a self-join: alias
    # both sides or attribute resolution sees two lineages for __w
    rates = (
        per_src.alias("p")
        .crossJoin(F.broadcast(totals.alias("g")))
        .select(
            F.col("p." + source_col).alias(source_col),
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("g.__T")
                * F.col("p.__w")
                / F.col("g.__W")
                / F.col("p.__src_toks"),
            ).alias("rate"),
        )
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    return (
        base.join(F.broadcast(rates), source_col)
        .filter(h.cast("double") < F.col("rate") * 1_000_000)
        .select(id_col, source_col, "rate")
    )
