"""Market-basket association mining (greenfield extension).

Co-occurrence lift over transaction baskets — the classic association
signal (recommendations, assortment, data-curation co-occurrence
features). The reference engine has no such operator; this extends the
analytics family the same way the graph/sketch modules do.

Scale design: the pair explosion is bounded by BASKET size, not corpus
size — pairs per basket = C(|basket|, 2), and baskets are small by
construction (a retail order, a session), so the pair relation is a
small constant times the input and never quadratic in anything global.
The per-item and per-pair supports are two partial-aggregated groupBys;
the basket total rides the plan as a broadcast 1-row relation (no
driver action); lift arithmetic stays in exact integers until one final
IEEE division, so any engine re-derives identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def market_basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_n: int = 40,
) -> DataFrame:
    """Top association pairs by co-occurrence support: returns
    (item_a, item_b, n_both, n_a, n_b, lift, rank) where lift =
    P(a,b) / (P(a) P(b)) over baskets = n_both * n_baskets /
    (n_a * n_b), computed as one exact-integer product ratio divided in
    IEEE double (both factors < 2^53 — exact). item_a < item_b, ranked
    by (n_both desc, item_a, item_b) — total order.

    One distinct pass builds (basket, item); the within-basket
    self-join explodes to C(|basket|,2) rows per basket (bounded by
    basket size); supports are partial-aggregated groupBys; the two
    support joins are item-keyed (the item relation is the DISTINCT
    item universe — broadcastable at any realistic catalog size)."""
    bi = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("item"))
        # null basket/item keys carry no co-occurrence information and
        # would skew n_baskets away from the COUNT(DISTINCT b) oracle
        .filter(F.col("b").isNotNull() & F.col("item").isNotNull())
        .distinct()
    )
    nb = F.broadcast(
        bi.select("b").distinct().agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_support = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        bi.alias("x")
        .join(bi.alias("y"), "b")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("item_a"), F.col("y.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = F.broadcast(item_support.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a")))
    sb = F.broadcast(item_support.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b")))
    scored = (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(nb)
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("n_both").desc(), "item_a", "item_b")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )
