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
    (n_a * n_b), each factor cast to double BEFORE multiplying (exact
    below 2^53 per factor and immune to int64 wrap at any basket
    count — the same guard as the triple variant's lift3; rank order
    is by n_both regardless). item_a < item_b, ranked by
    (n_both desc, item_a, item_b) — total order.

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
                (F.col("n_both").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )
    from lakeapi_spark.operators.pipeline import ranked_topk

    return ranked_topk(
        scored, [F.col("n_both").desc(), F.col("item_a"), F.col("item_b")], k=top_n
    ).withColumn("rank", F.col("rank").cast("long"))


def market_basket_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_n: int = 40,
) -> DataFrame:
    """Top 3-item association sets by co-occurrence support — the next
    Apriori level above :func:`market_basket_pairs`: returns (item_a,
    item_b, item_c, n_all, lift3, rank) where lift3 = P(a,b,c) /
    (P(a)P(b)P(c)) over baskets = n_all * n_baskets^2 / (n_a n_b n_c)
    as one double expression over exact int64 counts (same order both
    engines). a < b < c, ranked (n_all desc, a, b, c) — total order.

    Scale shape: triple expansion is the within-basket 3-way
    self-join, bounded at C(|basket|,3) rows per basket (TPC-H caps
    baskets at 7 -> <= 35/basket) — never a global cross join; the
    ``min_support`` filter applies right after the count so only
    recurring triples join the broadcast item supports. At retail-
    scale baskets (100s of items) prefilter items by pair support
    first (full Apriori) — the candidate join shape stays the same."""
    bi = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("item"))
        .filter(F.col("b").isNotNull() & F.col("item").isNotNull())
        .distinct()
    )
    nb = F.broadcast(
        bi.select("b").distinct().agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_support = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    triples = (
        bi.alias("x")
        .join(bi.alias("y"), "b")
        .filter(F.col("x.item") < F.col("y.item"))
        .join(bi.alias("z"), "b")
        .filter(F.col("y.item") < F.col("z.item"))
        .groupBy(
            F.col("x.item").alias("item_a"),
            F.col("y.item").alias("item_b"),
            F.col("z.item").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("n_all"))
        .filter(F.col("n_all") >= min_support)
    )
    s = lambda side: F.broadcast(  # noqa: E731 - three aliased copies
        item_support.select(
            F.col("item").alias(f"item_{side}"), F.col("n_item").alias(f"n_{side}")
        )
    )
    scored = (
        triples.join(s("a"), "item_a")
        .join(s("b"), "item_b")
        .join(s("c"), "item_c")
        .crossJoin(nb)
        .select(
            "item_a",
            "item_b",
            "item_c",
            "n_all",
            (
                # Each factor is cast to double BEFORE multiplying: the
                # numerator n_all * n_baskets^2 wraps int64 (non-ANSI)
                # at ~2M baskets with a high-support triple, silently
                # emitting wrong/negative lift3. Double products of
                # exact integers are exact below 2^53 per step and
                # rank order is by n_all anyway, so the cast order is
                # the safe one at every scale.
                (
                    F.col("n_all").cast("double")
                    * F.col("n_baskets").cast("double")
                    * F.col("n_baskets").cast("double")
                )
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                    * F.col("n_c").cast("double")
                )
            ).alias("lift3"),
        )
    )
    from lakeapi_spark.operators.pipeline import ranked_topk

    return ranked_topk(
        scored,
        [F.col("n_all").desc(), F.col("item_a"), F.col("item_b"), F.col("item_c")],
        k=top_n,
    ).withColumn("rank", F.col("rank").cast("long"))
