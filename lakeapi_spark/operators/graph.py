"""Graph analytics over relational edge lists (greenfield extension).

Connected components (the dedup clustering workhorse) lives in
operators/dedup.py; this module holds the rank/centrality side. The
reference engine has no graph operators — this extends the engine the
same way the dedup/ANN families do, for corpus-curation jobs that need
link-structure signals (domain authority for crawl filtering, seller/
buyer importance in transaction graphs).

Scale design:
- the edge list is the only big relation; every iteration is one
  equi-join (edges ⋈ ranks, both hash-partitioned by the join key) plus
  one groupBy(dst) whose SUM partial-aggregates map-side, so the wide
  exchange per iteration carries one row per distinct dst, not one per
  edge;
- degrees and the node universe are computed once, outside the loop;
- a FIXED small iteration count is unrolled into one declarative plan
  (Catalyst sees the whole pipeline; nothing is collected between
  rounds). Many-iteration runs should localCheckpoint every few rounds
  to cut lineage — the pattern operators/dedup.py:connected_components
  already demonstrates;
- per-term contributions are cast to DECIMAL before the SUM so the
  reduction is associative-exact and engine-independent (double SUM
  order varies with partitioning; decimal addition does not) — the same
  money-column discipline as the TPC-H aggregates in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_digits: int = 10,
    final_digits: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED simple graph built
    from ``edges`` (each input pair contributes both directions; dupes
    removed). Returns (node, pr).

    Every node in an undirected graph has degree >= 1, so there is no
    dangling-mass term: pr_{t+1}(v) = (1-d)/N + d * SUM over neighbors
    u of pr_t(u)/deg(u). Intermediate ranks are rounded to
    ``round_digits`` (the final pass to ``final_digits``) so the values
    are totally reproducible across engines — an exact-oracle-friendly
    fixed-point contract, like the rounded-cosine ANN family.

    The driver holds ONE scalar (the node count); ranks never leave the
    cluster.
    """
    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = und.select(F.col("src").alias("node")).distinct()
    n_total = nodes.count()  # bounded driver scalar
    jump = (1.0 - damping) / n_total
    pr = nodes.select("node", F.lit(1.0 / n_total).alias("pr"))
    for it in range(iters):
        contrib = (
            und.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).cast("decimal(28,12)").alias("w"),
            )
        )
        digits = final_digits if it == iters - 1 else round_digits
        pr = contrib.groupBy("node").agg(
            F.round(
                F.lit(jump) + F.lit(damping) * F.sum("w").cast("double"), digits
            ).alias("pr")
        )
    return pr
