"""Graph centrality over near-dup graphs.

Connected components (operators/dedup.py) answers "which rows are the
same thing"; centrality answers "which row should REPRESENT the
cluster". PageRank over the similarity graph ranks each node by how
strongly the rest of its cluster points at it — a principled
canonical-selection key next to the keep-longest heuristic.

Determinism: classic float PageRank is a cross-engine hash hazard
(per-node neighbor sums accumulate in engine-specific order). This
implementation freezes an INTEGER-ARITHMETIC variant: ranks are
scaled to 1e12, every division is floor division, and one iteration
is

    r'(v) = (15 * SCALE) // (100 * m)  +  (85 * S(v)) // 100
    S(v)  = sum over neighbors u of  r(u) // deg(u)

with m = number of edge-touched nodes. Every intermediate is a
bigint < 2^53; addition is commutative-exact on integers, so ANY
aggregation order, partitioning, or engine produces bit-identical
ranks. (The truncation loses < 1 part in 1e10 of rank mass per hop —
the ORDERING information PageRank exists for is unaffected; the spec
is arbitrary-but-frozen, the same stance as the quality score.)

Plan shape per iteration: one join of the (bucketed) edge list with
the current rank table + one map-side-combined groupBy — the same
two-shuffle round as min-label propagation, over the edge-touched
subgraph only. Fixed iteration count keeps the lineage bounded and
lets the SQL oracle unroll the loop as plain CTE layers (no
recursion, no aggregate-in-recursion restrictions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 1e12: integer rank mass


def _idiv(a, b):
    """Exact floor division of non-negative bigint columns: both
    engines' `/` on longs would go through doubles; (a - a mod b) / b
    keeps every step integral (same idiom as text._r6)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def pagerank_integer(pairs: DataFrame, a_col: str = "id_a",
                     b_col: str = "id_b", iters: int = 3,
                     damping_pct: int = 85) -> DataFrame:
    """Integer PageRank over an undirected pair list. Returns
    (node, pr) for every edge-touched node, pr summing to ~PR_SCALE.

    ``pairs`` is materialized once (localCheckpoint) — it is usually
    the tail of a candidate-generation pipeline that must not re-run
    per iteration (the round-5 connected_components lesson)."""
    edges = (pairs.select(F.col(a_col).alias("src"),
                          F.col(b_col).alias("dst"))
             .unionAll(pairs.select(F.col(b_col).alias("src"),
                                    F.col(a_col).alias("dst")))
             .distinct()
             .localCheckpoint())
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    m = deg.count()  # edge-touched node count (bounded: dup subgraph)
    if m == 0:
        return pairs.sparkSession.createDataFrame(
            [], "node long, pr long")
    base = (15 * PR_SCALE) // (100 * m)
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(PR_SCALE // m).alias("pr"))
    for _ in range(iters):
        contrib = (edges.join(deg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst"),
                           _idiv(F.col("pr"), F.col("deg"))
                           .alias("c")))
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (deg.select(F.col("src").alias("node"))
                 .join(sums.withColumnRenamed("dst", "node"),
                       "node", "left")
                 .select("node",
                         (F.lit(base)
                          + _idiv(F.lit(damping_pct)
                                  * F.coalesce("s", F.lit(0)),
                                  F.lit(100))).alias("pr"))
                 .localCheckpoint())
    return ranks


def label_propagation(pairs: DataFrame, seeds: DataFrame,
                      a_col: str = "id_a", b_col: str = "id_b",
                      node_col: str = "node",
                      label_col: str = "label",
                      iters: int = 2) -> DataFrame:
    """Semi-supervised label propagation over an undirected pair list
    (the weak-supervision / label-imputation op): ``seeds`` =
    (node, label) for the labeled minority; each round every still-
    unlabeled edge-touched node takes the MAJORITY label among its
    already-labeled neighbors (ties to the smallest label), and once
    assigned a label is frozen — the incremental-frontier variant,
    which unrolls exactly into oracle CTE layers.  Votes are integer
    counts, the argmax tie-break is a total order, so the result is
    engine- and partitioning-exact.

    Returns (node, label, src_iter) — src_iter 0 for seeds, i for
    round-i assignments.  Nodes no labeled neighbor ever reaches stay
    absent.  Per round: one edge join + one count groupBy + one
    per-node argmax window over the (shrinking) frontier."""
    from pyspark.sql import Window

    edges = (pairs.select(F.col(a_col).alias("src"),
                          F.col(b_col).alias("dst"))
             .unionAll(pairs.select(F.col(b_col).alias("src"),
                                    F.col(a_col).alias("dst")))
             .distinct()
             .localCheckpoint())
    labeled = (seeds.select(F.col(node_col).alias("node"),
                            F.col(label_col).cast("long")
                            .alias("label"),
                            F.lit(0).alias("src_iter"))
               .localCheckpoint())
    for i in range(1, iters + 1):
        votes = (edges
                 .join(labeled.select(F.col("node").alias("src"),
                                      "label"), "src")
                 .join(labeled.select(F.col("node").alias("dst"))
                       .distinct(), "dst", "left_anti")
                 .groupBy("dst", "label")
                 .agg(F.count("*").alias("_n")))
        w = (Window.partitionBy("dst")
             .orderBy(F.col("_n").desc(), F.col("label").asc()))
        new = (votes.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1)
               .select(F.col("dst").alias("node"), "label",
                       F.lit(i).alias("src_iter")))
        labeled = labeled.unionAll(new).localCheckpoint()
    return labeled
