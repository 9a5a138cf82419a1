"""Connected components over a pair graph — near-dup pairs → dup clusters.

Pair emitters (`operators/dedup.py`, `operators/similarity.py`) produce
*edges*; acting on duplicates (keep one representative per group) needs the
transitive closure: components of the pair graph. The reference has no graph
surface at all — this is part of the training-data extension
(BASELINE.json north star).

Algorithm: iterative **min-label propagation** on DataFrames —
``label[u] ← min(label[u], min(label[neighbors(u)]))`` per round; converges
to the component-minimum id in ≤ diameter rounds. Near-dup components are
shallow (dups of a document are dups of each other), so few rounds suffice;
for adversarial long-chain graphs swap in the alternating large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which converges in O(log n) rounds with the same
join+min building blocks.

Scale notes: each round is one shuffle (join on node id) + one partial-agg
min; ``localCheckpoint(eager=True)`` truncates the lineage each round so the
plan doesn't grow with iteration count (the classic iterative-DataFrame
trap); the convergence probe is a count on the label table (O(nodes), not
O(edges)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node incident to an edge.

    ``component`` is the minimum node id in the node's component — a
    deterministic canonical representative (the "keep this one" id of a
    dup cluster). Nodes with no edges are singletons and not emitted.

    Raises ``RuntimeError`` if labels are still changing after ``max_iter``
    rounds (component diameter > max_iter): returning silently
    non-converged labels would split a cluster and keep/drop the wrong
    documents downstream.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.localCheckpoint(eager=True)  # pair emission runs once, not per round

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("comp").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("neigh_min", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or switch "
            "to the large-star/small-star O(log n) variant"
        )

    return labels.select("node", F.col("comp").alias("component"))


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, size) per cluster, ordered — the dedup-report shape."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iters: int = 3,
    damping: float = 0.85,
    inner_digits: int = 12,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank rounds.

    Each round is the two-shuffle DataFrame form: contributions =
    edges ⋈ ranks on src (rank/out_degree per edge), then one hash
    aggregate on dst; rank' = (1-d)/N + d * inbound_sum.
    ``localCheckpoint`` truncates lineage per round (same iterative-plan
    discipline as :func:`connected_components`). Degrees and N are
    computed once; the edge table is checkpointed so the (possibly
    join-heavy) edge construction runs once, not per round.

    Callers must pass a dangling-free graph (every node has out-degree
    ≥ 1 — e.g. a symmetrized edge set); this keeps the rank mass exact
    without a dangling-redistribution term and keeps the DuckDB oracle an
    unrolled CTE chain. Per-edge contributions and per-round ranks are
    rounded to ``inner_digits`` and the inbound sum runs through
    DECIMAL(38,12) (functions.exact.sum_exact) so every round is exact and
    order-independent in both engines — same determinism discipline as the
    Lloyd rounds in operators/clustering.py.
    """
    from newyork_taxi_etl_spark.functions.exact import sum_exact

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select("u").unionAll(e.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
    )
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                F.round(F.col("rank") / F.col("deg"), inner_digits).alias(
                    "c"
                ),
            )
            .groupBy("node")
            .agg(sum_exact("c").alias("inbound"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit((1 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("inbound"), F.lit(0.0)),
                    inner_digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
