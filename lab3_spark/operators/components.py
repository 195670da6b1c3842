"""Connected components over candidate-pair graphs.

The dedup pipeline's last mile: MinHash/SimHash candidate pairs say
"these two docs are near-dups", but near-duplication is transitive in
practice (A≈B, B≈C → one cluster {A,B,C} keeps ONE representative).
That closure is a connected-components problem — inherently ITERATIVE,
the one operator family Catalyst can't express in a single plan.

Implementation: min-label propagation to fixpoint, driven by a
driver-side loop (each iteration is a join + groupBy-min; the
per-iteration `.count()` is the convergence check — the canonical
Spark shape for iterative graph algorithms, cf. GraphX Pregel).
Iteration count is bounded by the graph DIAMETER, and dedup-candidate
graphs are piles of tiny dense clusters — diameter is small; at 100 TB
the per-iteration cost is one shuffle of (node, label) pairs, and the
alternating small-star/large-star trick (Kiveris et al., "Connected
Components in MapReduce") drops the iteration count to
O(log diameter) if ever needed.

Lineage is truncated with localCheckpoint every few rounds — iterative
self-joins otherwise grow the plan tree exponentially and analysis
time dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 4


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, comp): component id = MIN node id reachable via `edges`
    (treated undirected).  Only nodes appearing in `edges` are labeled
    — isolated nodes are their own trivial component and carry no
    information for dedup.

    Exact fixpoint: terminates when an iteration changes no label, or
    raises after `max_iter` (never silently returns a half-converged
    labeling)."""
    und = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )

    for it in range(max_iter):
        neighbor_min = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
                (F.coalesce("ncomp", F.col("comp")) < F.col("comp")).alias("_chg"),
            )
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = new_labels.where(F.col("_chg")).count()
        labels.unpersist()
        labels = new_labels.drop("_chg")
        if changed == 0:
            und.unpersist()
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )
