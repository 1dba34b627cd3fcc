"""Connected components over near-duplicate pair graphs.

Near-dup detection emits PAIRS (``doc_ngram_jaccard``,
``phash_near_dups``, ``minhash_near_dups``, ...), but curation needs
CLUSTERS: if A~B and B~C, then {A, B, C} is one duplicate group and
exactly one representative should survive. The reference's
``deduplicate()`` (``/root/reference/mehc_curation/utils/common.py:8-196``)
only handles equality groups (same key); transitive closure over a
*similarity* relation has no reference analog — it is the standard
production shape for web-scale corpus dedup (keep one document per
near-dup cluster, cf. SlimPajama / RefinedWeb pipelines).

Algorithm: alternating large-star / small-star from Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond" (SoCC 2014) — public literature. Each
operation is one shuffle (groupBy on node id); the edge set converges
to a star per component (every node points at its component minimum)
in O(log^2 n) rounds, independent of graph diameter — a plain
min-label-propagation loop would need O(diameter) rounds, which an
adversarial chain of near-dups makes linear.

Scale notes:

- Only (node, node) id pairs ever shuffle — never payloads.
- Each iteration ends in ``localCheckpoint`` to truncate lineage
  (iterative DataFrame plans otherwise grow until the planner chokes).
  On a real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
  reliable ``checkpoint`` for fault tolerance past executor loss.
- Convergence is a set-equality check (count + anti-join emptiness)
  on the materialized edge frame — two cheap jobs per round.
- Star-shaped skew (one hub node with millions of neighbors) is the
  algorithm's own intermediate state and is handled by AQE skew
  splitting on the groupBy; the per-group reduction is a single
  ``min``, so no collect_list blowup.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _orient(edges: DataFrame) -> DataFrame:
    """Canonical form: (u, v) with u > v, no self-loops, distinct."""
    return (
        edges.filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Output edges (v, m) always satisfy v > m, so the frame stays in
    canonical orientation without a re-orient pass.
    """
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    min(N(u) ∪ {u}).

    Input must be in canonical orientation (u > v for every edge), so
    min(N_small(u)) is the component candidate m < u; emitted edges
    (x, m) keep x > m.
    """
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    spokes = edges.join(mins, "u").select(F.col("v").alias("u"),
                                          F.col("m").alias("v"))
    center = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        spokes.unionAll(center)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Component label per node appearing in ``edges``.

    Returns a DataFrame ``(id, component)`` where ``component`` is the
    MINIMUM node id of the connected component — deterministic, so the
    labels are stable across partitionings and reruns.

    ``edges`` may contain duplicates, self-loops and both orientations;
    all are normalized away. Nodes not present in any edge are absent
    from the result (join the caller's node table and
    ``coalesce(component, id)`` for singleton semantics — see
    :func:`near_dup_clusters`).
    """
    e = _orient(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.localCheckpoint()
    n_prev = e.count()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        n2 = e2.count()
        if n2 == n_prev and e2.join(e, ["u", "v"], "left_anti").isEmpty():
            e = e2
            break
        e, n_prev = e2, n2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # fixpoint is a star per component: (node, component_min) for every
    # non-root node; roots appear only on the v side.
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"),
                     F.col("v").alias("component")).distinct()
    return (
        members.unionAll(roots)
        .groupBy("id").agg(F.min("component").alias("component"))
    )


def near_dup_clusters(df: DataFrame, pairs: DataFrame, id_col: str,
                      quality_col: Optional[str] = None,
                      src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Cluster assignment + representative election over a near-dup
    pair list.

    Every row of ``df`` gets a ``cluster`` (the minimum id of its
    connected component; its own id if it matched nothing) and an
    ``is_rep`` flag — exactly one representative per cluster, chosen
    by highest ``quality_col`` (ties and ``quality_col=None`` fall
    back to the smallest id). Downstream dedup keeps ``is_rep`` rows:
    the transitive-closure generalization of the reference's
    keep-first perfect-dup rule
    (``/root/reference/mehc_curation/utils/common.py:88-90``).

    Election runs as per-cluster AGGREGATES (max quality, then min id
    among the maximizers), never a cluster-partitioned window:
    components merge candidate buckets transitively, so a template-
    spam corpus can produce one enormous cluster, and a window sort
    over it would land in a single task — hash aggregates stay
    map-side combinable no matter how big the cluster gets.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    out = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(df["*"],
                F.coalesce("component", df[id_col]).alias("cluster"))
    )
    if quality_col:
        # max quality per cluster (null if every member's is null),
        # then smallest id among the null-safe maximizers — identical
        # semantics to ordering by (quality DESC NULLS LAST, id ASC)
        stats = out.groupBy("cluster").agg(
            F.max(quality_col).alias("_maxq"))
        rep = (out.join(stats, "cluster")
               .where(F.col(quality_col).eqNullSafe(F.col("_maxq")))
               .groupBy("cluster").agg(F.min(id_col).alias("_rep_id")))
    else:
        rep = out.groupBy("cluster").agg(F.min(id_col).alias("_rep_id"))
    return (out.join(rep, "cluster")
            .select(id_col, "cluster",
                    (F.col(id_col) == F.col("_rep_id")).alias("is_rep"),
                    *([quality_col] if quality_col else [])))
