"""Canonicalization: connected components over the surface-similarity graph.

Reference analog: the k-medoids mention-clustering prototype
(/root/reference/splitner/utils/mention_clustering.py:113-161), which
pairwise-compares every mention on the driver. The rebuild replaces it
with the scalable formulation (SURVEY §2 C1 upgrade): LSH-blocked
similarity edges → connected components → one canonical id per component.

Algorithm: iterative min-label propagation ("hash-to-min") with
``localCheckpoint`` per round to cut lineage, and an exact convergence
check (count of changed labels == 0). Alias/near-dup graphs are star-like
(diameter ≤ 3-4), so this converges in a handful of rounds; for
adversarially long path graphs the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond") is the
drop-in upgrade — the join structure below is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(rows: list, spark, schema) -> DataFrame:
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    out = [(n, find(n)) for n in parent]
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    src: str = "src",
    dst: str = "dst",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """edges(src, dst) undirected → (node, component) where component is
    the min node id (by the column's ordering) in the component.

    Hybrid: when the (deduplicated) edge set is small enough to hold on
    the driver, run union-find locally — a tiny graph should not pay
    5+ distributed jobs per iteration. Past ``driver_threshold`` edges,
    the iterative min-label-propagation path below takes over; at true
    web scale that is the only option."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    head = e.limit(driver_threshold + 1).collect()
    if len(head) <= driver_threshold:
        schema = e.select(
            F.col("u").alias("node"), F.col("u").alias("component")
        ).schema
        return _driver_union_find([(r["u"], r["v"]) for r in head], e.sparkSession, schema)
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def canonical_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node"
) -> DataFrame:
    """All nodes (including isolated ones) → (node, component); isolated
    nodes are their own component."""
    cc = connected_components(edges)
    return (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .join(cc, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def canonicalize_self_linked(
    linked: DataFrame,
    jaccard_threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Merge variant UNKNOWN surfaces: mentions the dictionary could not
    link (linked_via='self') whose normalized surfaces are near-duplicates
    (char-3-gram Jaccard ≥ threshold under LSH blocking) collapse into one
    component; canonical_id becomes ``surface:<component representative>``.

    This is the C1-upgrade canonicalization of SURVEY §2 applied inside
    the pipeline: dictionary-linked mentions are untouched; candidate new
    entities are deduplicated before triple emission. Cost scales with
    |distinct unknown surfaces|, not |mentions|.
    """
    from .lsh import char_shingles_col, lsh_self_join  # local import: no cycle

    # eager-materialize the tiny unknown-surface dimension ONCE: the CC
    # loop below runs many small jobs, and without a materialization point
    # each would rescan the (large, cached-but-columnar) fact table.
    self_surf = (
        linked.filter(F.col("linked_via") == "self")
        .select("surface_norm")
        .distinct()
        .cache()
    )
    if self_surf.count() == 0:
        self_surf.unpersist()
        return linked
    sh = self_surf.withColumn("shingles", char_shingles_col(F.col("surface_norm")))
    pairs = lsh_self_join(
        sh, "surface_norm", num_hashes=num_hashes, bands=bands,
        threshold=jaccard_threshold,
    ).cache()
    if pairs.isEmpty():
        # no near-duplicate unknown surfaces — nothing to merge
        pairs.unpersist()
        self_surf.unpersist()
        return linked
    comp = canonical_components(
        self_surf.select(F.col("surface_norm").alias("node")),
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
    ).select(
        F.col("node").alias("surface_norm"),
        F.concat(F.lit("surface:"), F.col("component")).alias("_canon2"),
    )
    out = (
        linked.join(comp, "surface_norm", "left")
        .withColumn(
            "canonical_id",
            F.when(
                (F.col("linked_via") == "self") & F.col("_canon2").isNotNull(),
                F.col("_canon2"),
            ).otherwise(F.col("canonical_id")),
        )
        .drop("_canon2")
    )
    return out
