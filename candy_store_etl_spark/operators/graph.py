"""Distributed connected components over an edge DataFrame.

The missing last stage of every near-duplicate pipeline: pair finders
(exact Jaccard, MinHash-LSH, SimHash, embedding-LSH — see
``operators/dedup.py`` / ``operators/similarity.py``) emit EDGES, but a
curation decision needs CLUSTERS — "these 17 documents are all the same
article; keep one". Near-dup similarity is not transitive, so the pair
list must be closed into components before a survivor can be chosen.

Algorithm: iterative min-label propagation expressed entirely in
DataFrame ops —

    labels(v) <- min(labels(v), min_{(u,v) in E} labels(u))

repeated until a fixed point. Each round is one equi-join (edges x
labels) plus one grouped min — two shuffles on the node key, both
map-side combinable. Round count equals the graph diameter, which for
near-dup graphs is small (dense cliques plus short bridges; the test
corpus converges in 4 rounds). For adversarial long-path graphs the
star-contraction family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) converges in O(log n) rounds; label
propagation is chosen here because dedup graphs are diameter-bounded
and the per-round plan is two narrow shuffles with no skewed
re-keying.

Scale posture: state per round is one (node, long) pair per vertex —
no adjacency materialization beyond the input edge list. Lineage is
truncated every round with ``localCheckpoint`` (a real deployment
would use a reliable ``checkpoint`` dir; local mode has no executor
loss to recover from). Convergence is detected with a single scalar
aggregate — labels decrease monotonically, so an unchanged
``(count, sum)`` signature is an exact fixed-point test, not a
heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_persist


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Resolve undirected edges into components.

    Parameters
    ----------
    edges:
        DataFrame with two long-typed node columns ``src`` and ``dst``.
        Treated as undirected; duplicates and self-loops are fine.
    max_rounds:
        Safety bound on propagation rounds (diameter cap). Raising it
        is safe — convergence normally stops the loop much earlier.

    Returns
    -------
    DataFrame ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node``. Every node that appears in any
    edge gets a row; isolated nodes are the caller's to union in
    (see ``component_labels``).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # Undirected closure, deduped once up front so every round joins
    # the minimal edge list.
    sym = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    def signature(lab: DataFrame) -> tuple[int, int]:
        row = lab.agg(
            F.count(F.lit(1)).alias("n"), F.sum("component").alias("s")
        ).collect()[0]
        return (row["n"], row["s"] if row["s"] is not None else 0)

    sig = signature(labels)
    for _ in range(max_rounds):
        # candidate labels flowing along edges: dst inherits src's label
        prop = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "component")
        )
        labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sig = signature(labels)
        if new_sig == sig:  # monotone-decreasing sum: exact fixed point
            break
        sig = new_sig
    return labels


def component_labels(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Label EVERY node: edge-connected nodes get their component min,
    isolated nodes label themselves (singleton clusters)."""
    comp = connected_components(edges, src=src, dst=dst)
    return (
        nodes.select(F.col(node_col).cast("long").alias("node"))
        .distinct()
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(node_col),
            F.coalesce("component", "node").alias("component"),
        )
    )


def orient_by_degree(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonicalize an undirected edge list LOW-(degree, id) →
    HIGH-(degree, id).

    The triangle-counting orientation (Suri & Vassilvitskii, WWW'11;
    Cohen's MapReduce bound): with edges oriented away from the
    lexicographically smaller ``(degree, id)`` endpoint, every wedge
    pivots on its LOWEST-degree vertex, so per-pivot fan-out is bounded
    by O(sqrt(m)) even on a power-law graph — raw id orientation lets a
    hot low-id hub pivot all its C(deg, 2) wedges (quadratic per key;
    see tests/test_round4.py's hub-graph assertion for the measured
    difference).

    Input edges are treated as undirected (deduped canonically,
    self-loops dropped). Output columns: ``src``, ``dst``, ``dst_deg``
    (the destination's degree, carried so wedge endpoints can be
    ordered by the same ``(degree, id)`` key without re-joining).
    Cost: one degree aggregate + two vertex-keyed joins, all
    map-side combinable.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("s"))
        .unionAll(e.select(F.col("v").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("s").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("s").alias("v"), F.col("d").alias("dv")), "v")
    )
    low_first = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    return ed.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(low_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    )


def triangle_count_oriented(oriented: DataFrame) -> DataFrame:
    """Count triangles from a degree-oriented edge list
    (``orient_by_degree`` output): wedges pair each pivot's
    out-neighbors ordered by ``(degree, id)``, closed by one oriented
    edge lookup — each triangle counted exactly once at its
    lowest-(degree, id) vertex. Returns a 1-row ``n_triangles`` frame
    composed lazily (caller crossJoins it, nothing collected)."""
    e1 = oriented.select(
        F.col("src").alias("p"),
        F.col("dst").alias("y"),
        F.col("dst_deg").alias("yd"),
    )
    e2 = oriented.select(
        F.col("src").alias("p"),
        F.col("dst").alias("z"),
        F.col("dst_deg").alias("zd"),
    )
    wedges = e1.join(e2, "p").filter(
        F.struct(F.col("yd"), F.col("y")) < F.struct(F.col("zd"), F.col("z"))
    )
    closure = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = wedges.join(closure, ["y", "z"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_integer(
    edges: DataFrame,
    *,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, in exact integer micro-units.

    The Pregel-shaped iteration — each round is one equi-join
    (ranks x edges on src) plus one grouped sum on dst — but every
    quantity is an integer: ranks live in units of 1e-12
    (``SCALE = 10^12``), the per-edge contribution is ``rank div
    out_degree``, and damping 0.85 is applied as ``(17 * sum) div 20``.
    Integer sums are order-independent, so the result is bit-identical
    across partitionings, retries, and engines — the floating-point
    formulation drifts by ulps with partition count, which is exactly
    what tests/test_partition_invariance.py exists to catch.

    Truncation error: each div floors, losing < 1 micro-unit per term
    per round — bounded by (iterations x max_degree) micro-units, i.e.
    ~1e-9 of total mass; ranking order is unaffected for any real
    graph while determinism becomes exact rather than approximate.

    Scale posture: edges (+ out-degrees) are computed once, cached and
    re-joined every round; rank state is one (node, long) pair per
    vertex. Rounds shuffle on dst only — the canonical iterative
    graph pattern (same shape as ``connected_components``).
    """
    SCALE = 10**12
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").transform(tracked_persist)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(tracked_persist)
    )
    n = nodes.count()
    init = int(SCALE // n)
    base = (15 * SCALE) // (100 * n)
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        contrib = (
            ranks.join(ed, ranks.node == ed.src)
            .select("dst", F.expr("rank_micro div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")
            )
            .cast("long")
            .alias("rank_micro"),
        )
    return ranks


def maintain_components(
    spark,
    pairs_dir: str,
    clusters_dir: str,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_buckets: int = 64,
    versions: list[int] | None = None,
) -> int:
    """Incrementally maintained connected components over an
    APPEND-ONLY pairs table (``operators/dedup.maintain_neardup_index``
    writes one): drain each not-yet-applied pairs VERSION as one edge
    batch and merge components without ever re-running propagation
    over the full edge history.

    Per increment, with A = the maintained (node, label) assignment:

    1. rep(n) = A.label(n), or n itself for first-seen nodes — two
       batch-sized probe joins against A, never a scan-rewrite;
    2. propagate min-labels over the REP graph (one node per touched
       component — propagation cost scales with the increment's
       component merges, not the corpus);
    3. upsert ONLY the changed assignments: members of components
       whose label changed (a label-pruned join against A) plus the
       batch's first-seen nodes — merged into the bucketed clusters
       table by the coverage-routed CDC sink, so the rewrite volume
       is proportional to touched keys.

    Invariant: A maps every edge-touched node to the min doc id of its
    component over all edges applied so far — each rep's label is
    already its component's min, so the merged group's min over rep
    labels equals the min over all members. Idempotent: the batch id
    IS the pairs version, recorded in the sink's applied ledger.
    Returns the number of pair versions applied."""
    from pyspark.sql import functions as F

    from ..caching import scoped_cache
    from ..sources import table_log as tl
    from ..streaming.cdc import applied_batches, make_routed_cdc_sink

    latest = tl.current_version(pairs_dir)
    if latest is None:
        return 0
    done = applied_batches(clusters_dir)
    # ``versions`` restricts the drain to a PUBLISHED list (the
    # maintained index's manifest — ``manifest_published(...)["pairs"]``):
    # a pairs version a crashed or racing ingest appended but never
    # published must not leak into the assignment. Default (None)
    # drains every version, the right behavior for a pairs table
    # without a manifest.
    candidates = (
        sorted(versions) if versions is not None else range(latest + 1)
    )
    todo = [v for v in candidates if v not in done]
    if not todo:
        return 0

    sink = make_routed_cdc_sink(
        clusters_dir,
        lambda batch_df: batch_df,  # assignments are already per-key
        key_col="node",
        add_cols=(),
        carry_cols=("label",),  # new label wins; absent keys keep theirs
        n_buckets=n_buckets,
        # no self-refining: this function's contract is upsert volume
        # proportional to the increment's touched keys, and a refine
        # would pay a whole-table rewrite inside what the caller
        # (e.g. scripts/neardup_increment.py's marginal-cost claim)
        # believes is a batch-proportional drain; layout maintenance
        # for the clusters table is the operator's call
        refine_after=None,
    )

    applied = 0
    for v in todo:
        edges = (
            tl.read_version_delta(spark, pairs_dir, v)
            .select(
                F.col(id_a).cast("long").alias("src"),
                F.col(id_b).cast("long").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # file presence, not version presence: an all-empty drain
        # history leaves a versioned but FILE-LESS clusters table
        # (ledger-only commits), and read_snapshot raises on those
        have_a = (
            tl.current_version(clusters_dir) is not None
            and bool(tl.snapshot_files(clusters_dir))
        )
        if have_a:
            a_tbl = tl.read_snapshot(spark, clusters_dir).select(
                "node", "label"
            )

            def _rep(col):
                side = a_tbl.select(
                    F.col("node").alias(col),
                    F.col("label").alias(f"_rep_{col}"),
                )
                return side

            edges = (
                edges.join(_rep("src"), "src", "left")
                .join(_rep("dst"), "dst", "left")
                .select(
                    F.coalesce("_rep_src", "src").alias("src"),
                    F.coalesce("_rep_dst", "dst").alias("dst"),
                )
            )
        with scoped_cache(edges) as rep_edges:
            if rep_edges.isEmpty():
                # still mark the version applied: an empty batch
                # through the sink commits the ledger row
                sink(
                    spark.createDataFrame([], "node long, label long"), v
                )
                applied += 1
                continue
            comp = connected_components(rep_edges).withColumnRenamed(
                "component", "new_label"
            )
            changed_reps = comp.filter(F.col("node") != F.col("new_label"))
            # batch nodes take their rep's (possibly merged) label
            batch_nodes = (
                rep_edges.select(F.col("src").alias("rep"))
                .union(rep_edges.select(F.col("dst").alias("rep")))
                .distinct()
                .join(comp, F.col("rep") == comp["node"], "left")
                .select(
                    F.col("rep").alias("node"),
                    F.coalesce("new_label", "rep").alias("label"),
                )
            )
            if have_a:
                # members of merged components — pruned by label, so
                # only touched components' rows are rewritten
                moved_members = a_tbl.join(
                    changed_reps,
                    a_tbl["label"] == changed_reps["node"],
                ).select(a_tbl["node"], F.col("new_label").alias("label"))
                updates = moved_members.unionByName(batch_nodes)
            else:
                updates = batch_nodes
            # reps are label values, not necessarily member nodes of
            # this batch: a rep row (rep -> merged label) is itself a
            # valid assignment (labels are doc ids and every label is
            # a member of its own component)
            sink(
                updates.groupBy("node").agg(F.min("label").alias("label")),
                v,
            )
        applied += 1
    return applied
