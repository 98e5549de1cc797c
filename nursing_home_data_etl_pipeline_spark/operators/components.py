"""Connected components over a pair graph (near-dup pairs -> clusters):
min-label propagation — rounds = graph diameter (shallow for near-dup
stars/cliques, 3-5 typical), each round two hash joins + an aggregate,
all shuffle-partitioned by vertex; inherently iterative, so the oracle
twin is DuckDB's recursive CTE. Full notes:
docs/DESIGN.md#components-connected-components."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _driver_union_find(
    vertices: DataFrame, edge_rows, id_col: str
) -> DataFrame:
    """Small-graph fast path: classic union-find on the driver, joined back
    to the (possibly huge) vertex set. Non-members label themselves."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {a for a, _ in edge_rows} | {b for _, b in edge_rows}
    spark = vertices.sparkSession
    if not nodes:
        return vertices.select(F.col(id_col), F.col(id_col).alias("component"))
    # Internal frames use _cc_-prefixed names: an id_col literally named
    # 'v'/'component' previously made the joins below AMBIGUOUS_REFERENCE —
    # and only on THIS path, so success depended on which side of
    # driver_edge_threshold the edge count landed (round-9 review).
    vtype = vertices.schema[id_col].dataType.simpleString()
    # Labels must be VERTEX ids (a conduit-only id would make the keep-one
    # filter delete every copy) — docs/DESIGN.md#components-conduct-only.
    nodes_df = spark.createDataFrame([(n,) for n in nodes], schema=f"_cc_v {vtype}")
    members = {
        r[0]
        for r in vertices.join(
            F.broadcast(nodes_df), vertices[id_col] == nodes_df["_cc_v"], "left_semi"
        )
        .select(id_col)
        .collect()
    }
    groups: dict = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    labels = []
    for mem in groups.values():
        rep = min((m for m in mem if m in members), default=min(mem))
        labels.extend((m, rep) for m in mem)
    lab_df = spark.createDataFrame(
        labels, schema=f"_cc_v {vtype}, _cc_label {vtype}"
    )
    return vertices.join(
        F.broadcast(lab_df), vertices[id_col] == lab_df["_cc_v"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("_cc_label"), F.col(id_col)).alias("component"),
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
    driver_edge_threshold: int = 100_000,
) -> DataFrame:
    """Label every vertex with the min vertex id of its component. Design
    notes: docs/DESIGN.md#components-connected-components"""
    if id_col == "component":
        # the output schema is (id_col, 'component') — inherently duplicate
        raise ValueError(
            "connected_components: id_col cannot be named 'component' "
            "(the output's label column); rename the id column upstream"
        )
    # NULL endpoints carry no identity: an edge touching NULL can't connect
    # anything (the driver path would crash comparing None to ids, the
    # distributed path would silently drop the edge — drop it EXPLICITLY so
    # both paths agree).
    edges = edges.filter(
        F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    )
    # Register every cached frame immediately; ALL release on ANY failure
    # (the except below) — mid-iteration errors once leaked session cache.
    cached: list = []

    def _cache(frame: DataFrame) -> DataFrame:
        cached.append(frame.cache())
        return frame

    # Components are over a SET of vertex identities — duplicated vertex
    # rows must not emit two labeled rows (round-8 fuzz); cached because
    # both paths consume the distinct'd plan twice
    # (docs/DESIGN.md#components-conduct-only).
    vertices = _cache(vertices.select(id_col).distinct())
    # The edge set is consumed twice (size probe, then collect or symmetric
    # expansion) and upstream it is typically a full LSH candidate pipeline
    # (shingle -> signature -> band join) — cache it so that pipeline runs
    # once, not twice. Bounded by candidate pairs, not corpus size.
    edges = _cache(edges.select(src_col, dst_col))
    try:
        # One job probes AND fetches: if the limit did not truncate, the
        # collected rows ARE the whole edge set (union-find is order-
        # insensitive), so the separate count() pass is redundant.
        probe_rows = edges.limit(driver_edge_threshold + 1).collect()
        if len(probe_rows) <= driver_edge_threshold:
            edge_rows = [(r[0], r[1]) for r in probe_rows]
            edges.unpersist()
            return _driver_union_find(vertices, edge_rows, id_col)
        sym = _cache(
            edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
            .unionByName(
                edges.select(
                    F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
                )
            )
            .distinct()
        )
        # Endpoints absent from `vertices` still CONDUCT connectivity,
        # so the label set must include them (else the answer depends on
        # the driver/distributed path taken); endpoint set is
        # edge-bounded — docs/DESIGN.md#components-conduct-only.
        v_ids = vertices.select(F.col(id_col).alias("v"))
        extras = _cache(
            sym.select(F.col("src").alias("v"))
            .distinct()
            .join(v_ids, "v", "left_anti")
        )
        has_extras = extras.limit(1).count() > 0
        seed = v_ids.unionByName(extras) if has_extras else v_ids
        labels = _cache(seed.select("v", F.col("v").alias("label")))
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym["dst"] == labels["v"])
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
            )
            new_labels = _cache(
                labels.join(
                    neighbor_min, labels["v"] == neighbor_min["src"], "left"
                )
                .select(
                    "v",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                    ).alias("label"),
                )
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                out = labels
                if has_extras:  # conduct-only vertices drop out of the result
                    # Materialize the (edge-bounded) `extras` cache while
                    # sym/edges are still cached — unpersisting here made
                    # the caller's first action recompute the whole
                    # upstream edge pipeline; leave it to LRU.
                    extras.count()
                    out = labels.join(F.broadcast(extras), "v", "left_anti")
                    # Remap conduit-labeled components to their min VERTEX
                    # id; probe frames are edge-bounded -> broadcasts
                    # (docs/DESIGN.md#components-conduct-only).
                    extra_labels = extras.select(F.col("v").alias("label"))
                    rep = (
                        out.join(F.broadcast(extra_labels), "label", "left_semi")
                        .groupBy("label")
                        .agg(F.min("v").alias("_rep"))
                    )
                    out = out.join(F.broadcast(rep), "label", "left").select(
                        "v",
                        F.coalesce(F.col("_rep"), F.col("label")).alias("label"),
                    )
                else:
                    extras.unpersist()
                sym.unpersist()
                edges.unpersist()
                return out.select(
                    F.col("v").alias(id_col), F.col("label").alias("component")
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    except BaseException:
        # failure path: nothing escapes — release every frame ever cached
        # (unpersist on an already-released frame is a no-op)
        for frame in cached:
            try:
                frame.unpersist()
            except Exception:
                pass  # cache release must never mask the real error
        raise


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup clusters from candidate pairs: (doc_id, cluster_id,
    cluster_size). cluster_id is the min doc_id of the component; singleton
    documents form their own cluster of size 1. The keep-one-per-cluster
    dedup is then ``filter(doc_id == cluster_id)``."""
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col
    ).withColumnRenamed("component", "cluster_id")
    # Size via a window on the label column: ONE shuffle on cluster_id and
    # comp is consumed once — a groupBy+join would consume it twice and
    # force a cache this function could never safely unpersist (the result
    # is lazy; releasing before the caller materializes would recompute).
    w = Window.partitionBy("cluster_id")
    return comp.select(
        id_col,
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
