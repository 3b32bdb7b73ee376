"""Full KG-construction pipeline (north_star):

    transcripts ─ extract (actor pool) ─ triples ─┬─ mentions → link → canonicalize → nodes
                                                  └─ edge combine → dedup/weight → edges

Stage boundaries are Parquet directories: ``out_dir/triples``,
``out_dir/nodes``, ``out_dir/edges``.  Triples are written once and re-read by
the two downstream consumers — re-reading a checkpoint beats re-executing the
extraction lineage twice, and the checkpoint is what makes a rerun resumable
(``state/checkpoint.py``).

Also hosts conversation reconstruction (G3): ``groupby(conv_id)`` +
intra-group sort by ``turn_idx`` — the stage that witnesses the per-turn text
invariant from BASELINE.json's ``input_hint``.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

from .extract import extract_triples


def reconstruct_conversations(transcripts_ds):
    """Per-conversation summary after restoring stable turn order.

    Rows arrive physically shuffled; each group is sorted by ``turn_idx``
    before the rolling text digest, so the digest is a pure function of the
    conversation content — the per-turn text-equality invariant.
    """

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        digest = hashlib.sha256()
        for t in df["text"]:
            digest.update(t.encode())
            digest.update(b"\x00")
        return pd.DataFrame(
            {
                "conv_id": [df["conv_id"].iloc[0]],
                "n_turns": [len(df)],
                "turn_idx_sum": [int(df["turn_idx"].sum())],
                "n_roles": [int(df["role"].nunique())],
                "text_sha": [digest.hexdigest()],
            }
        )

    return transcripts_ds.groupby("conv_id").map_groups(
        summarize, batch_format="pandas"
    )


def kg_nodes(triples_ds, alias_index_ref=None, concurrency=None):
    """Triples -> canonical node table (link + salted canonicalization)."""
    import ray

    from ..stages.canonicalize import canonicalize_nodes
    from ..stages.linking import EntityLinker, mentions_from_triples

    from ..stages.linking import task_link  # noqa: F401

    mentions = triples_ds.map_batches(
        mentions_from_triples, batch_format="pyarrow"
    )
    ref_key = alias_index_ref.hex() if alias_index_ref is not None else "kb"
    linked = mentions.map_batches(
        task_link,
        fn_kwargs={"ref_key": ref_key, "alias_index_ref": alias_index_ref},
        batch_format="pyarrow",
    )
    return canonicalize_nodes(linked)


def kg_edges(triples_ds, alias_index_ref=None, concurrency=None):
    from ..stages.graph import materialize_edges

    return materialize_edges(
        triples_ds, alias_index_ref=alias_index_ref, concurrency=concurrency
    )


def build_kg(transcripts_ds, head: str = "baseline", out_dir: str | None = None):
    """Run the full pipeline; returns {triples, nodes, edges} Datasets.

    With ``out_dir`` set, each stage is checkpointed to
    ``{out_dir}/<name>`` Parquet and downstream stages read the
    checkpoint (the resumable production shape); without it everything stays
    in-memory lineage (tests).
    """
    import ray

    from ..sources.readers import read_parquet_clean

    triples = extract_triples(transcripts_ds, head=head)
    if out_dir:
        triples_dir = f"{out_dir}/triples"
        triples.write_parquet(triples_dir)
        # metadata-free re-read: pandas footer metadata makes the fragment
        # schemas unhashable (Ray then logs "Failed to hash the schemas"
        # and loses its schema-dedup fast path on every downstream stage)
        triples = read_parquet_clean(triples_dir)

    from ..sources.kb import build_alias_index

    alias_ref = ray.put(build_alias_index())

    nodes = kg_nodes(triples, alias_index_ref=alias_ref)
    edges = kg_edges(triples, alias_index_ref=alias_ref)
    if out_dir:
        nodes_dir = f"{out_dir}/nodes"
        edges_dir = f"{out_dir}/edges"
        nodes.write_parquet(nodes_dir)
        edges.write_parquet(edges_dir)
        nodes = read_parquet_clean(nodes_dir)
        edges = read_parquet_clean(edges_dir)
    return {"triples": triples, "nodes": nodes, "edges": edges}


def build_kg_resumable(
    n_convs: int,
    out_dir: str,
    head: str = "baseline",
    n_partitions: int = 8,
) -> dict:
    """Flagship KG job with partition-granular resume at EVERY stage
    (extract → link/canonicalize → graph), replacing the plain
    ``write_parquet`` of :func:`build_kg` with manifest-checkpointed
    partitions (``state/checkpoint.py``): a killed run reruns only the
    partitions whose manifest is missing or stale.

    Stage lineage chains: the nodes/edges specs embed every extraction
    partition's input fingerprint, so a changed extraction (different
    head, corpus, engine version) invalidates the downstream checkpoints
    while an unchanged rerun skips all three stages.  Nodes/edges are
    global reduces over the full triples table, so each is one logical
    partition at this granularity (their shuffles parallelize internally);
    at cluster scale the extraction stage carries the partition fan-out.
    """
    import json as _json

    import ray

    from ..sources.kb import build_alias_index
    from ..state.checkpoint import (
        manifest_path,
        read_all_partitions,
        run_partitioned,
        run_partitioned_extraction,
    )

    triples_dir = f"{out_dir}/triples"
    s_extract = run_partitioned_extraction(
        n_convs, triples_dir, head=head, n_partitions=n_partitions
    )

    # downstream lineage = the ordered extraction fingerprints
    upstream_fps = []
    for part in range(len(s_extract["partitions"])):
        with open(manifest_path(triples_dir, part)) as f:
            upstream_fps.append(_json.load(f)["input_fingerprint"])

    alias_ref = ray.put(build_alias_index())

    def run_nodes(spec: dict):
        return kg_nodes(
            read_all_partitions(triples_dir), alias_index_ref=alias_ref
        )

    def run_edges(spec: dict):
        return kg_edges(
            read_all_partitions(triples_dir), alias_index_ref=alias_ref
        )

    s_nodes = run_partitioned(
        f"{out_dir}/nodes",
        [{"kind": "kg_nodes", "head": head, "upstream": upstream_fps}],
        run_nodes, stage="nodes",
    )
    s_edges = run_partitioned(
        f"{out_dir}/edges",
        [{"kind": "kg_edges", "head": head, "upstream": upstream_fps}],
        run_edges, stage="edges",
    )
    return {
        "summary": {"extract": s_extract, "nodes": s_nodes, "edges": s_edges},
        "triples": read_all_partitions(triples_dir),
        "nodes": read_all_partitions(f"{out_dir}/nodes"),
        "edges": read_all_partitions(f"{out_dir}/edges"),
    }


def kg_node_degrees(edges_ds):
    """Graph analytics over the materialized edge table: per-node out/in
    degree and weighted degree — a second-order aggregate proving the edge
    table is queryable as a graph.  Shape: map-side partials (one row per
    entity per batch) + one hash-bucketed vectorized reduce; entity
    cardinality never concentrates on a single reducer."""
    import pyarrow as pa

    from ..functions.grouping import bucketed_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("src_id").agg(
            out_degree=("dst_id", "size"), out_weight=("weight", "sum")
        ).reset_index().rename(columns={"src_id": "entity_id"})
        inn = df.groupby("dst_id").agg(
            in_degree=("src_id", "size"), in_weight=("weight", "sum")
        ).reset_index().rename(columns={"dst_id": "entity_id"})
        merged = out.merge(inn, on="entity_id", how="outer").fillna(0)
        return pa.Table.from_pandas(merged, preserve_index=False)

    partials = edges_ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every entity in the hash bucket
        out = df.groupby("entity_id", as_index=False)[
            ["out_degree", "out_weight", "in_degree", "in_weight"]
        ].sum()
        for c in ("out_degree", "out_weight", "in_degree", "in_weight"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_apply(partials, "entity_id", merge)


def _local_triangles(pdf: pd.DataFrame):
    """Driver-local degree-ordered triangle count over a bounded canonical
    pair list — same orientation rule and output schema as the distributed
    plan in :func:`kg_triangles`."""
    from collections import Counter, defaultdict

    import ray

    deg: Counter = Counter()
    edge_set = set(zip(pdf["u"], pdf["v"]))  # canonical: u < v (as str)
    for u, v in edge_set:
        deg[u] += 1
        deg[v] += 1
    fwd: defaultdict = defaultdict(list)
    for u, v in edge_set:
        if (deg[u], u) < (deg[v], v):
            fwd[u].append(v)
        else:
            fwd[v].append(u)
    tri: Counter = Counter()
    for s, nbrs in fwd.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                a, b = nbrs[i], nbrs[j]
                key = (a, b) if a < b else (b, a)
                if key in edge_set:
                    tri[s] += 1
                    tri[a] += 1
                    tri[b] += 1
    out = pd.DataFrame(
        {"node": pd.Series(list(tri.keys()), dtype=str),
         "n_triangles": pd.Series(list(tri.values()), dtype="int64")}
    )
    return ray.data.from_pandas(out)


def kg_triangles(edges_ds, small_edge_limit: int = 2_000_000):
    """Per-node triangle counts over the undirected KG entity graph —
    degree-ordered distributed triangle enumeration.

    The scale problem with the naive node-iterator (every node emits all
    neighbor pairs) is hub entities: a node of degree d generates d²/2
    wedges.  The standard fix (node-iterator++ / Schank & Wagner 2005):
    orient each undirected edge from its LOWER-(degree, id) endpoint to the
    higher one; every node's FORWARD degree is then O(sqrt(m)), so total
    wedge volume is O(m^{3/2}) regardless of hubs.  Stages (all bucketed
    reduces / shuffle joins — nothing corpus-scale on the driver):

    1. canonical undirected pairs (u<v, loops dropped, distinct);
    2. degree per node (partial + bucketed merge);
    3. two shuffle joins attach (deg_u, deg_v) to each pair; orientation is
       then a row op;
    4. wedge generation grouped by oriented source (vectorized self-merge
       per bucket, forward-degree-bounded);
    5. wedge⋈edge match on the closing pair (union + bucketed reduce):
       each matched wedge is one triangle, emitting its 3 corners;
    6. per-node count (bucketed reduce).

    Oracle: 3-way self-join over the same canonical pair set in DuckDB.

    Size-gated plan (the PageRank pattern): entity graphs are edge-dedup
    OUTPUTS and typically fit far under ``small_edge_limit`` canonical
    pairs even when the mention corpus is 100 TB; below the gate the
    degree-ordered enumeration runs driver-local on the collected pair
    list (identical algorithm and output), above it the full 6-stage
    distributed plan runs.
    """
    from ..functions.grouping import bucketed_group_apply
    from ..functions.joins import shuffle_join

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["src_id"].astype(str)
        v = df["dst_id"].astype(str)
        out = pd.DataFrame(
            {"u": np.minimum(u, v), "v": np.maximum(u, v)}
        )
        return out[out["u"] != out["v"]].drop_duplicates()

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = bucketed_group_apply(
        edges_ds.map_batches(to_pairs, batch_format="pandas"), ["u", "v"],
        dedup,
    ).materialize()

    if pairs.count() <= small_edge_limit:
        return _local_triangles(pairs.to_pandas())

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["u"], df["v"]], ignore_index=True)
        out = nodes.value_counts().rename_axis("node").reset_index(name="deg")
        out["deg"] = out["deg"].astype("int64")
        return out

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    deg = bucketed_group_apply(
        pairs.map_batches(deg_partial, batch_format="pandas"), "node",
        deg_merge,
    )

    # attach both endpoint degrees (two shuffle joins against the degree
    # table — NOT a broadcast: entity cardinality is corpus-scale)
    def key_u(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"node": "u", "deg": "deg_u"})

    def key_v(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"node": "v", "deg": "deg_v"})

    with_du = shuffle_join(
        pairs, deg.map_batches(key_u, batch_format="pandas"), on="u"
    )
    with_dv = shuffle_join(
        with_du, deg.map_batches(key_v, batch_format="pandas"), on="v"
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # forward direction: lower (deg, id) -> higher (deg, id)
        u_first = (df["deg_u"] < df["deg_v"]) | (
            (df["deg_u"] == df["deg_v"]) & (df["u"] < df["v"])
        )
        return pd.DataFrame(
            {
                "src": np.where(u_first, df["u"], df["v"]),
                "fwd": np.where(u_first, df["v"], df["u"]),
            }
        )

    oriented = with_dv.map_batches(orient, batch_format="pandas")

    wedge_cols = ["a", "b", "src", "is_edge"]

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized wedge generation: self-merge forward adjacency per src
        m = df.merge(df, on="src", suffixes=("_1", "_2"))
        m = m[m["fwd_1"] < m["fwd_2"]]
        # closing pair canonical order: both forward neighbors, min first
        return pd.DataFrame(
            {
                "a": m["fwd_1"].to_numpy(),
                "b": m["fwd_2"].to_numpy(),
                "src": m["src"].to_numpy(),
                "is_edge": np.int8(0),
            }
        )

    wedge_rows = bucketed_group_apply(oriented, "src", wedges)

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": df["u"].to_numpy(),
                "b": df["v"].to_numpy(),
                "src": "",
                "is_edge": np.int8(1),
            },
            columns=wedge_cols,
        )

    tagged = wedge_rows.union(
        pairs.map_batches(edge_rows, batch_format="pandas")
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        # a wedge (src; a, b) closes iff the canonical pair (a, b) is an
        # edge; every match is a distinct triangle {src, a, b}
        e = df[df["is_edge"] == 1][["a", "b"]]
        w = df[df["is_edge"] == 0]
        tri = w.merge(e, on=["a", "b"])
        if tri.empty:
            return pd.DataFrame({"node": pd.Series([], dtype=str),
                                 "n_triangles": pd.Series([], dtype="int64")})
        corners = pd.concat(
            [tri["src"], tri["a"], tri["b"]], ignore_index=True
        )
        out = corners.value_counts().rename_axis("node").reset_index(
            name="n_triangles"
        )
        out["n_triangles"] = out["n_triangles"].astype("int64")
        return out

    matched = bucketed_group_apply(tagged, ["a", "b"], match)

    def node_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["n_triangles"].sum()
        out["n_triangles"] = out["n_triangles"].astype("int64")
        return out

    return bucketed_group_apply(matched, "node", node_merge)


def kg_pagerank(edges_ds, damping: float = 0.85, n_iter: int = 5,
                dense_threshold: int = 100_000):
    """PageRank over the directed KG entity graph (distinct src→dst edges),
    fixed-iteration power method — the engine's iterative-analytics shape.

    Two physical plans, chosen by measured node count (the classic
    size-based switch: node STATE is tiny relative to the edge table):

    - **dense broadcast** (n_nodes ≤ dense_threshold): the node universe
      and out-degrees fold from map-side partials; the adjacency is
      integer-encoded ONCE (broadcast id map) and repartitioned to
      cpu-count blocks; each iteration broadcasts the per-node emission
      vector (``ray.put``, 8 bytes/node) and runs ONE pure map pass —
      every block returns a dense contribution vector, the driver sums
      #blocks small vectors and applies damping/dangling in closed form.
      No per-iteration shuffle at all.  At the default threshold the
      broadcast is ≤ 800 KB and a block's return ≤ 800 KB — a KG of 10⁵
      canonical entities with 10¹² mentions stays in this regime.
    - **shuffle join** (larger): per iteration one shuffle join sends each
      node's rank to its out-edges and one bucketed reduce sums per
      destination; ranks re-materialize per round so lineage stays
      one-iteration deep.  Dangling mass recovers in closed form from the
      emitted-contribution sum (O(1) driver scalar per round).

    Both plans are value-identical (same update rule); floats → rows-only
    driver check; the fixed-point is pinned against a dense numpy
    reference in pytest for BOTH plans.
    """
    from ..functions.grouping import bucketed_group_apply
    from ..functions.joins import shuffle_join

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"src": df["src_id"].astype(str), "dst": df["dst_id"].astype(str)}
        )
        return out.drop_duplicates()

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    adj = bucketed_group_apply(
        edges_ds.map_batches(to_edges, batch_format="pandas"), ["src", "dst"],
        dedup,
    ).materialize()

    dense = _pagerank_dense(adj, damping, n_iter, dense_threshold)
    if dense is not None:
        return dense

    # node universe (src ∪ dst, distinct) — stays a Dataset
    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["src"], df["dst"]], ignore_index=True)}
        ).drop_duplicates()

    nodes = bucketed_group_apply(
        adj.map_batches(nodes_of, batch_format="pandas"), "node", dedup
    ).materialize()
    n_nodes = nodes.count()

    # out-degree → per-edge emission probability, attached once
    def outdeg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("src", as_index=False).agg(outdeg=("dst", "size"))
        out["outdeg"] = out["outdeg"].astype("int64")
        return out

    deg = bucketed_group_apply(adj, "src", outdeg)
    adj_p = shuffle_join(adj, deg, on="src").map_batches(
        lambda df: pd.DataFrame(
            {"src": df["src"], "dst": df["dst"],
             "p": 1.0 / df["outdeg"].to_numpy()}
        ),
        batch_format="pandas",
    ).materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["node"], "rank": 1.0 / n_nodes})

    ranks = nodes.map_batches(init_rank, batch_format="pandas").materialize()

    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        contrib = shuffle_join(adj_p, ranks, on="src").map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"],
                 "c": df["p"].to_numpy() * df["rank"].to_numpy()}
            ),
            batch_format="pandas",
        ).materialize()
        emitted = contrib.sum("c") or 0.0
        # non-dangling nodes emit their whole rank: dangling mass is the
        # remainder of the total (ranks always sum to 1 up to float error)
        dangling = max(0.0, 1.0 - emitted)

        def contrib_merge(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False)["c"].sum()
            return out

        summed = bucketed_group_apply(contrib, "node", contrib_merge)

        # every node gets the base + dangling share even with no in-edges:
        # union zero-contribution rows for the full node universe
        zeros = nodes.map_batches(
            lambda df: pd.DataFrame({"node": df["node"], "c": 0.0}),
            batch_format="pandas",
        )
        extra = base + damping * dangling / n_nodes

        def fold_rank(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False)["c"].sum()
            return pd.DataFrame(
                {"src": out["node"],
                 "rank": extra + damping * out["c"].to_numpy()}
            )

        ranks = bucketed_group_apply(
            summed.union(zeros), "node", fold_rank
        ).materialize()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"src": "node"})[["node", "rank"]]

    return ranks.map_batches(finish, batch_format="pandas")


def _pagerank_dense(adj, damping: float, n_iter: int, threshold: int):
    """Dense-broadcast PageRank plan (see ``kg_pagerank``).  Returns None
    when the node universe exceeds ``threshold`` (caller falls back to the
    shuffle-join plan).

    Node universe + out-degrees fold from map-side partials: each
    adjacency block contributes ≤ its distinct-node count of (node, cnt)
    rows, so the driver collect is bounded by #blocks × n_nodes — with
    n_nodes ≤ threshold that is MBs, while the edge table itself never
    leaves the cluster.
    """
    import pyarrow as pa
    import ray

    from ..stages.base import worker_cached

    def deg_rows(df: pd.DataFrame) -> pd.DataFrame:
        src_cnt = df["src"].value_counts()
        nodes = pd.Index(df["src"]).union(pd.Index(df["dst"])).unique()
        return pd.DataFrame(
            {
                "node": nodes,
                "outdeg": src_cnt.reindex(nodes).fillna(0).astype("int64"),
            }
        )

    parts = pd.concat(
        list(
            adj.map_batches(deg_rows, batch_format="pandas").iter_batches(
                batch_format="pandas"
            )
        ),
        ignore_index=True,
    )
    deg = parts.groupby("node")["outdeg"].sum()
    n = len(deg)
    if n > threshold:
        return None

    nodes = deg.index.to_numpy()
    outdeg = deg.to_numpy(dtype=np.float64)
    idx_ref = ray.put({nd: i for i, nd in enumerate(nodes)})

    # integer-encode the adjacency once; few fat blocks keep the
    # per-iteration vector collect at #blocks × 8n bytes
    def encode(df: pd.DataFrame) -> pd.DataFrame:
        idx = worker_cached(("pr_idx", idx_ref.hex()),
                            lambda: ray.get(idx_ref))
        return pd.DataFrame(
            {
                "s": df["src"].map(idx).astype("int32"),
                "d": df["dst"].map(idx).astype("int32"),
            }
        )

    import os

    n_blocks = max(1, min(os.cpu_count() or 8, adj.num_blocks()))
    enc = (
        adj.map_batches(encode, batch_format="pandas")
        .repartition(n_blocks)
        .materialize()
    )

    dangling_mask = outdeg == 0
    safe_deg = np.where(dangling_mask, 1.0, outdeg)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n

    for _ in range(n_iter):
        em_ref = ray.put(r / safe_deg)

        def contrib_vec(batch: pa.Table) -> pa.Table:
            em = ray.get(em_ref)  # fresh per iteration: no worker cache
            vec = np.zeros(len(em))
            s = batch["s"].to_numpy()
            d = batch["d"].to_numpy()
            np.add.at(vec, d, em[s])
            return pa.Table.from_pydict(
                {"vec": pa.array([vec.tobytes()], pa.binary())}
            )

        vecs = enc.map_batches(
            contrib_vec, batch_format="pyarrow", batch_size=None
        ).take_all()
        contrib = np.zeros(n)
        for row in vecs:
            contrib += np.frombuffer(row["vec"], dtype=np.float64)
        dangling = float(r[dangling_mask].sum())
        r = base + damping * (contrib + dangling / n)

    return ray.data.from_pandas(pd.DataFrame({"node": nodes, "rank": r}))


def kg_components(edges_ds, max_iters: int = 25,
                  small_edge_limit: int = 2_000_000):
    """(entity_id, component_id) — weakly-connected components of the KG
    entity graph; ``component_id`` is the lexicographically-minimum
    entity_id in the component.  The KG analogue of dedup's
    ``dup_clusters``: it answers "which entities are transitively linked
    at all", the first cut for subgraph routing / per-component jobs.

    Same size-gated plan as :func:`kg_triangles` / ``dedup.dup_clusters``:
    canonical pairs are a dedup OUTPUT (bounded), so below
    ``small_edge_limit`` union-find runs driver-local on the collected
    pair list; above it, distributed min-label propagation runs — one
    label⋈edge forward reduce plus one per-node min reduce per round,
    labels string-typed (min = lexicographic).  Labels only decrease, so
    the fixpoint detector sums a per-(node,label) 64-bit content hash:
    the sum is unchanged iff no node's label changed (a label can never
    swap-increase, and the hash binds node to label).  Node universe =
    every edge endpoint (entities with no edges are trivial singletons
    and are not emitted — matching the oracle's edge-derived universe).
    """
    from ..functions.grouping import bucketed_group_apply

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["src_id"].astype(str)
        v = df["dst_id"].astype(str)
        out = pd.DataFrame({"u": np.minimum(u, v), "v": np.maximum(u, v)})
        return out.drop_duplicates()  # loops kept: endpoint joins universe

    pairs = bucketed_group_apply(
        edges_ds.map_batches(to_pairs, batch_format="pandas"), ["u", "v"],
        lambda df: df.drop_duplicates(),
    ).materialize()

    def _rename(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(
            columns={"node": "entity_id", "label": "component_id"}
        )
        return out.astype({"entity_id": "string", "component_id": "string"})

    def finish(labels_df: pd.DataFrame):
        import ray

        return ray.data.from_pandas(
            _rename(labels_df.sort_values("node").reset_index(drop=True))
        )

    if pairs.count() <= small_edge_limit:
        ep = pairs.to_pandas()  # bounded by small_edge_limit
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(ep["u"], ep["v"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: root == component minimum == converged label
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        nodes = sorted(set(ep["u"]) | set(ep["v"]))
        return finish(pd.DataFrame(
            {"node": nodes, "label": [find(n) for n in nodes]}
        ))

    # ---- distributed min-label propagation (string labels) ----
    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["u"], df["v"]], ignore_index=True),
                "dst": pd.concat([df["v"], df["u"]], ignore_index=True),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    def init_rows(df: pd.DataFrame) -> pd.DataFrame:
        # round 1 folded into init: label(u) = min(u, neighbors(u))
        return pd.DataFrame(
            {
                "node": pd.concat([df["dst"], df["dst"]], ignore_index=True),
                "label": pd.concat([df["src"], df["dst"]],
                                   ignore_index=True),
            }
        )

    labels = bucketed_group_apply(
        edges.map_batches(init_rows, batch_format="pandas"), "node", take_min
    ).materialize()

    def state_hash(ds) -> int:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            acc = np.int64(0)
            for n, lb in zip(df["node"], df["label"]):
                h = hashlib.blake2b(
                    f"{n}\x00{lb}".encode(), digest_size=8
                ).digest()
                acc = np.int64(
                    (int(acc) + int.from_bytes(h, "big", signed=True))
                    & 0x7FFFFFFFFFFFFFFF
                )
            return pd.DataFrame({"h": pd.Series([acc], dtype="int64")})

        total = 0
        for row in ds.map_batches(
            partial, batch_format="pandas"
        ).iter_rows():
            total = (total + int(row["h"])) & 0x7FFFFFFFFFFFFFFF
        return total

    def tag_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["node"], "dst": "", "label": df["label"]}
        )

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["src"], "dst": df["dst"], "label": ""}
        )

    def forward(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["dst"] == ""][["key", "label"]]
        e = df[df["dst"] != ""][["key", "dst"]]
        own = lab.rename(columns={"key": "dst"})
        fwd = e.merge(lab, on="key")[["dst", "label"]]
        out = pd.concat([own, fwd], ignore_index=True)
        return out.rename(columns={"dst": "node"})

    # grow past max_iters if the fixpoint hash says we have not converged
    # (diameter > max_iters is plausible exactly in the huge-graph regime
    # this path serves); a hard cap turns a silent wrong answer into a
    # loud failure instead of returning unconverged labels
    prev = state_hash(labels)
    hard_cap = max(max_iters * 8, max_iters + 1)
    converged = False
    for it in range(hard_cap):
        lab_rows = labels.map_batches(tag_label, batch_format="pandas")
        edge_rows = edges.map_batches(tag_edge, batch_format="pandas")
        msgs = bucketed_group_apply(lab_rows.union(edge_rows), "key", forward)
        labels = bucketed_group_apply(msgs, "node", take_min).materialize()
        cur = state_hash(labels)
        if cur == prev:  # monotone labels + node-bound hash: equal == fixed
            converged = True
            break
        prev = cur
        if it + 1 == max_iters:
            logger.warning(
                "kg_components: no fixpoint after max_iters=%d rounds; "
                "extending to %d (graph diameter exceeds budget)",
                max_iters, hard_cap,
            )
    if not converged:
        raise RuntimeError(
            f"kg_components: label propagation did not converge within "
            f"{hard_cap} rounds — graph diameter exceeds the iteration "
            f"budget; raise max_iters"
        )

    # converged labels stay distributed: the output is pair-graph-sized
    # (above the gate that can be huge), so only rename per batch
    return labels.map_batches(_rename, batch_format="pandas")


def kg_edges_named(edges_ds, nodes_ds):
    """Edge enrichment: attach src/dst canonical names to every edge — the
    human-readable KG export (and the generic pattern for decorating a
    corpus-scale edge list with a corpus-scale node attribute).

    Two shuffle joins on the entity id — at 100 TB the node table is
    corpus-scale (every distinct canonicalized entity), so a broadcast
    would not survive; each join moves only the projected (id, name)
    pairs plus the edge columns already in flight.  Nodes are unique by
    ``entity_id`` (canonicalization's group key), so both joins are 1:1.
    """
    from ..functions.joins import shuffle_join

    names = nodes_ds.select_columns(["entity_id", "canonical_name"])

    def as_src(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"entity_id": "src_id",
                                  "canonical_name": "src_name"})

    def as_dst(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"entity_id": "dst_id",
                                  "canonical_name": "dst_name"})

    edges = edges_ds.select_columns(
        ["src_id", "dst_id", "predicate", "qualifiers_json", "weight"]
    )
    with_src = shuffle_join(
        edges, names.map_batches(as_src, batch_format="pandas"), on="src_id"
    )
    named = shuffle_join(
        with_src, names.map_batches(as_dst, batch_format="pandas"),
        on="dst_id",
    )
    # final projection as a fused pandas reorder, NOT a standalone Project
    # op: the join reduce emits merge-ordered columns, and mixing those
    # bundles with Project-ordered ones is exactly the benign-but-noisy
    # "RefBundle with a different schema" (column order) divergence
    final_cols = ["src_id", "src_name", "dst_id", "dst_name", "predicate",
                  "qualifiers_json", "weight"]
    return named.map_batches(
        lambda df: df[final_cols], batch_format="pandas"
    )


def kg_pagerank_check(edges_ds, damping: float = 0.85, n_iter: int = 5,
                      tol: float = 1e-9, sum_tol: float = 1e-6):
    """Boolean-verdict accuracy gate for :func:`kg_pagerank` (the one KG
    query whose floats make it rows-only): per node,
    ``|distributed_rank − dense_reference_rank| ≤ tol`` plus a global
    ``|Σ rank − 1| ≤ sum_tol`` verdict, emitted as literal booleans —
    the SQL oracle emits the node universe + literal TRUE, so a
    hash-exact driver match IS the fixed-point check (same pattern as
    the sketch ``*_check`` queries).

    The distributed side runs the SHUFFLE-JOIN plan (``dense_threshold=0``
    — the 100-TB path, one rank⋈edge join + one per-destination reduce per
    iteration); the reference is an independent driver-side dense power
    iteration over the collected distinct adjacency.  Collecting that
    adjacency is bounded by the canonical-entity vocabulary squared (edges
    are the OUTPUT of canonicalization's reduce), not by corpus size —
    the same boundedness argument as the dense-broadcast plan itself.
    """
    from ..functions.grouping import bucketed_group_apply

    distributed = kg_pagerank(
        edges_ds, damping=damping, n_iter=n_iter, dense_threshold=0
    ).to_pandas()

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["src_id"].astype(str), "dst": df["dst_id"].astype(str)}
        ).drop_duplicates()

    adj = bucketed_group_apply(
        edges_ds.map_batches(to_edges, batch_format="pandas"), ["src", "dst"],
        lambda df: df.drop_duplicates(),
    ).to_pandas()

    nodes = sorted(set(adj["src"]) | set(adj["dst"]))
    idx = {node: i for i, node in enumerate(nodes)}
    n = len(nodes)
    src = adj["src"].map(idx).to_numpy()
    dst = adj["dst"].map(idx).to_numpy()
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    safe_deg = np.where(outdeg == 0, 1, outdeg)
    for _ in range(n_iter):
        contrib = np.bincount(dst, weights=r[src] / safe_deg[src],
                              minlength=n)
        dangling = float(r[outdeg == 0].sum())
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)

    got = distributed.set_index("node")["rank"].reindex(nodes)
    within = (got.to_numpy() - r) ** 2 <= tol * tol  # NaN-safe: NaN → False
    sum_ok = bool(abs(float(got.fillna(0.0).sum()) - 1.0) <= sum_tol) and (
        len(distributed) == n
    )
    return pd.DataFrame(
        {"node": nodes, "within_tol": within.astype(bool), "sum_ok": sum_ok}
    )


def _kcore_local(pairs: list[tuple[str, str]]) -> dict[str, int]:
    """Driver-local core-number reference: phase peeling (for ascending k,
    repeatedly delete nodes with current degree < k; a node deleted in
    phase k has core number k−1).  Bounded-graph path + the independent
    reference for the boolean gate."""
    from collections import defaultdict

    adj: dict[str, set] = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    deg = {n: len(s) for n, s in adj.items()}
    core: dict[str, int] = {}
    alive = set(adj)
    k = 1
    while alive:
        while True:
            low = [n for n in alive if deg[n] < k]
            if not low:
                break
            for n in low:
                core[n] = k - 1
                alive.discard(n)
                for m in adj[n]:
                    if m in alive:
                        deg[m] -= 1
        k += 1
    return core


def kg_kcore(edges_ds, small_edge_limit: int = 2_000_000):
    """(entity_id, core) — k-core decomposition of the undirected simple
    KG entity graph (self-loops dropped): ``core`` is the largest k such
    that the node survives in the subgraph where every node has degree
    ≥ k.  The density-stratification analytic next to degrees / triangles
    / pagerank / components: core number separates hub-dense regions from
    peripheral tendrils.

    Same size-gated plan as :func:`kg_components`: below
    ``small_edge_limit`` the collected pair list peels driver-local;
    above it, distributed phase peeling runs — per round ONE bucketed
    degree reduce over the active edge table plus one map-side filter
    against the broadcast just-removed node set.  The driver holds only
    node-bounded state (the alive set and assigned cores — the canonical
    entity vocabulary, not the corpus; the same boundedness argument as
    the dense-pagerank plan), while the edge table itself stays
    distributed throughout.
    """
    import ray

    from ..functions.grouping import bucketed_group_apply

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["src_id"].astype(str)
        v = df["dst_id"].astype(str)
        out = pd.DataFrame({"u": np.minimum(u, v), "v": np.maximum(u, v)})
        out = out[out["u"] != out["v"]]  # simple graph: drop self-loops
        return out.drop_duplicates()

    pairs = bucketed_group_apply(
        edges_ds.map_batches(to_pairs, batch_format="pandas"), ["u", "v"],
        lambda df: df.drop_duplicates(),
    ).materialize()

    def finish(core: dict[str, int]):
        nodes = sorted(core)
        return ray.data.from_pandas(pd.DataFrame(
            {"entity_id": pd.array(nodes, dtype="string"),
             "core": pd.array([core[n] for n in nodes], dtype="int64")}
        ))

    if pairs.count() <= small_edge_limit:
        ep = pairs.to_pandas()
        return finish(_kcore_local(list(zip(ep["u"], ep["v"]))))

    # ---- distributed phase peeling ----
    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["u"], df["v"]], ignore_index=True)}
        ).drop_duplicates()

    alive = set(
        bucketed_group_apply(
            pairs.map_batches(node_rows, batch_format="pandas"), "node",
            lambda df: df.drop_duplicates(),
        ).to_pandas()["node"]
    )  # node-bounded driver state
    core: dict[str, int] = {}
    active = pairs
    k = 1
    while alive:
        # degrees of the active simple graph (node-bounded output)
        def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
            s = pd.concat([df["u"], df["v"]], ignore_index=True)
            out = s.value_counts().rename_axis("node").reset_index(
                name="deg")
            return out

        def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False)["deg"].sum()
            out["deg"] = out["deg"].astype("int64")
            return out

        deg_df = bucketed_group_apply(
            active.map_batches(deg_partial, batch_format="pandas"),
            "node", deg_merge,
        ).to_pandas()
        deg = dict(zip(deg_df["node"], deg_df["deg"]))
        low = {n for n in alive if deg.get(n, 0) < k}
        if not low:
            k += 1
            continue
        for n in low:
            core[n] = k - 1
        alive -= low
        if not alive:
            break
        low_ref = ray.put(frozenset(low))

        def drop_removed(df: pd.DataFrame) -> pd.DataFrame:
            rm = ray.get(low_ref)
            return df[~df["u"].isin(rm) & ~df["v"].isin(rm)]

        active = active.map_batches(
            drop_removed, batch_format="pandas"
        ).materialize()  # one-round-deep lineage, like pagerank's ranks
    return finish(core)


def kg_kcore_check(edges_ds, tol_rows: bool = True):
    """Boolean-verdict gate for :func:`kg_kcore` (same pattern as
    :func:`kg_pagerank_check`): the DISTRIBUTED phase-peeling plan
    (``small_edge_limit=0``) must agree exactly, node for node, with the
    independent driver-local peeling reference — emitted as literal
    booleans whose SQL oracle is the edge-endpoint node universe + TRUE
    (self-loop-only nodes excluded, matching the simple-graph semantics).
    Integer core numbers make the verdict exact (no ε needed)."""
    from ..functions.grouping import bucketed_group_apply

    distributed = kg_kcore(edges_ds, small_edge_limit=0).to_pandas()

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["src_id"].astype(str)
        v = df["dst_id"].astype(str)
        out = pd.DataFrame({"u": np.minimum(u, v), "v": np.maximum(u, v)})
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates()

    ep = bucketed_group_apply(
        edges_ds.map_batches(to_pairs, batch_format="pandas"), ["u", "v"],
        lambda df: df.drop_duplicates(),
    ).to_pandas()
    ref = _kcore_local(list(zip(ep["u"], ep["v"])))
    nodes = sorted(ref)
    got = distributed.set_index("entity_id")["core"].reindex(nodes)
    ok = got.notna() & (got.fillna(-1).astype("int64").to_numpy()
                        == np.array([ref[n] for n in nodes]))
    count_ok = bool(len(distributed) == len(nodes))
    return pd.DataFrame({
        "node": nodes,
        "core_match": ok.to_numpy(),
        "count_ok": count_ok,
    })
