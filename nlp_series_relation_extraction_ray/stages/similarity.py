"""Similarity search over the ``embeddings`` table (``list<float>``).

- Brute-force cosine top-k: the baseline — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once), per-batch partial top-k, one
  tiny merge per query.  O(N·Q) but fully streaming in N.
- IVF (inverted-file) top-k: the scale path — deterministic k-means coarse
  centroids, vectors bucketed by nearest centroid (a one-off partition
  pass), queries probe only ``n_probe`` nearest buckets.  Approximate;
  recall vs brute force is pinned by tests.
"""

from __future__ import annotations

from ..sources.readers import table_from_pandas

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()]
    )
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    return vecs, ids


def load_queries(emb_ds, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query set = the vectors with vec_id < n_queries (deterministic)."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        # Arrow-native filter: a pandas round-trip would re-infer the
        # embedding column's type, degrading list<float> to null on empty
        # matches (schema-divergent blocks)
        return batch.filter(pc.less(batch["vec_id"], n_queries))

    df = emb_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    df = df.sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return _normalize(q), df["vec_id"].to_numpy()


def load_queries_parquet(
    parquet_path: str, n_queries: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pruned query load straight off the parquet file: the ``vec_id <
    n_queries`` predicate pushes into the read (row-group statistics skip
    everything else), so picking a handful of query vectors never scans the
    corpus — unlike :func:`load_queries`, which streams the whole Dataset.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        parquet_path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    df = tbl.to_pandas().sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return _normalize(q), df["vec_id"].to_numpy()


def _merge_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final per-query top-k: (similarity desc, vec_id asc) to mirror the
    SQL oracle's ROW_NUMBER ordering; shared by exact and IVF paths."""
    df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
    return pd.DataFrame(
        {
            "query_id": df["query_id"].astype("int64"),
            "neighbor_id": df["neighbor_id"].astype("int64"),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
        }
    )


def _merge_topk_final(partials, k: int):
    """Final per-query top-k over the per-batch partials.

    The partials are already a per-batch combine (≤ #blocks × Q × k rows,
    Q bounded by the broadcast in-memory query matrix), so the merge input
    is intrinsically small: coalescing to ONE block and grouping in pandas
    is strictly cheaper than a sort all-to-all — and avoids the empty sort
    partitions a 5-key ``groupby`` produces, which bypass the UDF and
    surface as schema-less bundles (Ray's ``RefBundle with a different
    schema`` warnings).  For a corpus-scale Q, insert a bucketed per-query
    pre-merge (``bucketed_group_apply`` on ``query_id``) before this."""

    def merge_all(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        outs = [
            _merge_topk(g, k)
            for _, g in df.groupby("query_id", sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    return partials.repartition(1).map_batches(
        merge_all, batch_format="pandas", batch_size=None
    )


def knn_bruteforce(emb_ds, n_queries: int = 5, k: int = 10, queries=None):
    """(query_id, neighbor_id, rank): exact cosine top-k per query vector,
    self-matches excluded; rank ordered by (similarity desc, vec_id asc).
    ``queries``: optional precomputed ``(q_mat, q_ids)`` (e.g. from
    :func:`load_queries_parquet`) so repeated kNN calls share one pruned
    query load instead of each scanning the corpus."""
    import ray

    q_mat, q_ids = queries if queries is not None else load_queries(
        emb_ds, n_queries
    )
    ref = ray.put((q_mat, q_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, qi = ray.get(ref)
        vecs, ids = _batch_matrix(batch)
        vecs = _normalize(vecs)
        sims = qm @ vecs.T  # [Q, B]
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k, sims.shape[1])
        for r in range(sims.shape[0]):
            row = sims[r]
            mask = ids != qi[r]
            cand_idx = np.where(mask)[0]
            order = cand_idx[
                np.lexsort((ids[cand_idx], -row[cand_idx]))
            ][:kk]
            for c in order:
                out["query_id"].append(int(qi[r]))
                out["neighbor_id"].append(int(ids[c]))
                out["sim"].append(float(row[c]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")

    return _merge_topk_final(partials, k)


def knn_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {n_queries}
),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---- IVF ------------------------------------------------------------------


def kmeans_centroids(
    mat: np.ndarray, n_clusters: int, n_iter: int = 8, seed: int = 3
) -> np.ndarray:
    """Deterministic Lloyd k-means on unit vectors (init: seeded sample)."""
    rng = np.random.RandomState(seed)
    n = mat.shape[0]
    n_clusters = min(n_clusters, n)
    centroids = mat[rng.choice(n, size=n_clusters, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IvfIndexStage:
    """Actor-pool stage: assign each vector to its nearest coarse centroid
    (adds a ``bucket`` column — at corpus scale this column is the parquet
    partition key so probes prune at the read)."""

    def __init__(self, centroids_ref):
        import ray

        self.centroids = ray.get(centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs, _ = _batch_matrix(batch)
        vecs = _normalize(vecs)
        assign = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign, pa.int32()))


def _train_centroids(emb_ds, n_clusters: int, train_sample: int) -> np.ndarray:
    sample = emb_ds.limit(train_sample).to_pandas()
    train = _normalize(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    )
    return kmeans_centroids(train, n_clusters)


def _probe_topk_stage(qref, k: int):
    """Shared per-batch partial top-k for the in-memory and partitioned IVF
    paths: per query, only vectors in its probe buckets are candidates."""
    import ray

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, qi, probes = ray.get(qref)
        vecs, ids = _batch_matrix(batch)
        vecs = _normalize(vecs)
        buckets = np.asarray(batch["bucket"].to_pylist())
        sims = qm @ vecs.T
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for r in range(sims.shape[0]):
            mask = (ids != qi[r]) & np.isin(buckets, list(probes[r]))
            cand = np.where(mask)[0]
            order = cand[np.lexsort((ids[cand], -sims[r][cand]))][: k]
            for c in order:
                out["query_id"].append(int(qi[r]))
                out["neighbor_id"].append(int(ids[c]))
                out["sim"].append(float(sims[r][c]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    return partial_topk


def _probe_sets(q_mat: np.ndarray, centroids: np.ndarray, n_probe: int):
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]
    return [set(int(b) for b in row) for row in probe]


def knn_ivf(
    emb_ds,
    n_queries: int = 5,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 8,
    train_sample: int = 2048,
    queries=None,
):
    """Approximate cosine top-k via IVF: probe ``n_probe`` buckets per query."""
    import ray

    centroids = _train_centroids(emb_ds, n_clusters, train_sample)
    cref = ray.put(centroids)

    bucketed = emb_ds.map_batches(
        IvfIndexStage,
        fn_constructor_kwargs={"centroids_ref": cref},
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    )

    q_mat, q_ids = queries if queries is not None else load_queries(
        emb_ds, n_queries
    )
    qref = ray.put((q_mat, q_ids, _probe_sets(q_mat, centroids, n_probe)))
    partials = bucketed.map_batches(
        _probe_topk_stage(qref, k), batch_format="pyarrow"
    )

    return _merge_topk_final(partials, k)


# ---- IVF with the bucket as a PHYSICAL Parquet partition key -------------


def build_ivf_index(
    emb_ds,
    index_dir: str,
    n_clusters: int = 16,
    train_sample: int = 2048,
    files_per_bucket: int = 2,
) -> str:
    """One-off index build: assign buckets and write the embedding table as
    Parquet **partitioned by bucket** (``index_dir/bucket=<b>/``), plus the
    centroid matrix.  At probe time only ``n_probe/n_clusters`` of the data
    files are opened — the read pruning the in-memory variant only
    simulates.  The ``bucket`` column is kept in the data files as well so
    explicit-file reads don't depend on hive-partition inference.

    ``files_per_bucket`` bounds the file count via a pre-write repartition:
    ``write_parquet(partition_cols=...)`` otherwise emits one file per
    (block × bucket) — hundreds of KB-sized files whose open/footer cost
    dominates the probe read.  At corpus scale raise it so each file stays
    in the 256 MB–1 GB range."""
    import os
    import shutil

    import ray

    # a fresh build must not append to a previous run's files: Ray's
    # write_parquet uses unique per-run filenames, so building into a
    # non-empty dir would duplicate every vector (and duplicate top-k rows)
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    centroids = _train_centroids(emb_ds, n_clusters, train_sample)
    bucketed = emb_ds.map_batches(
        IvfIndexStage,
        fn_constructor_kwargs={"centroids_ref": ray.put(centroids)},
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    )
    # partition on a copy of the column: write_parquet drops partition
    # columns from the data files
    bucketed = bucketed.map_batches(
        lambda t: t.append_column("bucket_part", t["bucket"]),
        batch_format="pyarrow",
    ).repartition(files_per_bucket)
    os.makedirs(index_dir, exist_ok=True)
    bucketed.write_parquet(index_dir, partition_cols=["bucket_part"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    return index_dir


def probed_index_files(index_dir: str, buckets: set[int]) -> list[str]:
    """Concrete parquet files of the probed bucket partitions only."""
    import glob
    import os

    files: list[str] = []
    for b in sorted(buckets):
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, f"bucket_part={b}",
                                          "*.parquet")))
        )
    return files


def knn_ivf_partitioned(
    emb_ds,
    index_dir: str,
    n_queries: int = 5,
    k: int = 10,
    n_probe: int = 8,
    queries=None,
):
    """IVF top-k against a physically partitioned index: the read itself
    prunes to the union of the queries' probe buckets (file-level pruning),
    then the shared per-query probe filter applies within batches.  Result
    is identical to :func:`knn_ivf` built with the same centroids."""
    import os

    import ray

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q_mat, q_ids = queries if queries is not None else load_queries(
        emb_ds, n_queries
    )
    probes = _probe_sets(q_mat, centroids, n_probe)
    union: set[int] = set().union(*probes) if probes else set()
    files = probed_index_files(index_dir, union)
    from ..sources.readers import read_parquet_clean

    pruned = read_parquet_clean(
        files, columns=["vec_id", "embedding", "bucket"]
    )
    qref = ray.put((q_mat, q_ids, probes))
    partials = pruned.map_batches(
        _probe_topk_stage(qref, k), batch_format="pyarrow"
    )
    return _merge_topk_final(partials, k)


def kmeans_cluster_stats(emb_ds, n_clusters: int = 16,
                         train_sample: int = 2048):
    """(cluster, n_vecs, sum_sim_milli): embedding-space clustering as a
    first-class operator — a bounded sample trains deterministic Lloyd
    centroids (the only driver-side data, same recipe as the IVF index),
    then every vector streams through a broadcast argmax assignment and
    per-cluster partials (count, total cosine-to-centroid in exact milli
    units) merge in one tiny groupby.  The per-vector assignment is the
    semantic-dedup / corpus-curation primitive (cluster-balanced sampling,
    outlier pruning); the stats table is its bounded summary.  Rows-only
    driver check (k-means is not SQL-expressible); assignments are pinned
    against a driver-local numpy reference in pytest."""
    import ray

    from ..functions.grouping import bucketed_group_apply

    train = uniform_embedding_sample(emb_ds, train_sample)
    cref = ray.put(kmeans_centroids(train, n_clusters))

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.base import worker_cached

        cents = worker_cached(("kmeans_cents", cref.hex()),
                              lambda: ray.get(cref))
        vecs, _ = _batch_matrix(batch)
        vecs = _normalize(vecs)
        sims = vecs @ cents.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(vecs)), assign]
        df = pd.DataFrame(
            {
                "cluster": assign.astype("int64"),
                # fixed-point milli-similarity: order-independent int sums
                "sim_milli": np.floor(best * 1000.0 + 0.5).astype("int64"),
            }
        ).groupby("cluster", as_index=False).agg(
            n_vecs=("sim_milli", "size"), sum_sim_milli=("sim_milli", "sum")
        )
        return table_from_pandas(df, preserve_index=False)

    partials = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("cluster", as_index=False)[
            ["n_vecs", "sum_sim_milli"]
        ].sum()
        return out.astype("int64")

    # dense: #distinct clusters is a small parameter (see semantic dedup)
    return bucketed_group_apply(
        partials, "cluster", merge, dense=True,
        empty_result={"cluster": "int64", "n_vecs": "int64",
                      "sum_sim_milli": "int64"},
    )


def uniform_embedding_sample(emb_ds, n: int) -> np.ndarray:
    """Normalized matrix of a UNIFORM deterministic sample — bottom-n of
    md5(vec_id), like textstats.bottomk_sample — not ``limit()``: the
    first n rows in dataset order are head-of-corpus-biased on
    sorted/clustered input.  Partial bottom-n per batch, one single-block
    final (≤ #batches × n rows move)."""
    import hashlib

    def sample_partial(batch: pa.Table) -> pa.Table:
        # stays Arrow end-to-end: a pandas round-trip would carry the
        # embedding column as an ndarray object dtype whose block schemas
        # Ray cannot hash/unify cleanly through the repartition
        h = np.array(
            [
                hashlib.md5(str(v).encode()).hexdigest()
                for v in batch["vec_id"].to_pylist()
            ]
        )
        order = np.argsort(h, kind="stable")[:n]
        return batch.select(["vec_id", "embedding"]).append_column(
            "h", pa.array(h, pa.string())
        ).take(order)

    def sample_final(batch: pa.Table) -> pa.Table:
        h = np.array(batch["h"].to_pylist())
        order = np.argsort(h, kind="stable")[:n]
        return batch.take(order).drop(["h"])

    sample = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(sample_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(sample_final, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return _normalize(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    )


def semantic_dedup_keep(
    emb_ds,
    n_clusters: int = 16,
    threshold: float = 0.97,
    train_sample: int = 2048,
    max_cell: int = 4096,
):
    """SemDeDup-flavor semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, compare
    vectors only WITHIN a cluster, and drop every vector whose cosine to
    an already-kept lower-id cluster member reaches ``threshold``.
    Output: ``(vec_id, cluster, keep)`` — the apply step filters on keep.

    Scale shape: centroids train on a bounded uniform sample and
    broadcast; assignment is a streaming argmax; the only shuffle is
    ``groupby(cluster)``, after which comparisons are cluster-local.
    ``n_clusters`` scales with the corpus so a cell holds O(corpus/k)
    vectors; a cell that still exceeds ``max_cell`` is deterministically
    sub-split by vec_id hash and only same-sub-cell vectors are compared —
    the same bounded-reducer/recall trade as the LSH ``max_bucket`` cap
    (stages/dedup.py).  Driver check is rows-only (k-means + float cosine
    are not SQL-expressible); planted-duplicate behavior is pinned in
    pytest.
    """
    import ray

    from ..functions.grouping import bucketed_group_apply
    from ..stages.base import worker_cached

    train = uniform_embedding_sample(emb_ds, train_sample)
    cref = ray.put(kmeans_centroids(train, n_clusters))

    def assign(batch: pa.Table) -> pa.Table:
        cents = worker_cached(("semdedup_cents", cref.hex()),
                              lambda: ray.get(cref))
        vecs, ids = _batch_matrix(batch)
        vecs = _normalize(vecs)
        cl = np.argmax(vecs @ cents.T, axis=1).astype(np.int64)
        # ship the vector through the shuffle as plain float32 bytes: a
        # pandas block with an ndarray object column has a schema Ray
        # cannot hash/unify ("Failed to hash the schemas" in the reduce)
        emb_bytes = [v.astype(np.float32).tobytes() for v in vecs]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "emb_f32": pa.array(emb_bytes, pa.binary()),
            }
        )

    assigned = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )

    def dedup_cells(df: pd.DataFrame) -> pd.DataFrame:
        out_ids: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        out_keep: list[np.ndarray] = []
        for cl, g in df.groupby("cluster"):
            g = g.sort_values("vec_id")
            n_sub = max(1, -(-len(g) // max_cell))  # ceil
            sub = (g["vec_id"].to_numpy() % np.int64(n_sub)
                   if n_sub > 1 else np.zeros(len(g), dtype=np.int64))
            for s in range(n_sub):
                cell = g[sub == s]
                if len(cell) == 0:  # empty hash residue class
                    continue
                mat = _normalize(
                    np.stack(
                        [
                            np.frombuffer(b, dtype=np.float32)
                            for b in cell["emb_f32"]
                        ]
                    ).astype(np.float64)
                )
                sims = mat @ mat.T
                keep = np.ones(len(cell), dtype=bool)
                for i in range(1, len(cell)):
                    # kept lower-id members only: greedy keep-first
                    if np.any(sims[i, :i][keep[:i]] >= threshold):
                        keep[i] = False
                out_ids.append(cell["vec_id"].to_numpy())
                out_cl.append(np.full(len(cell), cl, dtype=np.int64))
                out_keep.append(keep)
        if not out_ids:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "cluster": pd.Series([], dtype="int64"),
                 "keep": pd.Series([], dtype="bool")}
            )
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_ids),
                "cluster": np.concatenate(out_cl),
                "keep": np.concatenate(out_keep),
            }
        )

    # dense buckets: cluster cardinality is a small parameter (n_clusters),
    # so without sentinels Ray's sort shuffle makes empty partitions that
    # surface as schema-less bundles
    return bucketed_group_apply(
        assigned, "cluster", dedup_cells, dense=True,
        empty_result={"vec_id": "int64", "cluster": "int64",
                      "keep": "bool"},
    )


def ivf_recall_check(emb_ds, n_queries: int = 5, k: int = 10,
                     n_clusters: int = 8, n_probe: int = 6,
                     min_recall_pct: int = 80):
    """Boolean-verdict accuracy gate for IVF search: per query, the
    IVF top-k must recover at least ``min_recall_pct``% of the exact
    brute-force top-k (the standard ANN recall@k bound).  Emits
    ``(query_id, recall_ok)``; the oracle lists the query ids with
    literal TRUE, so a hash-exact match verifies the bound per query.
    Both sides of the comparison are existing operators; the driver-side
    join is #queries × k rows."""
    bf = knn_bruteforce(emb_ds, n_queries=n_queries, k=k).to_pandas()
    ivf = knn_ivf(emb_ds, n_queries=n_queries, k=k,
                  n_clusters=n_clusters, n_probe=n_probe).to_pandas()
    rows = []
    for q in sorted(bf["query_id"].unique()):
        gt = set(bf.loc[bf["query_id"] == q, "neighbor_id"])
        got = set(ivf.loc[ivf["query_id"] == q, "neighbor_id"])
        rows.append(
            (int(q), 100 * len(gt & got) >= min_recall_pct * len(gt))
        )
    return pd.DataFrame(
        {
            "query_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "recall_ok": pd.Series([r[1] for r in rows], dtype="bool"),
        }
    )


def ivf_recall_check_sql(n_queries: int = 5) -> str:
    return f"""
SELECT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < {n_queries}
"""


IVF_RECALL_CHECK_SQL = ivf_recall_check_sql()


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    h = rng.randn(n_planes, dim)
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def _sign_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack sign-of-projection bits into one int per vector."""
    bits = (mat @ planes.T) > 0  # [N, P]
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def knn_lsh(emb_ds, n_queries: int = 5, k: int = 10, n_planes: int = 6,
            n_tables: int = 12, queries=None):
    """(query_id, neighbor_id, rank): random-hyperplane (sign) LSH ANN —
    the second index family next to IVF (Charikar 2002 SimHash for
    angles), in its classical MULTI-TABLE form: ``n_tables`` independent
    ``n_planes``-bit sign codes per vector; a vector is a candidate for a
    query iff they share a bucket in ANY table (P[match/table] =
    (1 − θ/π)^planes, so tables drive recall and planes drive
    selectivity).  Candidates are exact-cosine reranked per batch.

    Scale shape mirrors :func:`knn_bruteforce`: hyperplane tables +
    query codes broadcast once, per-batch candidate mask (L small
    matmuls) + partial top-k, one tiny per-query merge.  At corpus scale
    each table's code is a parquet partition key exactly like the IVF
    bucket (bucket-matched reads replace the scan).

    REGIME (measured on this corpus, documented honestly): sign-LSH
    separates candidates by angle, so it needs the true neighbors to be
    angularly CLOSE (cos ≳ 0.7 — near-dup / planted-cluster regimes,
    where the planted-cluster pytest pins recall ≥ 0.8).  This corpus's
    true top-10 sit at cos ≈ 0.3 vs background 0 (per-plane collision
    0.597 vs 0.5), where no (planes, tables) choice beats scanning —
    IVF (centroid proximity) or brute force are the right paths there,
    which is why the driver query is rows-only while IVF carries the
    oracle-checked recall gate.
    """
    import ray

    q_mat, q_ids = queries if queries is not None else load_queries(
        emb_ds, n_queries
    )
    tables = [
        _hyperplanes(q_mat.shape[1], n_planes, seed=11 + t)
        for t in range(n_tables)
    ]
    q_codes = np.stack(
        [_sign_codes(q_mat, pl) for pl in tables], axis=1
    )  # [Q, T]
    ref = ray.put((q_mat, q_ids, tables, q_codes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, qi, tbls, qc = ray.get(ref)
        vecs, ids = _batch_matrix(batch)
        vecs = _normalize(vecs)
        codes = np.stack(
            [_sign_codes(vecs, pl) for pl in tbls], axis=1
        )  # [B, T]
        sims = qm @ vecs.T
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k, sims.shape[1])
        for r in range(sims.shape[0]):
            mask = (codes == qc[r][None, :]).any(axis=1) & (ids != qi[r])
            cand_idx = np.where(mask)[0]
            row = sims[r]
            order = cand_idx[
                np.lexsort((ids[cand_idx], -row[cand_idx]))
            ][:kk]
            for c in order:
                out["query_id"].append(int(qi[r]))
                out["neighbor_id"].append(int(ids[c]))
                out["sim"].append(float(row[c]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk_final(partials, k)



