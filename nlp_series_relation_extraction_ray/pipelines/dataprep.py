"""Flagship training-data-prep composition: dedup → quality → langid →
split, end-to-end as ONE streaming pipeline with a SQL-exact oracle.

This is the pipeline a 100 TB pretraining-corpus run would actually
execute before tokenization: drop exact and near duplicates (keep one
representative per duplicate cluster), drop low-quality documents, tag
language, and assign a growth-stable train/val/test split.  Every stage
reuses an already-SQL-verified operator (``dup_clusters`` over the exact
n-gram Jaccard pair graph, the ``quality_stats`` flag rule, the ``langid``
argmax rule, the hash-based ``train_test_split``), so the composition
itself is SQL-expressible and the whole chain is verified value-exact.

Scale shape: the per-doc flags (quality/lang/split) are ONE row-local
``map_batches`` pass over the corpus — no shuffle; the duplicate-cluster
labels come from the bounded-reducer pair kernel + min-label propagation
(see ``stages/dedup.py``); one final doc-keyed bucketed reduce joins the
two sides and applies the keep predicate vectorized.  Nothing corpus-sized
touches the driver, and the output streams (``write_parquet``-able,
partitionable by ``split``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages import textstats as ts
from ..stages.dedup import (
    NGRAM_JACCARD_SQL,
    dup_clusters,
    dup_clusters_sql,
    ngram_jaccard_pairs,
)

_FLAG_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("cluster_id", pa.int64()),
        ("quality_flag", pa.int8()),
        ("lang_pred", pa.string()),
        ("split", pa.string()),
        ("side", pa.string()),
    ]
)


def _doc_flags(batch: pa.Table) -> pa.Table:
    """Row-local quality/lang/split flags — the exact rules of
    ``textstats.quality_stats`` / ``langid`` / ``train_test_split``."""
    stop = set(ts.STOPWORDS)
    markers = {k: set(v) for k, v in ts.LANG_MARKERS.items()}
    priority = ("en", "de", "es", "fr")

    ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
    quality, langs = [], []
    for t in batch["text"].to_pylist():
        words = t.split(" ")
        n_stop = sum(1 for w in words if w in stop)
        quality.append(int(20 <= len(words) <= 500 and n_stop >= 1))
        counts = {
            lang: sum(1 for w in words if w in markers[lang])
            for lang in ("en", "fr", "de", "es")
        }
        best = priority[0]
        for lang in priority[1:]:
            if counts[lang] > counts[best]:
                best = lang
        langs.append(best if counts[best] > 0 else "und")

    bucket = ((ids.astype(np.uint64) * ts._SPLIT_MULT) % ts._SPLIT_MOD) % 100
    split = np.where(bucket < 90, "train", np.where(bucket < 95, "val", "test"))

    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array([-1] * len(ids), pa.int64()),
            "quality_flag": pa.array(quality, pa.int8()),
            "lang_pred": pa.array(langs, pa.string()),
            "split": pa.array(split.tolist(), pa.string()),
            "side": pa.array(["f"] * len(ids), pa.string()),
        }
    )


def clean_corpus(sf_dir: str, clusters_ds=None):
    """(doc_id, lang_pred, split) for documents that survive the full prep
    chain: duplicate-cluster representative (exact dups are Jaccard-100
    pairs, so the cluster keep subsumes exact dedup) AND quality_flag.

    ``clusters_ds`` lets callers reuse an already-materialized
    ``dup_clusters`` result (the driver contract shares one checkpoint
    across dedup queries).
    """
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    if clusters_ds is None:
        clusters_ds = dup_clusters(docs, ngram_jaccard_pairs(docs))

    flags = docs.map_batches(_doc_flags, batch_format="pyarrow")

    def cluster_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _FLAG_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "cluster_id": batch["cluster_id"].cast(pa.int64()),
                "quality_flag": pa.array([0] * n, pa.int8()),
                "lang_pred": pa.array([""] * n, pa.string()),
                "split": pa.array([""] * n, pa.string()),
                "side": pa.array(["c"] * n, pa.string()),
            }
        )

    cl = clusters_ds.map_batches(cluster_rows, batch_format="pyarrow")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["side"] == "f"]
        c = df[df["side"] == "c"][["doc_id", "cluster_id"]]
        m = f.drop(columns=["cluster_id", "side"]).merge(c, on="doc_id")
        m = m[(m["cluster_id"] == m["doc_id"]) & (m["quality_flag"] == 1)]
        out = m[["doc_id", "lang_pred", "split"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    from ..functions.grouping import bucketed_group_apply

    return bucketed_group_apply(flags.union(cl), "doc_id", keep)


def clean_corpus_sql() -> str:
    """DuckDB mirror: the recursive-CTE cluster oracle joined with the
    quality/langid/split rules — value-exact against :func:`clean_corpus`."""
    clusters = dup_clusters_sql(NGRAM_JACCARD_SQL)
    lang = ts.LANGID_SQL
    sp = ts.train_test_split_sql()
    return f"""WITH clusters AS ({clusters}),
lang AS ({lang}),
sp AS ({sp}),
q AS (
  SELECT doc_id,
    (len(string_split(text, ' ')) BETWEEN 20 AND 500
     AND len(list_filter(string_split(text, ' '),
                         x -> x IN ({ts._STOP_SQL}))) >= 1) AS quality_flag
  FROM documents
)
SELECT q.doc_id, lang.lang_pred, sp.split
FROM q
JOIN clusters c ON c.doc_id = q.doc_id
JOIN lang ON lang.doc_id = q.doc_id
JOIN sp ON sp.doc_id = q.doc_id
WHERE c.cluster_id = q.doc_id AND q.quality_flag"""
