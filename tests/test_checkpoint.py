"""Resumable per-partition checkpointing: kill/rerun yields identical output
and skips completed partitions (north_rule resumability)."""

import json
import os
import shutil

import pytest

from nlp_series_relation_extraction_ray.state.checkpoint import (
    manifest_path,
    partition_ranges,
    read_all_partitions,
    run_partitioned_extraction,
)


def test_partition_ranges():
    assert partition_ranges(10, 3) == [(0, 4), (4, 8), (8, 10)]
    assert partition_ranges(2, 8) == [(0, 1), (1, 2)]
    assert partition_ranges(0, 4) == [(0, 0)]


def _triples_sorted(out_dir):
    df = read_all_partitions(out_dir).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_run_skip_resume(ray_session, tmp_path):
    out = str(tmp_path / "ckpt")
    s1 = run_partitioned_extraction(48, out, head="baseline", n_partitions=4)
    assert s1["ran"] == 4 and s1["skipped"] == 0
    ref = _triples_sorted(out)
    assert len(ref) > 0

    # manifests carry lineage + metrics
    with open(manifest_path(out, 0)) as f:
        m = json.load(f)
    assert m["status"] == "complete"
    assert m["lineage"]["conv_lo"] == 0
    assert m["metrics"]["rows_out"] > 0

    # full rerun: everything skipped, output unchanged
    s2 = run_partitioned_extraction(48, out, head="baseline", n_partitions=4)
    assert s2["ran"] == 0 and s2["skipped"] == 4
    assert _triples_sorted(out).equals(ref)

    # simulate a kill: destroy one completed partition mid-corpus
    shutil.rmtree(os.path.join(out, "part-0002"))
    s3 = run_partitioned_extraction(48, out, head="baseline", n_partitions=4)
    assert s3["ran"] == 1 and s3["skipped"] == 3
    assert _triples_sorted(out).equals(ref)

    # changed lineage (different head) invalidates fingerprints -> recompute
    s4 = run_partitioned_extraction(48, out, head="mpn", n_partitions=4)
    assert s4["ran"] == 4


def test_repartition_rerun_removes_stale_parts(ray_session, tmp_path):
    """Rerunning with fewer partitions must not leave stale overlapping
    partition dirs that would duplicate data on read."""
    out = str(tmp_path / "ck2")
    run_partitioned_extraction(48, out, head="baseline", n_partitions=8)
    ref = _triples_sorted(out)
    s = run_partitioned_extraction(48, out, head="baseline", n_partitions=4)
    assert s["ran"] == 4
    after = _triples_sorted(out)
    assert after.equals(ref)  # same data, no duplicates


def test_kg_job_entrypoint(ray_session, tmp_path):
    """The ray-job-submit entrypoint runs resumably against parquet shards."""
    import ray

    sys_path_hack = None  # noqa: F841
    from jobs.kg_job import main

    from nlp_series_relation_extraction_ray.sources.transcripts import (
        transcripts_dataset,
    )

    src = str(tmp_path / "transcripts")
    transcripts_dataset(60).write_parquet(src)
    out = str(tmp_path / "job_out")
    s1 = main(["--input", src, "--output", out, "--partitions", "3"])
    assert s1["ran"] >= 1 and s1["skipped"] == 0
    rows1 = read_all_partitions(out).count()
    assert rows1 > 0
    # resubmit: everything skipped
    s2 = main(["--input", src, "--output", out, "--partitions", "3"])
    assert s2["ran"] == 0 and s2["skipped"] == s1["ran"]
    assert read_all_partitions(out).count() == rows1


def test_read_all_partitions_skips_incomplete(ray_session, tmp_path):
    """A partition with parquet but no (or a partial) manifest — a run
    killed mid write_parquet — must NOT leak into downstream reads."""
    import os

    import pandas as pd

    out = str(tmp_path / "ck3")
    run_partitioned_extraction(24, out, head="baseline", n_partitions=2)
    complete_rows = read_all_partitions(out).count()
    assert complete_rows > 0

    # simulate a killed run: data written, manifest missing
    orphan = os.path.join(out, "part-0099", "data")
    os.makedirs(orphan)
    pd.DataFrame({"conv_id": ["x"], "turn_idx": [0]}).to_parquet(
        os.path.join(orphan, "leak.parquet")
    )
    assert read_all_partitions(out).count() == complete_rows

    # and with a corrupt manifest
    with open(os.path.join(out, "part-0099", "MANIFEST.json"), "w") as f:
        f.write("{not json")
    assert read_all_partitions(out).count() == complete_rows


def test_flagship_kg_kill_rerun_skips_and_identical(ray_session, tmp_path,
                                                    monkeypatch):
    """Kill the flagship resumable KG job mid-extraction, rerun, and check
    (a) completed partitions are skipped, (b) nodes/edges are
    content-identical to an uninterrupted run."""
    import pandas as pd

    from nlp_series_relation_extraction_ray.pipelines import extract as ex
    from nlp_series_relation_extraction_ray.pipelines.kg import (
        build_kg_resumable,
    )

    def _sorted(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    # uninterrupted reference run
    ref_out = str(tmp_path / "kg_ref")
    ref = build_kg_resumable(48, ref_out, head="baseline", n_partitions=4)
    ref_nodes, ref_edges = _sorted(ref["nodes"]), _sorted(ref["edges"])
    assert len(ref_nodes) > 0 and len(ref_edges) > 0

    # killed run: the 3rd extraction partition dies mid-flight
    out = str(tmp_path / "kg_resume")
    real_extract = ex.extract_triples
    calls = {"n": 0}

    def dying_extract(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated mid-run kill")
        return real_extract(*a, **kw)

    monkeypatch.setattr(ex, "extract_triples", dying_extract)
    with pytest.raises(RuntimeError, match="simulated mid-run kill"):
        build_kg_resumable(48, out, head="baseline", n_partitions=4)
    monkeypatch.setattr(ex, "extract_triples", real_extract)

    # rerun: the 2 completed partitions are skipped, the rest run, and the
    # final graph matches the uninterrupted reference exactly
    res = build_kg_resumable(48, out, head="baseline", n_partitions=4)
    s = res["summary"]["extract"]
    assert s["skipped"] == 2 and s["ran"] == 2
    assert s["skipped"] >= 1  # the north-rule resumability claim
    pd.testing.assert_frame_equal(_sorted(res["nodes"]), ref_nodes)
    pd.testing.assert_frame_equal(_sorted(res["edges"]), ref_edges)

    # a second rerun skips EVERY stage (extract + nodes + edges)
    res2 = build_kg_resumable(48, out, head="baseline", n_partitions=4)
    assert res2["summary"]["extract"]["ran"] == 0
    assert res2["summary"]["nodes"]["ran"] == 0
    assert res2["summary"]["edges"]["ran"] == 0

    # changed upstream lineage (different head) invalidates the chained
    # nodes/edges fingerprints -> downstream recomputes
    res3 = build_kg_resumable(48, out, head="mpn", n_partitions=4)
    assert res3["summary"]["extract"]["ran"] == 4
    assert res3["summary"]["nodes"]["ran"] == 1
    assert res3["summary"]["edges"]["ran"] == 1
