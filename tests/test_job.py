"""Resumable sharded KG job: manifests, counters, resume, CLI."""

import json
import os

import pyarrow.parquet as pq
import pytest

from opennre_ray.pipelines.job import run_kg_job
from opennre_ray.sources.pages import shard_documents


@pytest.fixture(scope="module")
def shards(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("shards"))
    shard_documents(sf_dir, out, n_shards=4)
    import glob
    return sorted(glob.glob(os.path.join(out, "*.parquet")))


def test_job_writes_manifests_with_counters(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg")
    res = run_kg_job(shards[:2], out)
    assert len(res["completed"]) == 2 and not res["skipped"]
    for name in res["completed"]:
        mpath = os.path.join(out, f"shard={name}", "manifest.json")
        m = json.load(open(mpath))
        assert m["model_hash"]
        assert m["extractor_version"] == "1"
        assert m["counters"]["pages.rows_in"] > 0
        assert m["counters"]["score.rows_out"] >= m["counters"]["filter.rows_out"]
        assert m["completed_at"]
        # triples parquet (if the shard yielded any) is subj-sorted
        files = [f for f in os.listdir(os.path.dirname(mpath))
                 if f.endswith(".parquet")]
        assert m["num_rows"] == 0 or files
        if files:
            import pyarrow as pa
            t = pa.concat_tables([
                pq.read_table(os.path.join(os.path.dirname(mpath), f))
                for f in sorted(files)])
            assert t.num_rows == m["num_rows"]
            subj = t.column("subj").to_pylist()
            assert subj == sorted(subj)


def test_job_resume_skips_completed(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg2")
    r1 = run_kg_job(shards[:1], out)
    assert len(r1["completed"]) == 1
    r2 = run_kg_job(shards[:2], out)
    assert r2["skipped"] == r1["completed"]
    assert len(r2["completed"]) == 1


def test_counters_are_per_shard(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg3")
    run_kg_job(shards[:2], out)
    names = sorted(os.listdir(out))
    counts = [json.load(open(os.path.join(out, n, "manifest.json")))
              ["counters"]["pages.rows_in"] for n in names]
    # each shard counts only its own pages (snapshot resets between shards)
    total = sum(counts)
    n_docs = sum(pq.ParquetFile(s).metadata.num_rows for s in shards[:2])
    assert total == n_docs
