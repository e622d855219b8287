"""Resumable sharded KG job: manifests, counters, resume, global compaction."""

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


def _cand_dir(out, name):
    return os.path.join(out, "candidates", f"shard={name}")


def test_job_writes_manifests_with_counters(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg")
    res = run_kg_job(shards[:2], out)
    assert len(res["completed"]) == 2 and not res["skipped"]
    for name in res["completed"]:
        mpath = os.path.join(_cand_dir(out, name), "manifest.json")
        m = json.load(open(mpath))
        assert m["model_hash"]
        assert m["extractor_version"] == "1"
        assert m["counters"]["pages.rows_in"] > 0
        assert m["counters"]["score.rows_out"] >= m["counters"]["filter.rows_out"]
        assert m["completed_at"]
    # global triples output exists, subj-sorted, with a graph manifest
    tdir = res["triples_dir"]
    files = [f for f in os.listdir(tdir) if f.endswith(".parquet")]
    gm = json.load(open(os.path.join(tdir, "_manifest.json")))
    assert gm["num_files"] == len(files)
    if files:
        import pyarrow as pa
        t = pa.concat_tables([pq.read_table(os.path.join(tdir, f))
                              for f in sorted(files)])
        subj = t.column("subj").to_pylist()
        assert subj == sorted(subj)


def test_job_resume_skips_completed(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg2")
    r1 = run_kg_job(shards[:1], out, compact=False)
    assert len(r1["completed"]) == 1
    r2 = run_kg_job(shards[:2], out)
    assert r2["skipped"] == r1["completed"]
    assert len(r2["completed"]) == 1


def test_counters_are_per_shard(ray_session, shards, tmp_path):
    out = str(tmp_path / "kg3")
    run_kg_job(shards[:2], out, compact=False)
    cdir = os.path.join(out, "candidates")
    names = sorted(os.listdir(cdir))
    counts = [json.load(open(os.path.join(cdir, n, "manifest.json")))
              ["counters"]["pages.rows_in"] for n in names]
    # each shard counts only its own pages (snapshot resets between shards)
    total = sum(counts)
    n_docs = sum(pq.ParquetFile(s).metadata.num_rows for s in shards[:2])
    assert total == n_docs


def test_sharded_job_matches_unsharded_pipeline(ray_session, shards,
                                               sf_dir, tmp_path):
    """Cross-shard consistency: splitting the corpus into shards must give
    the SAME canonical triples as extract_triples on the whole corpus —
    the canonical map is global and dedup spans shards."""
    import pandas as pd

    from opennre_ray.pipelines.kg import extract_triples

    out = str(tmp_path / "kg4")
    res = run_kg_job(shards, out)   # all 4 shards
    tdir = res["triples_dir"]
    files = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))
    got = pd.concat([pq.read_table(os.path.join(tdir, f)).to_pandas()
                     for f in files]) if files else pd.DataFrame()

    want = extract_triples(
        sf_dir, docs_path=os.path.dirname(shards[0])).to_pandas()

    key = ["subj", "pred", "obj"]
    got_s = got.sort_values(key).reset_index(drop=True) if len(got) else got
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    pd.testing.assert_frame_equal(
        got_s[key + ["n_evidence", "score"]].reset_index(drop=True),
        want_s[key + ["n_evidence", "score"]].reset_index(drop=True),
        check_dtype=False, atol=1e-6)


def test_curation_job_resume_and_parity(ray_session, shards, tmp_path):
    """Curation job: phase-1 manifests + resume semantics, and the
    sharded output equals the in-process docs_curation_pipeline on the
    same corpus (sampling, segment frequencies and chunking are global,
    so sharding must not change a single chunk)."""
    import pandas as pd

    from opennre_ray.pipelines.job import run_curation_job

    out = str(tmp_path / "cur")
    r1 = run_curation_job(shards[:2], out, compact=False)
    assert len(r1["completed"]) == 2 and not r1["skipped"]
    m = json.load(open(os.path.join(
        out, "filtered", f"shard={r1['completed'][0]}", "manifest.json")))
    assert m["extractor_version"] == "curation-v1"
    assert m["counters"]["gopher.rows_in"] >= m["counters"]["gopher.rows_out"]

    r2 = run_curation_job(shards, out)          # resumes, then finalizes
    assert sorted(r2["skipped"]) == sorted(r1["completed"])
    cdir = r2["chunks_dir"]
    files = sorted(os.path.join(cdir, f) for f in os.listdir(cdir)
                   if f.endswith(".parquet"))
    got = (pd.concat([pq.read_table(f).to_pandas() for f in files])
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))

    # parity against the in-process pipeline over the SAME shard corpus
    import ray.data as rd

    from opennre_ray.functions.dedup import paragraph_dedup
    from opennre_ray.functions.packing import chunk_windows, temperature_sample
    from opennre_ray.functions.textstats import gopher_signals
    import pyarrow as pa

    ds = rd.read_parquet(shards)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array([bool(gopher_signals(t)[5])
                         for t in batch.column("text").to_pylist()])
        return batch.filter(mask)

    chain = chunk_windows(
        paragraph_dedup(
            temperature_sample(
                ds.select_columns(["doc_id", "lang", "text"])
                .map_batches(keep, batch_format="pyarrow"),
                "lang", "doc_id", alpha=0.3),
            w=10),
        size=32, stride=24, text_col="clean_text")
    want = (chain.to_pandas()
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_chaos_midwrite_crash_then_resume(ray_session, shards, tmp_path,
                                          monkeypatch):
    """Kill a shard task mid-write, restart, and prove exactly-once
    semantics: the crashed shard leaves no manifest (its partial _tmp
    output is invisible to resume and to compaction), the restart
    re-runs ONLY that shard, and the final triples + per-shard manifest
    counters are identical to a never-crashed run — no double counts."""
    import pandas as pd

    import opennre_ray.pipelines.job as job_mod

    # --- clean reference run -----------------------------------------
    clean = str(tmp_path / "clean")
    run_kg_job(shards[:2], clean)

    def read_triples(out):
        tdir = os.path.join(out, "triples")
        files = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))
        return (pd.concat([pq.read_table(os.path.join(tdir, f)).to_pandas()
                           for f in files])
                .sort_values(["subj", "pred", "obj"])
                .reset_index(drop=True)) if files else pd.DataFrame()

    def read_counters(out):
        cdir = os.path.join(out, "candidates")
        return {n: json.load(open(os.path.join(cdir, n, "manifest.json")))
                ["counters"] for n in sorted(os.listdir(cdir))
                if n.startswith("shard=")}

    # --- crashed run: poison the SECOND shard while the sentinel exists
    out = str(tmp_path / "chaos")
    sentinel = str(tmp_path / "crash-now")
    open(sentinel, "w").close()
    target = shards[1]
    orig = job_mod.shard_candidates

    def poisoned(shard_file, **kw):
        ds = orig(shard_file, **kw)
        if shard_file == target:
            def boom(b):
                if os.path.exists(sentinel):
                    raise RuntimeError("injected mid-write crash")
                return b
            ds = ds.map_batches(boom, batch_format="pyarrow")
        return ds

    monkeypatch.setattr(job_mod, "shard_candidates", poisoned)
    with pytest.raises(Exception, match="injected mid-write crash"):
        run_kg_job(shards[:2], out)

    name0 = os.path.splitext(os.path.basename(shards[0]))[0]
    name1 = os.path.splitext(os.path.basename(target))[0]
    cdir = os.path.join(out, "candidates")
    assert os.path.exists(os.path.join(cdir, f"shard={name0}",
                                       "manifest.json"))
    assert not os.path.exists(os.path.join(cdir, f"shard={name1}"))

    # --- restart (crash condition cleared): only the dead shard re-runs
    os.remove(sentinel)
    res = run_kg_job(shards[:2], out)
    assert res["skipped"] == [name0]
    assert res["completed"] == [name1]

    pd.testing.assert_frame_equal(read_triples(out), read_triples(clean))
    assert read_counters(out) == read_counters(clean)
