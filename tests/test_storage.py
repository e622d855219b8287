"""Bucketed-storage layout: co-partitioned writes, shuffle-free joins,
small-file compaction."""

import glob
import os

import pandas as pd
import pytest
import ray.data as rd

from opennre_ray.functions.storage import (bucketed_join, compact_shards,
                                           write_bucketed)


def _norm(df, by):
    return (df.sort_values(by).reset_index(drop=True)
            .reindex(sorted(df.columns), axis=1))


def test_bucketed_join_matches_pandas_merge(ray_session, tmp_path):
    """Co-bucketed layouts join map-side to exactly the pandas merge,
    including a dtype-mismatched key pair (int64 left, float64 right) —
    the canonical hash keeps equal keys co-partitioned."""
    left = pd.DataFrame({"k": pd.array(range(40), dtype="int64"),
                         "a": [f"L{i}" for i in range(40)]})
    right = pd.DataFrame({"kk": pd.array([float(i) for i in range(0, 80, 2)],
                                         dtype="float64"),
                          "b": [f"R{i}" for i in range(0, 80, 2)]})
    rl = str(tmp_path / "left")
    rr = str(tmp_path / "right")
    write_bucketed(rd.from_pandas(left).repartition(4), "k", rl,
                   n_buckets=8)
    write_bucketed(rd.from_pandas(right).repartition(3), "kk", rr,
                   n_buckets=8)

    got = bucketed_join(rl, rr, "k", "kk", ["a"], ["b"],
                        n_buckets=8).to_pandas()
    exp = left.merge(right, left_on="k", right_on="kk")[["k", "a", "b"]]
    pd.testing.assert_frame_equal(
        _norm(got[["k", "a", "b"]], ["k"]), _norm(exp, ["k"]))


def test_bucketed_join_left_and_empty_buckets(ray_session, tmp_path):
    """Left join carries unmatched rows; buckets unpopulated at small
    scale read as empty frames rather than erroring."""
    left = pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]})
    right = pd.DataFrame({"k": [2], "b": ["hit"]})
    rl, rr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(left), "k", rl, n_buckets=16)
    write_bucketed(rd.from_pandas(right), "k", rr, n_buckets=16)
    got = bucketed_join(rl, rr, "k", "k", ["a"], ["b"], n_buckets=16,
                        how="left").to_pandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3]
    assert got["b"].fillna("-").tolist() == ["-", "hit", "-"]


def test_compact_shards_preserves_rows(ray_session, tmp_path):
    """Compaction re-chunks many small shards into few files with the
    same rows."""
    src = str(tmp_path / "shards")
    out = str(tmp_path / "compacted")
    df = pd.DataFrame({"v": range(1000)})
    rd.from_pandas(df).repartition(20).write_parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) >= 10

    n = compact_shards(src, out, target_rows=500)
    assert n == 1000
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) <= 4
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["v"].tolist()) == list(range(1000))


def test_range_partitioned_boundaries_reuse(ray_session, tmp_path):
    """Explicit boundaries reproduce a layout exactly; defaults are the
    one-pass exact quantiles (consistent with exact_int_quantile)."""
    from opennre_ray.functions.sketches import (exact_int_quantile,
                                                exact_int_quantiles)
    from opennre_ray.functions.storage import write_range_partitioned

    df = pd.DataFrame({"v": list(range(100)) * 3})
    ds = rd.from_pandas(df).repartition(5)
    bs = exact_int_quantiles(ds, "v", 4)
    assert bs == [exact_int_quantile(ds, "v", i, 4) for i in (1, 2, 3)]

    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    got = write_range_partitioned(ds, "v", r1, n_parts=4)
    assert got == bs
    write_range_partitioned(ds, "v", r2, n_parts=4, boundaries=bs)
    a = rd.read_parquet(r1).to_pandas()
    b = rd.read_parquet(r2).to_pandas()
    key = lambda d: sorted(zip(d["v"], d["part"].astype(int)))
    assert key(a) == key(b)
    # every row with v below the first boundary is in part 0
    assert (a.loc[a["v"] < bs[0], "part"].astype(int) == 0).all()


def test_table_diff_identity_and_statuses(ray_session):
    """diff(X, X) is all-unchanged; a constructed delta yields each
    status exactly once."""
    from opennre_ray.functions.relational import table_diff

    old = pd.DataFrame({"k": [1, 2, 3], "c": ["a", "b", "c"]})
    same = table_diff(rd.from_pandas(old), rd.from_pandas(old), "k", "c",
                      n_buckets=4).to_pandas()
    assert set(same["status"]) == {"unchanged"} and len(same) == 3

    new = pd.DataFrame({"k": [2, 3, 4], "c": ["b", "CHANGED", "d"]})
    got = (table_diff(rd.from_pandas(old), rd.from_pandas(new), "k", "c",
                      n_buckets=4).to_pandas()
           .set_index("k")["status"].to_dict())
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_debounce_window_semantics(ray_session):
    """LAG-formulation debounce: a burst thins to rows whose gap to the
    PREVIOUS row exceeds the window; first row always kept."""
    import numpy as np

    from opennre_ray.functions.streaming import debounce

    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [{"k": "u", "eid": i,
             "ts": base + np.timedelta64(off, "s")}
            for i, off in enumerate([0, 30, 100, 130, 250])]
    got = debounce(rd.from_items(rows), ["k"], "ts", 60,
                   tiebreak="eid").to_pandas()
    # gaps: 30 (drop), 70 (keep), 30 (drop), 120 (keep)
    assert sorted(got["eid"]) == [0, 2, 4]


def test_jsonl_round_trip(ray_session, tmp_path):
    """export_jsonl -> read_jsonl preserves rows and values."""
    from opennre_ray.functions.storage import export_jsonl, read_jsonl

    df = pd.DataFrame({"k": range(50), "s": [f"t{i}" for i in range(50)]})
    root = str(tmp_path / "jl")
    export_jsonl(rd.from_pandas(df).repartition(4), root)
    back = (read_jsonl(root).to_pandas()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[["k", "s"]], df)
