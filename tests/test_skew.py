"""Skew-handling tests: hot keys must not concentrate work or break results.

North-star: "entity canonicalization runs as a groupby-aggregate shuffle on
normalized surface-form keys with explicit hash partitioning and salted keys
for head-entity skew".
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opennre_ray.functions.relational import hash_bucket_aggregate
from opennre_ray.pipelines.bag import BagScorer
from opennre_ray.stages.canonicalize import PartialSurfaceCounts, build_canonical_map


def test_partial_counts_absorb_hot_surface():
    """A surface mentioned N times in a batch emits ONE partial row —
    map-side combining is the salt (SURVEY §7.3, canonicalize.py phase 1)."""
    n = 10_000
    batch = pa.table({
        "h_name": ["France"] * n,
        "h_id": ["Q142"] * n,
        "t_name": [f"city{i}" for i in range(n)],
        "t_id": [f"Q{i}" for i in range(n)],
    })
    out = PartialSurfaceCounts()(batch)
    df = out.to_pandas()
    hot = df[df.norm_surface == "france"]
    assert len(hot) == 1
    assert hot.iloc[0]["cnt"] == n


def test_canonical_map_under_skew(ray_session):
    import ray.data as rd

    rows = ([{"h_name": "France", "h_id": "Q142", "t_name": "Paris",
              "t_id": "QP"}] * 500
            + [{"h_name": "france", "h_id": "QBAD", "t_name": "Lyon",
                "t_id": "QL"}] * 3)
    canon = build_canonical_map(rd.from_items(rows, override_num_blocks=8))
    assert canon["france"] == "Q142"          # majority id wins


def test_hash_bucket_aggregate_hot_key_exact(ray_session):
    """One key holding 90% of rows still aggregates exactly (single bucket
    reduction is one vectorized op, not per-row Python)."""
    import ray.data as rd

    rows = [{"k": "hot", "v": 1.0}] * 9000 + \
           [{"k": f"cold{i}", "v": 2.0} for i in range(1000)]
    ds = rd.from_items(rows, override_num_blocks=16)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(n=("v", "size"),
                                                  s=("v", "sum"))

    out = hash_bucket_aggregate(ds, ["k"], per_bucket, n_buckets=8).to_pandas()
    assert len(out) == 1001
    hot = out[out.k == "hot"].iloc[0]
    assert hot["n"] == 9000 and hot["s"] == 9000.0


def test_adaptive_buckets_bound_per_bucket_rows():
    """n_buckets scales with the input row hint so per-bucket size stays
    ~TARGET_ROWS_PER_BUCKET at any input scale (a fixed 64 would put
    rows/64 of a 10× input in one worker's heap)."""
    from opennre_ray.functions.relational import (
        TARGET_ROWS_PER_BUCKET,
        compute_n_buckets,
    )

    assert compute_n_buckets(None) == 64
    for rows in (1, 10_000, 1_000_000, 10_000_000, 1_000_000_000):
        n = compute_n_buckets(rows)
        assert 16 <= n <= 4096
        if 16 < n < 4096:
            # interior regime: the per-bucket expectation is bounded
            assert rows / n <= TARGET_ROWS_PER_BUCKET
    # 10× the input → ~10× the buckets (same expected per-bucket rows)
    assert compute_n_buckets(10_000_000) >= 9 * compute_n_buckets(1_000_000)


def test_shuffle_join_matches_pandas_merge(ray_session):
    """Bucketed large-large join == pandas merge (inner / semi / anti)."""
    import ray.data as rd

    from opennre_ray.functions.relational import shuffle_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": [f"k{i % 40}" for i in range(300)],
                         "lv": rng.integers(0, 9, 300).astype(str)})
    right = pd.DataFrame({"rk": [f"k{i}" for i in range(0, 60, 2)],
                          "rv": [f"v{i}" for i in range(0, 60, 2)]})
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(3)

    got = shuffle_join(lds, rds, "k", "rk", ["lv"], ["rv"],
                       n_buckets=16).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True), check_dtype=False)

    anti = shuffle_join(lds, rds, "k", "rk", ["lv"], [],
                        how="left_anti", n_buckets=16).to_pandas()
    want_anti = left[~left["k"].isin(right["rk"])]
    assert len(anti) == len(want_anti)
    assert set(anti["k"]) == set(want_anti["k"])

    semi = shuffle_join(lds, rds, "k", "rk", ["lv"], [],
                        how="left_semi", n_buckets=16).to_pandas()
    assert len(semi) == len(left) - len(want_anti)


def test_anti_join_size_gate(ray_session):
    """Both anti-join strategies agree; the shuffle path engages when the
    distinct key set exceeds the broadcast limit."""
    import ray.data as rd

    from opennre_ray.functions.relational import anti_join

    left = pd.DataFrame({"k": [f"u{i % 500}" for i in range(2000)],
                         "x": ["p"] * 2000})
    right = pd.DataFrame({"k": [f"u{i}" for i in range(0, 500, 3)]})
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    want = sorted(set(left["k"]) - set(right["k"]))

    bcast = anti_join(lds, rds, "k", ["x"]).to_pandas()
    shuf = anti_join(lds, rds, "k", ["x"], broadcast_limit=10).to_pandas()
    assert sorted(bcast["k"].unique()) == want
    assert sorted(shuf["k"].unique()) == want
    assert list(bcast.columns) == ["k", "x"] == list(shuf.columns)
    assert len(bcast) == len(shuf)


def test_giant_bag_bounded_by_resample():
    """Bag-size skew: a 5000-instance bag is capped to bag_size encoder
    work (G4 semantics), deterministically."""
    scorer = BagScorer("nyt10_pcnn_att", bag_size=8)
    g = pd.DataFrame([{
        "text": f"data stream window batch row {i}", "h_id": "H", "t_id": "T",
        "h_start": 0, "h_end": 4, "t_start": 5, "t_end": 11,
    } for i in range(5000)])
    out1 = scorer(g.copy())
    out2 = scorer(g.copy())
    pd.testing.assert_frame_equal(out1, out2)
    assert (out1["bag_size"] == 8).all()


def test_asof_join_hot_key_exact(ray_session):
    """One key owning 90% of both sides still resolves exactly (the hot
    key lands in one bucket whose merge_asof is one vectorized pass)."""
    import ray.data as rd

    from opennre_ray.functions.relational import asof_join

    rng = np.random.default_rng(21)
    n = 4000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 40, n))
    left = pd.DataFrame({"k": keys, "t": np.arange(n, dtype="int64"),
                         "lv": np.arange(n)})
    right = pd.DataFrame({"k": keys[::2], "t": np.arange(0, n, 2) - 1,
                          "rv": np.arange(n // 2)})
    got = asof_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(right).repartition(8),
                    "k", "t", ["lv"], ["rv"], how="inner",
                    n_buckets=16).to_pandas()
    want = pd.merge_asof(left.sort_values("t"),
                         right.sort_values("t").rename(
                             columns={"rv": "rv_m"}),
                         on="t", by="k", direction="backward").dropna(
                             subset=["rv_m"])
    assert len(got) == len(want)
    g = got.sort_values(["k", "t"]).reset_index(drop=True)
    w = want.sort_values(["k", "t"]).reset_index(drop=True)
    assert (g["rv_m"].to_numpy() == w["rv_m"].to_numpy()).all()


def test_anti_join_bloom_path_cross_dtype_and_schema(ray_session):
    """The bloom-prefiltered fallback must (a) honor int-vs-float key
    equality like the broadcast path and (b) emit dtype-consistent blocks
    (the residual join's tagged union degrades ints to float)."""
    import pyarrow as pa
    import ray.data as rd

    from opennre_ray.functions.relational import anti_join

    left = pd.DataFrame({"k": np.arange(200, dtype="int64"),
                         "x": np.arange(200, dtype="int64") * 2})
    right = pd.DataFrame({"k": np.arange(0, 200, 2, dtype="float64")})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)

    got = anti_join(lds, rds, "k", ["x"], broadcast_limit=5)  # bloom path
    tbl = pa.concat_tables(
        [b for b in got.iter_batches(batch_format="pyarrow")])
    assert tbl.column("k").type == pa.int64()      # schema conformed
    assert tbl.column("x").type == pa.int64()
    assert sorted(tbl.column("k").to_pylist()) == list(range(1, 200, 2))

    bcast = anti_join(lds, rds, "k", ["x"]).to_pandas()
    assert sorted(bcast["k"]) == sorted(tbl.column("k").to_pylist())


def test_canonicalize_join_path_matches_broadcast(ray_session):
    """Over the surface-count limit, canonicalize_ids switches to the
    bucketed-join rewrite; output must be row-identical to the broadcast
    path (the size gate may never change semantics)."""
    import ray.data as rd

    from opennre_ray.stages.canonicalize import canonicalize_ids

    rng = np.random.default_rng(5)
    rows = []
    for i in range(400):
        s = f"Ent{i % 60}"                     # 60 surfaces, mixed case
        name = s.upper() if i % 3 == 0 else s.lower()
        rows.append({
            "h_name": name, "h_id": f"Q{i % 60}_{rng.integers(3)}",
            "t_name": f"ent{(i + 7) % 60}", "t_id": f"Q{(i + 7) % 60}_0",
            "pred_rel": "r", "score": 0.5, "url": f"u{i}",
            "model_hash": "m",
        })
    cols = ["h_id", "h_name", "t_id", "t_name", "pred_rel", "score",
            "url", "model_hash"]
    ds = rd.from_items(rows, override_num_blocks=8)

    def collect(out_ds):
        df = out_ds.to_pandas()[cols]
        return df.sort_values(cols).reset_index(drop=True)

    bcast = collect(canonicalize_ids(ds, cols))                  # broadcast
    joined = collect(canonicalize_ids(ds, cols, broadcast_limit=0))
    pd.testing.assert_frame_equal(bcast, joined, check_dtype=False)


def test_global_rank_matches_sql_row_number(ray_session):
    """Distributed rank == single-process sort rank, at any block count."""
    import ray.data as rd

    from opennre_ray.functions.relational import global_rank

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.permutation(1000), "v": np.arange(1000)})
    ds = rd.from_pandas(df).repartition(7)
    got = global_rank(ds, ["k"], out_col="r").to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert (got["r"].to_numpy() == np.arange(1, 1001)).all()
    # ranks are a permutation even when requested descending
    desc = global_rank(ds, ["k"], out_col="r",
                       descending=True).to_pandas()
    assert sorted(desc["r"]) == list(range(1, 1001))
    assert desc.loc[desc["k"].idxmax(), "r"] == 1


def test_skew_join_matches_merge_and_dtypes(ray_session):
    """Hybrid hot-broadcast + cold-shuffle join == plain inner join, with
    the inputs' exact Arrow dtypes restored on BOTH paths."""
    import ray.data as rd

    from opennre_ray.functions.relational import skew_join

    rng = np.random.default_rng(7)
    n = 5000
    keys = np.where(rng.random(n) < 0.4, 0,
                    rng.integers(0, 200, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys,
                         "v": rng.integers(0, 99, n).astype(np.int64)})
    right = pd.DataFrame({"rk": np.arange(150, dtype=np.int64),
                          "name": [f"n{i}" for i in range(150)]})

    out = skew_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(right).repartition(2),
                    "k", "rk", ["v"], ["name"],
                    hot_k=4, rows_hint=n).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")[["k", "v", "name"]]
    a = out.sort_values(["k", "v", "name"]).reset_index(drop=True)
    b = exp.sort_values(["k", "v", "name"]).reset_index(drop=True)
    assert a["k"].dtype == np.int64 and a["v"].dtype == np.int64
    pd.testing.assert_frame_equal(a, b)


def test_shuffle_join_left_outer(ray_session):
    """how='left' keeps unmatched left rows with nulls on the right side."""
    import ray.data as rd

    from opennre_ray.functions.relational import shuffle_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"rk": [2, 4], "rv": [20.0, 40.0]})
    out = shuffle_join(rd.from_pandas(left).repartition(3),
                       rd.from_pandas(right).repartition(2),
                       "k", "rk", ["lv"], ["rv"],
                       how="left", n_buckets=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    exp = left.merge(right, left_on="k", right_on="rk",
                     how="left")[["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(out.astype({"rv": float}), exp,
                                  check_dtype=False)


def test_shuffle_join_full_outer(ray_session):
    """how='full' keeps unmatched rows from BOTH sides; the key column is
    populated for every row, and each side's value columns are null on the
    other side's exclusive keys."""
    import ray.data as rd

    from opennre_ray.functions.relational import shuffle_join

    left = pd.DataFrame({"k": [1, 2, 3, 2], "lv": ["a", "b", "c", "b2"]})
    right = pd.DataFrame({"rk": [2, 5, 6], "rv": [20.0, 50.0, 60.0]})
    out = shuffle_join(rd.from_pandas(left).repartition(3),
                       rd.from_pandas(right).repartition(2),
                       "k", "rk", ["lv"], ["rv"],
                       how="full", n_buckets=4).to_pandas()
    exp = (left.merge(right, left_on="k", right_on="rk", how="outer")
           .assign(k=lambda d: d["k"].fillna(d["rk"]))[["k", "lv", "rv"]])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True).astype({"k": float}),
        exp.sort_values(key).reset_index(drop=True).astype({"k": float}),
        check_dtype=False)
    assert out["k"].notna().all()
    # both outer directions actually fired
    assert out.loc[out["k"] == 3, "rv"].isna().all()
    assert out.loc[out["k"] == 5, "lv"].isna().all()


def test_hash_bucket_aggregate_partial_combiner_bounds_hot_key(ray_session):
    """The partial= map-side combiner must (a) keep results exact and
    (b) bound a hot key's per-bucket row count to one row per input
    block — per_bucket ASSERTS the bound, so a missing combine fails
    the query, not just the timing."""
    import ray.data as rd

    from opennre_ray.functions.relational import hash_bucket_aggregate

    n, blocks = 4_000_000, 32
    ds = rd.range(n, override_num_blocks=blocks).map_batches(
        lambda b: pd.DataFrame({"k": np.where(b["id"] % 97 == 0,
                                              b["id"] % 3, 0),
                                "v": b["id"]}),
        batch_format="numpy")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("k", as_index=False).agg(
            s=("v", "sum"), c=("v", "size"),
            mn=("v", "min"), mx=("v", "max"))
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # every block contributes <= 3 partial rows per key-bucket
        assert len(g) <= 3 * blocks, f"unbounded bucket: {len(g)} rows"
        out = g.groupby("k", as_index=False).agg(
            s=("s", "sum"), c=("c", "sum"),
            mn=("mn", "min"), mx=("mx", "max"))
        return out

    got = hash_bucket_aggregate(ds, ["k"], fold, n_buckets=8,
                                partial=part).to_pandas()
    got = got.sort_values("k", ignore_index=True)

    ids = np.arange(n, dtype=np.int64)
    k = np.where(ids % 97 == 0, ids % 3, 0)
    exp = (pd.DataFrame({"k": k, "v": ids}).groupby("k", as_index=False)
           .agg(s=("v", "sum"), c=("v", "size"),
                mn=("v", "min"), mx=("v", "max"))
           .sort_values("k", ignore_index=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
