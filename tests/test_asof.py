"""asof_join: backward-match semantics vs a hand-computed oracle."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray.functions.relational import asof_join


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 60),
        "t": rng.integers(0, 1000, 60).astype("int64"),
        "lv": np.arange(60, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 6, 40),          # key 5 never on the left
        "t": rng.integers(0, 1000, 40).astype("int64"),
        "rv": np.arange(100, 140, dtype="int64"),
    }).drop_duplicates(["k", "t"])
    return (rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3), left, right)


def _oracle(left, right, how):
    out = []
    for r in left.itertuples():
        m = right[(right["k"] == r.k) & (right["t"] <= r.t)]
        if len(m):
            best = m.sort_values("t").iloc[-1]
            out.append((r.k, r.t, r.lv, best["rv"], best["t"]))
        elif how == "left":
            out.append((r.k, r.t, r.lv, None, None))
    return sorted(out, key=lambda x: (x[0], x[1], x[2]))


@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_join_matches_oracle(sides, how):
    lds, rds, left, right = sides
    got = asof_join(lds, rds, "k", "t", ["lv"], ["rv"],
                    how=how, n_buckets=4).to_pandas()
    want = _oracle(left, right, how)
    got = got.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert len(got) == len(want)
    for row, w in zip(got.itertuples(), want):
        assert (row.k, row.t, row.lv) == w[:3]
        if w[3] is None:
            assert pd.isna(row.rv_m)
        else:
            assert row.rv_m == w[3] and row.t_m == w[4]


def test_broadcast_range_join_overlapping_bands(ray_session):
    """A row matches EVERY covering band (true interval-join semantics)."""
    import ray.data as rd

    from opennre_ray.functions.relational import broadcast_range_join

    ds = rd.from_items([{"x": float(v), "rid": i}
                        for i, v in enumerate([0, 5, 10, 15, 25])])
    bands = pd.DataFrame({"band": ["a", "b", "c"],
                          "lo": [0.0, 4.0, 30.0],
                          "hi": [11.0, 20.0, 40.0]})
    got = broadcast_range_join(ds, bands, "x").to_pandas()
    want = {(0, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b")}
    assert set(zip(got["rid"], got["band"])) == want   # 25 matches nothing


def test_shuffle_join_mixed_key_dtypes(ray_session):
    """int64 keys on one side, float64 on the other: equal values must
    still co-locate and join (dtype-sensitive bucket hashing regression)."""
    import ray.data as rd

    from opennre_ray.functions.relational import shuffle_join

    left = rd.from_items([{"k": i, "lv": i * 10} for i in range(20)])
    right = rd.from_items([{"k": float(i), "rv": i * 100}
                           for i in range(0, 20, 2)])
    got = shuffle_join(left, right, "k", "k", ["lv"], ["rv"],
                       n_buckets=8).to_pandas()
    assert len(got) == 10
    assert sorted(got["k"].astype(int)) == list(range(0, 20, 2))
    assert (got["rv"].to_numpy() == got["k"].to_numpy() * 100).all()


def test_band_join_matches_brute_force(ray_session):
    """Blocked distance-band join == the brute-force double loop,
    inclusive at exactly eps, across several blocks and a hot block."""
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.relational import band_join

    rng = np.random.RandomState(11)
    n_l, n_r = 120, 90
    left = [{"blk": int(rng.randint(4)), "v": int(rng.randint(0, 60)),
             "lid": i} for i in range(n_l)]
    right = [{"blk": int(b % 3), "w": int(rng.randint(0, 60)),
              "rid": 1000 + b} for b in range(n_r)]
    eps = 3
    got = band_join(rd.from_items(left).repartition(5),
                    rd.from_items(right).repartition(4),
                    "blk", "blk", "v", "w", eps, ["lid"], ["rid"],
                    n_buckets=8).to_pandas()
    want = {(l["lid"], r["rid"])
            for l in left for r in right
            if l["blk"] == r["blk"] and abs(l["v"] - r["w"]) <= eps}
    assert set(zip(got["lid"], got["rid"])) == want
    # diff column is the exact integer distance
    lv = {l["lid"]: l["v"] for l in left}
    rv = {r["rid"]: r["w"] for r in right}
    for lid, rid, d in zip(got["lid"], got["rid"], got["_diff"]):
        assert d == abs(lv[lid] - rv[rid])
    # boundary: a pair at exactly eps distance is present
    assert any(abs(lv[l] - rv[r]) == eps for l, r in want) or not want


def test_interval_self_join_matches_brute_force(ray_session):
    """Blocked interval-overlap self-join == the brute-force double loop,
    with normalized pair ids and exact overlap lengths."""
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.relational import interval_self_join

    rng = np.random.RandomState(5)
    rows = []
    for i in range(150):
        s = int(rng.randint(0, 200))
        rows.append({"blk": int(rng.randint(5)), "rid": i,
                     "s": s, "e": s + int(rng.randint(1, 40))})
    got = interval_self_join(rd.from_items(rows).repartition(6),
                             "blk", "rid", "s", "e",
                             n_buckets=4).to_pandas()
    want = {}
    for a in rows:
        for b in rows:
            if (a["blk"] == b["blk"] and a["rid"] < b["rid"]
                    and a["s"] < b["e"] and b["s"] < a["e"]):
                want[(a["rid"], b["rid"])] = (min(a["e"], b["e"])
                                              - max(a["s"], b["s"]))
    got_pairs = {(int(a), int(b)): int(o)
                 for a, b, o in zip(got["id_a"], got["id_b"],
                                    got["overlap"])}
    assert got_pairs == want


def test_band_and_interval_joins_partition_invariant(ray_session):
    """Band and interval joins emit identical pair sets at any block
    count / bucket count (no partition-boundary dependence)."""
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.relational import (band_join,
                                                  interval_self_join)

    rng = np.random.RandomState(3)
    left = [{"blk": int(rng.randint(3)), "v": int(rng.randint(50)),
             "lid": i} for i in range(60)]
    right = [{"blk": int(rng.randint(3)), "w": int(rng.randint(50)),
              "rid": 100 + i} for i in range(40)]
    ivals = [{"blk": int(rng.randint(3)), "rid": i,
              "s": int(rng.randint(40)), "e": 0} for i in range(50)]
    for r in ivals:
        r["e"] = r["s"] + int(rng.randint(1, 15))

    def band(parts, nb):
        got = band_join(rd.from_items(left).repartition(parts),
                        rd.from_items(right).repartition(parts),
                        "blk", "blk", "v", "w", 4, ["lid"], ["rid"],
                        n_buckets=nb).to_pandas()
        return sorted(zip(got["lid"], got["rid"]))

    def ivj(parts, nb):
        got = interval_self_join(rd.from_items(ivals).repartition(parts),
                                 "blk", "rid", "s", "e",
                                 n_buckets=nb).to_pandas()
        return sorted(zip(got["id_a"], got["id_b"], got["overlap"]))

    assert band(2, 2) == band(7, 16)
    assert ivj(2, 2) == ivj(9, 16)
