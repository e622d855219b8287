"""Sketch + streaming operator tests vs exact oracles."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray.functions.sketches import (
    HLL,
    approx_distinct,
    heavy_hitters,
    mg_merge,
    mg_sketch,
)
from opennre_ray.functions.streaming import (
    KeyedStateActor,
    incremental_keyed_state,
    running_totals,
)


def test_mg_sketch_guarantee():
    # value with frequency > n/k always survives with bounded undercount
    items = ["hot"] * 500 + [f"x{i}" for i in range(400)]
    sk = mg_sketch(items, k=10)
    n = len(items)
    assert "hot" in sk
    assert 500 - n / 10 <= sk["hot"] <= 500


def test_mg_merge():
    a = mg_sketch(["a"] * 50 + ["b"] * 10, 4)
    b = mg_sketch(["a"] * 30 + ["c"] * 20, 4)
    merged = mg_merge([a, b], 4)
    assert merged.get("a", 0) >= 60  # 80 true, undercount bounded


def test_hll_accuracy_and_merge():
    h = HLL(p=12).add_many([f"u{i}" for i in range(5000)])
    assert abs(h.estimate() - 5000) / 5000 < 0.05
    h1 = HLL(p=12).add_many([f"u{i}" for i in range(3000)])
    h2 = HLL(p=12).add_many([f"u{i}" for i in range(2000, 5000)])
    h1.merge(h2)
    assert abs(h1.estimate() - 5000) / 5000 < 0.05
    # serialization roundtrip
    back = HLL.from_bytes(h1.to_bytes())
    assert back.estimate() == h1.estimate()


def test_heavy_hitters_matches_exact_top(ray_session, sf_dir):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from opennre_ray.pipelines.queries import docs_heavy_hitter_words

    got = docs_heavy_hitter_words(sf_dir).to_pandas()
    con = duckdb.connect()
    exact = con.sql(rf"""
        SELECT token, count(*) c FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM '{sf_dir}/documents.parquet') GROUP BY token
        ORDER BY c DESC, token LIMIT 10""").df()
    con.close()
    # with only 31 distinct words and 64 counters the sketch is exact
    assert set(got["value"]) == set(exact["token"])
    exact_map = dict(zip(exact["token"], exact["c"]))
    for v, c in zip(got["value"], got["approx_count"]):
        assert c == exact_map[v]


def test_approx_distinct_users(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    con = duckdb.connect()
    true = con.sql(f"SELECT count(DISTINCT user_id) FROM "
                   f"'{sf_dir}/events.parquet'").fetchone()[0]
    con.close()
    assert abs(est - true) / true < 0.1


def test_running_totals_vs_pandas(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    got = running_totals(ds, "user_id", "ts", "value").to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df = df.sort_values(["user_id", "ts"])
    df["rn"] = df.groupby("user_id").cumcount() + 1
    df["rs"] = df.groupby("user_id")["value"].cumsum().round(2)
    want = df.sort_values("event_id").reset_index(drop=True)
    assert (got["running_n"].to_numpy() == want["rn"].to_numpy()).all()
    np.testing.assert_allclose(got["running_sum"], want["rs"], atol=1e-6)


def test_keyed_state_actor_incremental():
    a = KeyedStateActor()
    a.feed(["u1", "u2", "u1"], [1.0, 5.0, 3.0])
    a.feed(["u1"], [2.0])
    snap = a.snapshot()
    assert snap["u1"] == (3, 6.0, 3.0)
    assert snap["u2"] == (1, 5.0, 5.0)


def test_incremental_keyed_state_matches_batch(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    state = incremental_keyed_state(ds, "user_id", "ts", "value", n_buckets=4)
    # exact oracle: full-table per-key aggregates
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    want = df.groupby("user_id")["value"].agg(["size", "sum", "max"])
    assert len(state) == len(want)
    for k, row in want.iterrows():
        n, s, mx = state[k]
        assert n == row["size"]
        np.testing.assert_allclose(s, row["sum"], rtol=1e-9)
        np.testing.assert_allclose(mx, row["max"], rtol=1e-12)


def test_heavy_hitters_verified_is_exact(ray_session):
    """Candidate+verify top-k == exact Counter top-k with the same
    (count desc, value asc) tie-break — including a skewed stream where
    plain MG counts would be under-estimates."""
    from collections import Counter

    import ray.data as rd

    from opennre_ray.functions.sketches import heavy_hitters_verified

    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(300)]
    weights = 1.0 / np.arange(1, 301) ** 1.2
    items = list(rng.choice(vocab, size=20000, p=weights / weights.sum()))
    ds = rd.from_items([{"word": w} for w in items]).repartition(8)
    got = heavy_hitters_verified(ds, "word", k=10, counters=64).to_pandas()

    c = Counter(items)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["value"]) == [w for w, _ in want]
    assert list(got["cnt"]) == [n for _, n in want]


def test_bloom_no_false_negatives_and_low_fp():
    from opennre_ray.functions.sketches import Bloom

    b = Bloom(n_bits=1 << 16, n_hashes=5)
    members = [f"key{i}" for i in range(2000)]
    b.add_many(members)
    assert b.contains_many(members).all()           # no false negatives
    probes = [f"other{i}" for i in range(5000)]
    fp = b.contains_many(probes).mean()
    assert fp < 0.05                                 # m/n=32 → fp << 1%


def test_bloom_merge_is_union():
    from opennre_ray.functions.sketches import Bloom

    a = Bloom(n_bits=1 << 14).add_many(["x", "y"])
    c = Bloom(n_bits=1 << 14).add_many(["z"])
    m = Bloom.from_bytes(a.to_bytes(), 1 << 14).merge(
        Bloom.from_bytes(c.to_bytes(), 1 << 14))
    assert m.contains_many(["x", "y", "z"]).all()


def test_distributed_bloom_build(ray_session):
    import ray.data as rd

    from opennre_ray.functions.sketches import build_bloom

    ds = rd.from_items([{"k": f"v{i}"} for i in range(3000)]).repartition(6)
    bf = build_bloom(ds, "k", n_bits=1 << 17)
    assert bf.contains_many([f"v{i}" for i in range(3000)]).all()
    assert bf.contains_many([f"w{i}" for i in range(3000)]).mean() < 0.05


def test_count_min_overestimates_within_bound(ray_session):
    """CM point estimates: exact lower bound, ε·n over-estimate bound."""
    import ray.data as rd
    from collections import Counter

    from opennre_ray.functions.sketches import build_count_min

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(500)]
    w = 1.0 / np.arange(1, 501)
    items = list(rng.choice(vocab, size=30000, p=w / w.sum()))
    ds = rd.from_items([{"v": x} for x in items]).repartition(8)
    cm = build_count_min(ds, "v", width=1 << 12, depth=4)

    exact = Counter(items)
    probes = vocab[:50]
    est = cm.estimate_many(probes)
    true = np.array([exact[p] for p in probes])
    assert (est >= true).all()                        # never under
    # ε = e/width bound with prob 1 - e^-depth; allow the loose 2ε·n
    assert (est - true).max() <= 2 * np.e * len(items) / (1 << 12)


def test_ddsketch_relative_error_and_merge():
    """Quantile estimates within the (γ-1)/(γ+1) relative-error bound of
    exact quantiles; merging partial sketches equals one-shot."""
    from opennre_ray.functions.sketches import DDSketch

    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(5, 2, size=20_000))       # lognormal spread
    gamma = 1.02
    bound = (gamma - 1) / (gamma + 1) + 1e-12

    one = DDSketch(gamma).add_many(vals)
    parts = DDSketch(gamma)
    for chunk in np.array_split(vals, 13):
        parts.merge(DDSketch(gamma).add_many(chunk))
    assert parts.counts == one.counts

    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = one.quantile(q)
        exact = srt[max(1, int(np.ceil(q * len(vals)))) - 1]
        assert abs(est - exact) / exact <= bound


def test_ddsketch_nonpositive_tracked():
    from opennre_ray.functions.sketches import DDSketch

    sk = DDSketch().add_many([0.0, -3.0, 2.0, 5.0])
    assert sk.n_nonpos == 2 and sk.n == 2


def test_dd_quantiles_distributed_matches_local(ray_session, sf_dir):
    import ray.data as rd

    from opennre_ray.functions.sketches import DDSketch, dd_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    got = dd_quantiles(ds, "l_extendedprice", qs=(0.5, 0.95))
    import pyarrow.parquet as pq
    vals = pq.read_table(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"]
                         ).column(0).to_numpy(zero_copy_only=False)
    local = DDSketch().add_many(vals)
    assert got[0.5] == local.quantile(0.5)
    assert got[0.95] == local.quantile(0.95)


def test_exact_int_quantile_rank_semantics(ray_session):
    """Smallest value whose cumulative count reaches ceil(n*q): checked on
    even/odd counts, duplicated values, and an all-equal column."""
    import ray.data as rd

    from opennre_ray.functions.sketches import exact_int_quantile

    def q(vals, num, den):
        ds = rd.from_items([{"x": v} for v in vals]).repartition(3)
        return exact_int_quantile(ds, "x", num, den)

    assert q([1, 2, 3, 4], 1, 2) == 2          # ceil(4/2)=2nd of sorted
    assert q([1, 2, 3, 4, 5], 1, 2) == 3       # ceil(5/2)=3rd
    assert q([7, 7, 7, 7], 1, 2) == 7
    assert q([0, 0, 0, 9], 3, 4) == 0          # ceil(3)=3rd -> still 0
    assert q([0, 0, 0, 9], 4, 4) == 9          # max
    assert q(list(range(100)), 95, 100) == 94  # ceil(95)=95th -> value 94

    import pytest
    with pytest.raises(ValueError):
        exact_int_quantile(
            rd.from_items([{"x": 1}]).filter(expr="x > 5"), "x")
