"""Sequence packing + hash split: budget invariants and stability."""

import numpy as np
import pytest

from opennre_ray.functions.packing import hash_split, pack_sequences


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(300):
        if i % 97 == 0:
            n = 700                     # over budget: must sit alone
        elif i % 31 == 0:
            n = 0                       # empty doc
        else:
            n = int(rng.integers(20, 200))
        rows.append({"doc_id": i, "text": " ".join(["w"] * n)})
    return rd.from_items(rows).repartition(6)


def test_pack_sequences_budget_invariant(docs_ds):
    got = pack_sequences(docs_ds, budget=512, part_size=50).to_pandas()
    assert len(got) == 300
    sizes = got.groupby(["part_id", "seq_id"])["n_tokens"].agg(["sum", "size"])
    over = sizes[sizes["sum"] > 512]
    # only over-budget singleton docs may exceed the budget
    assert (over["size"] == 1).all()
    # greedy in doc order: seq_id non-decreasing, seq_pos consecutive
    for (_, _), g in got.sort_values("doc_id").groupby(["part_id", "seq_id"]):
        assert list(g.sort_values("doc_id")["seq_pos"]) == list(range(len(g)))


def test_pack_sequences_partition_isolation(docs_ds):
    """Packing a partition never depends on other partitions: re-packing a
    single partition's docs alone gives identical assignments."""
    full = pack_sequences(docs_ds, budget=512, part_size=50).to_pandas()
    import ray.data as rd

    one = docs_ds.filter(lambda r: 50 <= r["doc_id"] < 100)
    alone = pack_sequences(one, budget=512, part_size=50).to_pandas()
    merged = full[full["part_id"] == 1].sort_values("doc_id").reset_index(drop=True)
    alone = alone.sort_values("doc_id").reset_index(drop=True)
    assert (merged[["doc_id", "seq_id", "seq_pos"]].to_numpy()
            == alone[["doc_id", "seq_id", "seq_pos"]].to_numpy()).all()


def test_hash_split_stable_and_balanced(docs_ds):
    got = hash_split(docs_ds, "doc_id", 0.8).to_pandas()
    frac = (got["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    # content-stable: same key -> same split regardless of corpus subset
    sub = hash_split(docs_ds.filter(lambda r: r["doc_id"] < 100),
                     "doc_id", 0.8).to_pandas()
    m = got.set_index("doc_id")["split"]
    assert all(m[r.doc_id] == r.split for r in sub.itertuples())


def test_sample_then_split_draws_are_independent(docs_ds):
    """stratified_sample and hash_split use distinct hash families: the
    sampled subset must still split ~train_frac, not collapse to train."""
    from opennre_ray.functions.packing import stratified_sample

    import ray.data as rd

    rows = [{"doc_id": i, "lang": "big" if i < 260 else "small"}
            for i in range(300)]
    ds = rd.from_items(rows).repartition(4)
    sampled = stratified_sample(ds, "lang", "doc_id")
    split = hash_split(sampled, "doc_id", 0.8).to_pandas()
    big = split[split["lang"] == "big"]
    assert len(big) > 20                       # sampler kept ~40/260
    assert 0 < (big["split"] == "test").sum() < len(big)


def test_bottomk_sample_matches_bruteforce(ray_session):
    """bottomk_sample == brute-force per-key bottom-k by md5 draw, and the
    winner set is invariant to how the input is partitioned."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.packing import bottomk_sample

    rows = [{"doc_id": i, "lang": ["en", "de", "fr"][i % 3]}
            for i in range(200)]
    # tiny key: fewer rows than k, all must be kept
    rows += [{"doc_id": 1000 + i, "lang": "rare"} for i in range(3)]

    def draw(i):
        return int(hashlib.md5(("bk:" + str(i)).encode())
                   .hexdigest()[:8], 16)

    df = pd.DataFrame(rows)
    df["draw"] = [draw(i) for i in df["doc_id"]]
    want = (df.sort_values(["lang", "draw", "doc_id"])
              .groupby("lang").head(5)
              .sort_values("doc_id").reset_index(drop=True))

    for n_parts in (1, 7):
        ds = rd.from_items(rows).repartition(n_parts)
        got = (bottomk_sample(ds, "lang", "doc_id", k=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (got[["doc_id", "lang", "draw"]].to_numpy()
                == want[["doc_id", "lang", "draw"]].to_numpy()).all()
    assert (got[got["lang"] == "rare"]["doc_id"].tolist()
            == [1000, 1001, 1002])


def test_new_operators_on_empty_input(ray_session):
    """Empty datasets flow through pack/sample/split without crashing."""
    import pyarrow as pa
    import ray.data as rd

    from opennre_ray.functions.packing import stratified_sample

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert stratified_sample(empty, "lang", "doc_id").count() == 0
    assert hash_split(empty, "doc_id").count() == 0
    assert len(pack_sequences(empty, budget=64, part_size=10)
               .to_pandas()) == 0


def test_topk_by_key_matches_bruteforce(ray_session):
    """topk_by_key == brute-force per-key top-k by (score desc, id asc),
    invariant to partitioning; boundary score ties resolved by id."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.packing import topk_by_key

    rows = [{"k": ["a", "b"][i % 2], "id": i, "score": (i * 7) % 13}
            for i in range(60)]
    df = pd.DataFrame(rows)
    want = (df.sort_values(["k", "score", "id"],
                           ascending=[True, False, True])
              .groupby("k").head(4)
              .sort_values("id").reset_index(drop=True))
    for n_parts in (1, 6):
        ds = rd.from_items(rows).repartition(n_parts)
        got = (topk_by_key(ds, "k", "score", id_col="id", k=4)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert (got[["k", "id", "score"]].to_numpy()
                == want[["k", "id", "score"]].to_numpy()).all()


def test_weighted_sample_partition_invariant_and_proportional(ray_session):
    """Winner set is a pure function of (id, weight): identical at any
    block count and equal to a sequential replay; heavier rows win more."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.packing import weighted_sample
    from opennre_ray.functions.sqlcompat import sql_round

    n = 2000
    rng = np.random.default_rng(9)
    w = np.where(np.arange(n) < 100, 500, 5).astype(np.int64)  # 100 heavy
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "w": w})

    got1 = weighted_sample(rd.from_pandas(df).repartition(3), "w", "doc_id",
                           k=50)
    got2 = weighted_sample(rd.from_pandas(df).repartition(17), "w",
                           "doc_id", k=50)
    pd.testing.assert_frame_equal(got1, got2)

    u32 = np.array([int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:8], 16)
                    for i in df.doc_id], dtype=np.float64)
    e = sql_round(-np.log((u32 + 1) / 2 ** 32)
                  / np.maximum(w.astype(np.float64), 1.0), 6)
    exp = (df.assign(e=e).sort_values(["e", "doc_id"]).head(50)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got1, exp)
    # heavy rows are 100x the weight of the other 1900 -> dominate the
    # sample far beyond their 5% population share
    assert (got1["doc_id"] < 100).sum() > 25


def test_chunk_windows_boundaries(ray_session):
    """Exact window arithmetic: n<=size is one chunk; the last window
    covers the tail; empty docs emit nothing."""
    import ray.data as rd

    from opennre_ray.functions.packing import chunk_windows

    rows = [
        {"doc_id": 0, "text": " ".join(f"w{i}" for i in range(10))},
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": ""},
        # n = size + 1: exactly 2 chunks, second is the 1-token tail + overlap
        {"doc_id": 3, "text": " ".join(f"x{i}" for i in range(5))},
    ]
    got = (chunk_windows(rd.from_items(rows).repartition(2),
                         size=4, stride=3).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    # doc0 (10 toks): starts 0,3,6 — the start-6 window already reaches
    # the tail (6+4 = n), so no degenerate trailing chunk is emitted
    d0 = got[got["doc_id"] == 0]
    assert d0["n_tokens"].tolist() == [4, 4, 4]
    assert d0["chunk_text"].iloc[-1] == "w6 w7 w8 w9"
    assert got[got["doc_id"] == 1]["n_tokens"].tolist() == [3]
    assert 2 not in set(got["doc_id"])
    d3 = got[got["doc_id"] == 3]
    assert d3["chunk_text"].tolist() == ["x0 x1 x2 x3", "x3 x4"]


def test_temperature_sample_properties(ray_session):
    """alpha=1 keeps every row (no rebalancing); alpha=0 reduces to the
    equal-size stratified rule (same cuts as min/count); smallest stratum
    is always fully kept."""
    import ray.data as rd

    from opennre_ray.functions.packing import (stratified_sample,
                                               temperature_sample)

    rows = ([{"doc_id": i, "lang": "en"} for i in range(400)]
            + [{"doc_id": 1000 + i, "lang": "de"} for i in range(20)])
    ds = rd.from_items(rows).repartition(4)
    all_kept = temperature_sample(ds, "lang", "doc_id", alpha=1.0)
    assert all_kept.count() == 420
    t = temperature_sample(ds, "lang", "doc_id", alpha=0.3).to_pandas()
    assert (t[t["lang"] == "de"]["doc_id"].nunique()) == 20  # min stratum
    # en keep-rate ~ (20/400)^0.7 = 0.123 -> expect far fewer than 400
    n_en = (t["lang"] == "en").sum()
    assert 10 <= n_en <= 120


def test_new_ops_empty_input(ray_session):
    """Empty datasets flow through the new operators without errors and
    yield empty (or all-zero) results — no div-by-zero in the corpus
    statistics, no schema breakage in the bucketed aggregates."""
    import pyarrow as pa
    import ray.data as rd

    from opennre_ray.functions.dedup import paragraph_dedup
    from opennre_ray.functions.packing import (chunk_windows,
                                               temperature_sample)
    from opennre_ray.functions.relational import per_key_mode
    from opennre_ray.functions.streaming import cohort_retention
    from opennre_ray.functions.textstats import unigram_logprob

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert paragraph_dedup(docs).count() == 0
    assert unigram_logprob(docs).count() == 0
    assert chunk_windows(docs).count() == 0
    assert temperature_sample(docs, "lang", "doc_id").count() == 0

    events = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string())}))
    assert cohort_retention(events).count() == 0
    assert per_key_mode(events, "user_id", "event_type").count() == 0


def test_poisson_bootstrap_ci_matches_sequential(ray_session, sf_dir):
    """Distributed Poisson-bootstrap CI == a single-process numpy replay
    of the same draws over the collected table, and the interval
    brackets the point estimate."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from opennre_ray.functions.packing import (POISSON1_CDF_U64, _md5_u64,
                                               bootstrap_params,
                                               poisson_bootstrap_ci)
    from opennre_ray.functions.sqlcompat import sql_round

    tbl = pq.read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    got = poisson_bootstrap_ci(rd.from_arrow(tbl).repartition(7),
                               "o_totalprice", "o_orderkey", n_replicas=40)

    keys = tbl.column("o_orderkey").to_numpy()
    cents = np.round(tbl.column("o_totalprice").to_numpy() * 100
                     ).astype(np.int64)
    h = np.array([_md5_u64(f"boot::{k}") for k in keys], dtype=np.uint64)
    a, c = bootstrap_params(40)
    thr = np.array(POISSON1_CDF_U64, dtype=np.uint64)
    u = h[:, None] * a[None, :] + c[None, :]
    w = (u[:, :, None] >= thr[None, None, :]).sum(2).astype(np.int64)
    m = np.sort(sql_round(
        (w * cents[:, None]).sum(0).astype(np.float64)
        / w.sum(0).astype(np.float64) / 100, 12))
    row = got.iloc[0]
    assert row["n_rows"] == len(keys)
    assert row["mean"] == sql_round(
        np.float64(cents.sum()) / np.float64(len(keys)) / 100, 12)
    assert row["ci_lo"] == m[0]          # ceil(0.025*40) = rank 1
    assert row["ci_hi"] == m[38]         # ceil(0.975*40) = rank 39
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    # Poisson(1) weights: mean ~1, so total resample mass ~ n per replica
    assert abs(w.sum() / (40 * len(keys)) - 1.0) < 0.05
