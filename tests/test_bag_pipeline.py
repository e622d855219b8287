"""Bag-level pipeline: groupby(h_id,t_id) → map_groups scoring (G1, G5-G9)."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray import get_model
from opennre_ray.pipelines.bag import BagScorer, bag_scores


def _instances():
    """Two entity-pair bags: sizes 2 and 1, plus a skew-probe bag of 5."""
    rows = []
    sents = [
        ("the spark table join was fast", 4, 9, 16, 20),
        ("spark join hash merge data", 0, 5, 6, 10),
    ]
    for text, hs, he, ts, te in sents:
        rows.append({"text": text, "h_id": "E1", "t_id": "E2",
                     "h_start": hs, "h_end": he, "t_start": ts, "t_end": te})
    rows.append({"text": "the merge sort was slow", "h_id": "E3",
                 "t_id": "E4", "h_start": 4, "h_end": 9,
                 "t_start": 10, "t_end": 14})
    for i in range(5):
        rows.append({"text": f"data stream window batch row {i}",
                     "h_id": "E5", "t_id": "E6", "h_start": 0, "h_end": 4,
                     "t_start": 5, "t_end": 11})
    return rows


@pytest.mark.parametrize("model_name", ["nyt10_pcnn_att", "nyt10_pcnn_avg",
                                        "nyt10_pcnn_one"])
def test_bag_scores_match_driver_oracle(ray_session, model_name):
    import ray.data as rd

    rows = _instances()
    out = bag_scores(rd.from_items(rows), model_name=model_name).to_pandas()
    model = get_model(model_name)
    n_nonna = len(model.rel2id) - 1
    assert len(out) == 3 * n_nonna       # 3 bags × non-NA relations

    # driver-side oracle: infer_bag on each bag directly
    df = pd.DataFrame(rows)
    for (h, t), g in df.groupby(["h_id", "t_id"]):
        bag = [{"text": r.text, "h": {"pos": (r.h_start, r.h_end)},
                "t": {"pos": (r.t_start, r.t_end)}}
               for r in g.itertuples()]
        rel, score = model.infer_bag(bag)
        sub = out[(out.h_id == h) & (out.t_id == t)]
        best = sub.loc[sub["score"].idxmax()]
        assert best["relation"] == rel
        np.testing.assert_allclose(best["score"], score, rtol=1e-5)
        assert (sub["bag_size"] == len(bag)).all()


@pytest.mark.parametrize("bag_size", [0, 3])
def test_bucket_scorer_matches_per_group(bag_size):
    """The vectorized bucket path is row-identical to the per-group oracle."""
    from opennre_ray.pipelines.bag import BucketBagScorer

    rows = pd.DataFrame(_instances())
    bucket_out = (BucketBagScorer("nyt10_pcnn_att", bag_size=bag_size)(rows)
                  .sort_values(["h_id", "t_id", "relation"])
                  .reset_index(drop=True))
    per_group = BagScorer("nyt10_pcnn_att", bag_size=bag_size)
    oracle = (pd.concat([per_group(g) for _, g in
                         rows.groupby(["h_id", "t_id"])])
              .sort_values(["h_id", "t_id", "relation"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        bucket_out.astype({"bag_size": "int64"}),
        oracle.astype({"bag_size": "int64"}))


def test_bag_resample_deterministic():
    scorer = BagScorer("nyt10_pcnn_att", bag_size=3)
    g = pd.DataFrame(_instances()[-5:])
    out1 = scorer(g.copy())
    out2 = scorer(g.copy())
    pd.testing.assert_frame_equal(out1, out2)
    assert (out1["bag_size"] == 3).all()


def test_member_salts_bound_group_sizes():
    """Content salting splits an oversize bag into ceil(n/threshold)
    groups with balanced sizes — no single shuffle group holds more than
    ~threshold rows."""
    from opennre_ray.pipelines.bag import _member_salts

    n, thr = 30_000, 512
    g = pd.DataFrame({
        "text": [f"alpha {i % 977} beta {i}" for i in range(n)],
        "h_start": np.zeros(n, np.int64),
        "t_start": np.full(n, 11, np.int64)})
    n_salt = int(np.ceil(n / thr))
    salts = _member_salts(g, np.full(n, n_salt, np.int64))
    sizes = np.bincount(salts, minlength=n_salt)
    assert salts.min() >= 0 and salts.max() < n_salt
    assert sizes.max() <= 2 * thr
    # deterministic under row order (content-derived)
    perm = np.random.default_rng(0).permutation(n)
    again = _member_salts(g.iloc[perm], np.full(n, n_salt, np.int64))
    assert np.array_equal(again, salts[perm])


def test_oversize_bag_salted_path_matches_direct(ray_session):
    """A monster entity pair routes through the salted two-stage
    aggregate; its scores match the unsplit path and the COLD bags keep
    the exact single-stage float path (bit-identical)."""
    import ray.data as rd

    rows = []
    for i in range(30_000):
        rows.append({"text": f"alpha{i % 977} works with beta node {i}",
                     "h_id": "HOT", "t_id": "PAIR",
                     "h_start": 0, "h_end": 6, "t_start": 17, "t_end": 21})
    for j in range(4):
        for i in range(3):
            rows.append({"text": f"data stream window batch {j} {i}",
                         "h_id": f"C{j}", "t_id": f"D{j}",
                         "h_start": 0, "h_end": 4, "t_start": 5,
                         "t_end": 11})
    df = pd.DataFrame(rows)
    key = ["h_id", "t_id", "relation"]
    salted = (bag_scores(rd.from_pandas(df).repartition(8),
                         oversize_threshold=512)
              .to_pandas().sort_values(key).reset_index(drop=True))
    direct = (bag_scores(rd.from_pandas(df).repartition(8),
                         oversize_threshold=None)
              .to_pandas().sort_values(key).reset_index(drop=True))
    assert len(salted) == len(direct)
    assert (salted["bag_size"].to_numpy()
            == direct["bag_size"].to_numpy()).all()
    assert (salted[salted.h_id == "HOT"]["bag_size"] == 30_000).all()
    np.testing.assert_allclose(salted["score"].to_numpy(),
                               direct["score"].to_numpy(),
                               rtol=1e-4, atol=1e-5)
    cold_s = salted[salted.h_id != "HOT"]["score"].to_numpy()
    cold_d = direct[direct.h_id != "HOT"]["score"].to_numpy()
    assert (cold_s == cold_d).all()


@pytest.mark.parametrize("model_name", ["nyt10_pcnn_att", "nyt10_pcnn_avg",
                                        "nyt10_pcnn_one"])
def test_salted_merge_all_aggregators(ray_session, model_name):
    """att (log-sum-exp rescale), avg (weighted mean) and one (max) all
    merge partials back to the unsplit score."""
    import ray.data as rd

    rows = [{"text": f"gamma {i % 53} delta stream {i}",
             "h_id": "H", "t_id": "T",
             "h_start": 0, "h_end": 5, "t_start": 9, "t_end": 14}
            for i in range(3_000)]
    df = pd.DataFrame(rows)
    key = ["relation"]
    salted = (bag_scores(rd.from_pandas(df).repartition(4), model_name,
                         oversize_threshold=256)
              .to_pandas().sort_values(key).reset_index(drop=True))
    direct = (bag_scores(rd.from_pandas(df).repartition(4), model_name,
                         oversize_threshold=None)
              .to_pandas().sort_values(key).reset_index(drop=True))
    np.testing.assert_allclose(salted["score"].to_numpy(),
                               direct["score"].to_numpy(),
                               rtol=1e-4, atol=1e-5)
    assert (salted["bag_size"] == 3_000).all()


def test_per_relation_metrics_matches_sequential(ray_session, sf_dir):
    """Distributed per-relation tp/fp/fn == a sequential replay of
    bag_eval's by_pair label/pred logic over the collected score rows."""
    from opennre_ray.pipelines.queries import (bag_per_relation_metrics,
                                               bag_relation_scores)

    got = bag_per_relation_metrics(sf_dir)
    rows = bag_relation_scores(sf_dir).to_pandas()

    # facts: argmax per pair, ties -> relation asc (bag_eval convention)
    facts = set()
    for (h, t), grp in rows.groupby(["h_id", "t_id"]):
        best = grp.sort_values(["score", "relation"],
                               ascending=[False, True]).iloc[0]
        facts.add((h, t, best["relation"]))
    want: dict = {}
    for r in rows.itertuples():
        lab = (r.h_id, r.t_id, r.relation) in facts
        prd = r.score >= 0.5
        tp, fp, fn, n, sm = want.setdefault(r.relation, [0, 0, 0, 0, 0])
        want[r.relation] = [tp + (lab and prd), fp + (prd and not lab),
                            fn + (lab and not prd), n + 1,
                            sm + round(float(r.score) * 1e6)]
    for row in got.itertuples():
        assert [row.tp, row.fp, row.fn, row.n_rows,
                row.score_sum_micro] == want[row.relation], row.relation
        denom_p = row.tp + row.fp
        if denom_p:
            assert row.precision == round(row.tp / denom_p, 12)
    assert set(got["relation"]) == set(want)
