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
