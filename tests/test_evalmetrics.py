"""Metric tests (O1-O7) against hand-computed values."""

import numpy as np

from opennre_ray.pipelines.evalmetrics import (
    auc_trapezoid,
    bag_eval,
    detect_negative,
    sentence_eval,
    triple_prf,
)


def test_detect_negative():
    assert detect_negative({"NA": 0, "x": 1}) == 0
    assert detect_negative({"no_relation": 5, "x": 1}) == 5
    assert detect_negative({"x": 1}) is None


def test_sentence_eval_hand_computed():
    rel2id = {"NA": 0, "a": 1, "b": 2}
    gold = [1, 1, 2, 0, 0]
    pred = [1, 2, 2, 0, 1]
    # correct = 3 (idx 0, 2, 3); acc = 0.6
    # positives: gold !=0 → 3; pred != 0 → 4; correct positive = 2
    r = sentence_eval(gold, pred, rel2id)
    assert abs(r["acc"] - 0.6) < 1e-9
    assert abs(r["micro_p"] - 2 / 4) < 1e-9
    assert abs(r["micro_r"] - 2 / 3) < 1e-9
    f1 = 2 * 0.5 * (2 / 3) / (0.5 + 2 / 3)
    assert abs(r["micro_f1"] - f1) < 1e-9


def test_auc_trapezoid():
    x = np.array([0.0, 0.5, 1.0])
    y = np.array([1.0, 1.0, 0.0])
    assert abs(auc_trapezoid(x, y) - 0.75) < 1e-9


def test_bag_eval_pr_curve():
    facts = {("h1", "t1", "r1"), ("h2", "t2", "r2")}
    rel2id = {"NA": 0, "r1": 1, "r2": 2}
    rows = [
        {"h_id": "h1", "t_id": "t1", "relation": "r1", "score": 0.9},  # hit
        {"h_id": "h1", "t_id": "t1", "relation": "r2", "score": 0.8},  # miss
        {"h_id": "h2", "t_id": "t2", "relation": "r2", "score": 0.7},  # hit
    ]
    r = bag_eval(rows, facts, rel2id)
    # prec = [1, 1/2, 2/3], rec = [1/2, 1/2, 1]
    assert abs(r["mean_prec"] - np.mean([1, 0.5, 2 / 3])) < 1e-9
    f1s = [2 * 1 * .5 / 1.5, 2 * .5 * .5 / 1.0, 2 * (2 / 3) * 1 / (2 / 3 + 1)]
    assert abs(r["max_micro_f1"] - max(f1s)) < 1e-9
    assert r["best_threshold"] == 0.7
    assert r["p@100"] is None      # fewer than 100 rows
    # threshold 0.5 predictions: all 3 rows → tp=2, fp=1, fn=0
    assert abs(r["micro_p_05"] - 2 / 3) < 1e-9
    assert abs(r["micro_r_05"] - 1.0) < 1e-9


def test_triple_prf():
    pred = [("a", "r", "b"), ("c", "r", "d")]
    gold = [("a", "r", "b"), ("e", "r", "f")]
    r = triple_prf(pred, gold)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5


def test_bag_eval_distributed_matches_sequential(ray_session):
    """The distributed per-block PR pass (carried prefix offsets) must
    reproduce bag_eval exactly on a multi-block synthetic score set,
    where facts are the per-pair argmax relation on both sides."""
    import ray.data as rd

    from opennre_ray.pipelines.evalmetrics import bag_eval_distributed

    rng = np.random.default_rng(7)
    rels = ["NA", "r1", "r2", "r3"]
    rel2id = {r: i for i, r in enumerate(rels)}
    rows = []
    for pair in range(120):
        for rel in rels[1:]:
            rows.append({"h_id": f"H{pair}", "t_id": f"T{pair}",
                         "relation": rel,
                         "score": float(rng.uniform(0, 1))})
    facts = set()
    import pandas as pd
    df = pd.DataFrame(rows)
    for (h, t), g in df.groupby(["h_id", "t_id"]):
        best = g.loc[g["score"].idxmax()]
        facts.add((h, t, best["relation"]))
    seq = bag_eval(rows, facts, rel2id)
    dist = bag_eval_distributed(rd.from_items(rows).repartition(7), rel2id)
    assert set(seq) == set(dist)
    for k in seq:
        if seq[k] is None:
            assert dist[k] is None
        else:
            assert dist[k] == seq[k], (k, seq[k], dist[k])
