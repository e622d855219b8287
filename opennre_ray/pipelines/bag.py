"""Bag-level (distant supervision) pipeline: groupby entity pair → bag score.

Replaces the reference's load-time dict groupby + scope bookkeeping
(``data_loader.py:145-236``) with a Ray Data ``groupby(['h_id','t_id'])``
hash shuffle and per-group aggregation. The 3-D padded tensors and ``scope``
offset arithmetic disappear: a group IS the bag.

Eval semantics (G6/G8/G9) per reference ``bag_attention.py:152-166``,
``bag_average.py:118-131``, ``bag_one.py:137-145``; prediction-row expansion
(one row per bag × non-NA relation) per ``bag_re.py:170-179`` (M17).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import hashlib

from ..models import BAG_EVAL_AGGREGATORS
from ..registry import get_model


def bag_seed(h_id, t_id) -> int:
    """Content-derived per-bag RNG seed.

    Python's ``hash()`` is salted per process (PYTHONHASHSEED), so it would
    make 'deterministic' resampling differ across workers/retries — a
    content hash keeps samples identical under any partitioning.
    """
    digest = hashlib.blake2b(f"{h_id}\x00{t_id}".encode(),
                             digest_size=4).digest()
    return int.from_bytes(digest, "little")


class BagScorer:
    """map_groups UDF over (h_id, t_id) groups.

    Per bag: encode members → encoder forward → chosen aggregator →
    one row per non-NA relation with its bag score (M17 expansion).
    Deterministic per-bag resampling to ``bag_size`` when set (G4), seeded
    by the bag key so results are stable under repartitioning
    (SURVEY §4 determinism note).
    """

    def __init__(self, model_name: str = "nyt10_pcnn_att",
                 bag_size: int = 0, rel2id: dict | None = None):
        self.model = get_model(model_name, rel2id=rel2id)
        self.agg = BAG_EVAL_AGGREGATORS[self.model.aggregator or "att"]
        self.bag_size = bag_size

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        h_id = group["h_id"].iloc[0]
        t_id = group["t_id"].iloc[0]
        if self.bag_size > 0:
            rng = np.random.default_rng(bag_seed(h_id, t_id))
            n = len(group)
            if n >= self.bag_size:
                idx = rng.choice(n, self.bag_size, replace=False)
            else:
                idx = np.concatenate(
                    [np.arange(n), rng.choice(n, self.bag_size - n)])
            group = group.iloc[np.sort(idx)]
        texts = group["text"].tolist()
        h = group[["h_start", "h_end"]].to_numpy()
        t = group[["t_start", "t_end"]].to_numpy()
        enc = self.model.encoder.encode_batch(texts, h, t)
        rep = self.model.encoder(enc)
        scores = self.agg(rep, self.model.head.fc_w, self.model.head.fc_b,
                          diag=self.model.diag)
        rel2id = self.model.rel2id
        rows = {"h_id": [], "t_id": [], "relation": [], "score": [],
                "bag_size": []}
        for rel, rid in rel2id.items():
            if rel == "NA":
                continue
            rows["h_id"].append(h_id)
            rows["t_id"].append(t_id)
            rows["relation"].append(rel)
            rows["score"].append(float(scores[rid]))
            rows["bag_size"].append(len(group))
        return pd.DataFrame(rows)


def bag_scores(instances_ds, model_name="nyt10_pcnn_att", bag_size=0,
               rel2id=None):
    """instances (text, h_id, h_start.., t_id, t_start..) → bag score rows.

    The groupby is the canonical shuffle (SURVEY G1). Skewed entity pairs
    (huge bags) are bounded by ``bag_size`` resampling when set.
    """
    scorer = BagScorer(model_name, bag_size, rel2id)

    def score_bag(group: pd.DataFrame) -> pd.DataFrame:
        return scorer(group)

    return instances_ds.groupby(["h_id", "t_id"]).map_groups(
        score_bag, batch_format="pandas")
