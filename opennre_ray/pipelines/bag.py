"""Bag-level (distant supervision) pipeline: groupby entity pair → bag score.

Replaces the reference's load-time dict groupby + scope bookkeeping
(``data_loader.py:145-236``) with a coarse hash-bucket shuffle on
``(h_id, t_id)`` and vectorized per-bucket scoring: one chunked
``encode_batch``/forward over ALL bag members in the bucket, then a
segment-reduce per bag using scope offsets (the same machinery as the
batched bag trainer, ``training.py:536-558``). A bag never spans buckets,
so per-bucket aggregation is exact; Ray's per-group Python path (measured
28 s for 40k groups) is never touched.

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

# member sort inside a bag: content-deterministic so resampling picks the
# same members regardless of upstream partitioning / row order
_MEMBER_ORDER = ["text", "h_start", "t_start"]


def bag_seed(h_id, t_id) -> int:
    """Content-derived per-bag RNG seed.

    Python's ``hash()`` is salted per process (PYTHONHASHSEED), so it would
    make 'deterministic' resampling differ across workers/retries — a
    content hash keeps samples identical under any partitioning.
    """
    digest = hashlib.blake2b(f"{h_id}\x00{t_id}".encode(),
                             digest_size=4).digest()
    return int.from_bytes(digest, "little")


def _resample_indices(n: int, bag_size: int, h_id, t_id) -> np.ndarray:
    """Seeded member selection for one bag (G4), as positional indices into
    the bag's deterministically-sorted member order."""
    rng = np.random.default_rng(bag_seed(h_id, t_id))
    if n >= bag_size:
        idx = rng.choice(n, bag_size, replace=False)
    else:
        idx = np.concatenate([np.arange(n), rng.choice(n, bag_size - n)])
    return np.sort(idx)


class BagScorer:
    """Per-group scorer (one bag per call) — the slow reference path.

    Kept as the oracle the vectorized bucket path is pinned against in
    tests; production ``bag_scores`` uses ``BucketBagScorer``.
    """

    def __init__(self, model_name: str = "nyt10_pcnn_att",
                 bag_size: int = 0, rel2id: dict | None = None):
        self.model = get_model(model_name, rel2id=rel2id)
        self.agg = BAG_EVAL_AGGREGATORS[self.model.aggregator or "att"]
        self.bag_size = bag_size

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        h_id = group["h_id"].iloc[0]
        t_id = group["t_id"].iloc[0]
        group = group.sort_values(_MEMBER_ORDER, kind="mergesort")
        if self.bag_size > 0:
            group = group.iloc[_resample_indices(len(group), self.bag_size,
                                                 h_id, t_id)]
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


class BucketBagScorer:
    """Vectorized scorer for one hash bucket of many bags.

    Sort the bucket by bag key → bag boundaries become scope offsets →
    ONE chunked encode/forward over every member in the bucket → small
    per-bag aggregator reductions on representation slices. Encoding (the
    conv/transformer forward) dominates; it now runs at full batch width
    instead of once per tiny bag.
    """

    # numeric chunk size for encode/forward — same ~50 MB per-worker
    # working-set bound as RelationScorer.CHUNK (see stages/score.py)
    CHUNK = 256

    def __init__(self, model_name: str = "nyt10_pcnn_att",
                 bag_size: int = 0, rel2id: dict | None = None):
        self.model = get_model(model_name, rel2id=rel2id)
        self.agg = BAG_EVAL_AGGREGATORS[self.model.aggregator or "att"]
        self.bag_size = bag_size
        self.rel_names = [r for r in self.model.rel2id if r != "NA"]
        self.rel_ids = np.array([self.model.rel2id[r] for r in self.rel_names])

    def __call__(self, bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({"h_id": [], "t_id": [], "relation": [],
                                 "score": [], "bag_size": []})
        g = bucket.sort_values(["h_id", "t_id"] + _MEMBER_ORDER,
                               kind="mergesort").reset_index(drop=True)
        key = (g["h_id"].astype(str) + "\x00" + g["t_id"].astype(str)).to_numpy()
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(g)]

        if self.bag_size > 0:
            sel = np.concatenate([
                s + _resample_indices(e - s, self.bag_size,
                                      g["h_id"].iat[s], g["t_id"].iat[s])
                for s, e in zip(starts, ends)])
            g = g.iloc[sel].reset_index(drop=True)
            sizes = np.full(len(starts), self.bag_size)
            starts = np.arange(len(starts)) * self.bag_size
            ends = starts + self.bag_size
        else:
            sizes = ends - starts

        texts = g["text"].tolist()
        h = g[["h_start", "h_end"]].to_numpy()
        t = g[["t_start", "t_end"]].to_numpy()
        enc = self.model.encoder
        reps = []
        for off in range(0, len(g), self.CHUNK):
            chunk = enc.encode_batch(texts[off: off + self.CHUNK],
                                     h[off: off + self.CHUNK],
                                     t[off: off + self.CHUNK])
            reps.append(enc(chunk))
        rep = reps[0] if len(reps) == 1 else np.concatenate(reps)

        fc_w, fc_b, diag = (self.model.head.fc_w, self.model.head.fc_b,
                            self.model.diag)
        score_mat = np.empty((len(starts), len(self.rel_ids)),
                             dtype=np.float64)
        for bi, (s, e) in enumerate(zip(starts, ends)):
            score_mat[bi] = self.agg(rep[s:e], fc_w, fc_b,
                                     diag=diag)[self.rel_ids]

        n_rel = len(self.rel_names)
        return pd.DataFrame({
            "h_id": np.repeat(g["h_id"].to_numpy()[starts], n_rel),
            "t_id": np.repeat(g["t_id"].to_numpy()[starts], n_rel),
            "relation": np.tile(np.array(self.rel_names, dtype=object),
                                len(starts)),
            "score": score_mat.ravel(),
            "bag_size": np.repeat(sizes.astype(np.int64), n_rel),
        })


def bag_scores(instances_ds, model_name="nyt10_pcnn_att", bag_size=0,
               rel2id=None, n_buckets=None):
    """instances (text, h_id, h_start.., t_id, t_start..) → bag score rows.

    The coarse hash-bucket shuffle on (h_id, t_id) is the canonical
    exchange (SURVEY G1); scoring is vectorized per bucket. Skewed entity
    pairs (huge bags) are bounded by ``bag_size`` resampling when set.
    """
    from ..functions.relational import hash_bucket_aggregate
    from ..stages.score import cached

    rel_key = tuple(sorted(rel2id.items())) if rel2id else None

    def score_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        scorer = cached(
            ("bag_bucket", model_name, bag_size, rel_key),
            lambda: BucketBagScorer(model_name, bag_size, rel2id))
        return scorer(bucket)

    return hash_bucket_aggregate(instances_ds, ["h_id", "t_id"],
                                 score_bucket, n_buckets=n_buckets)
