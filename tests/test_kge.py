"""TransE KG-embedding training: distributed == sequential bit-exact;
training actually separates true from corrupted triples."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opennre_ray.functions.kge import (transe_train,
                                       transe_train_sequential)

TRIPLES = (
    [("C%d" % i, "in_nation", "N%d" % (i % 3)) for i in range(30)]
    + [("N%d" % i, "part_of", "R0") for i in range(3)]
)


@pytest.fixture(scope="module")
def triples_ds(ray_session):
    return rd.from_items([{"subj": s, "pred": p, "obj": o}
                          for s, p, o in TRIPLES]).repartition(4)


def test_transe_distributed_matches_sequential(triples_ds):
    """Fixed-point gradient accumulation makes the distributed epoch
    bit-identical to the sequential replay at any block count — exact
    frame equality, including float embeddings and integer losses."""
    e_d, r_d, loss_d = transe_train(triples_ds, dim=6, epochs=4, seed=3)
    e_s, r_s, loss_s = transe_train_sequential(TRIPLES, dim=6, epochs=4,
                                               seed=3)
    assert loss_d == loss_s
    pd.testing.assert_frame_equal(e_d, e_s)
    pd.testing.assert_frame_equal(r_d, r_s)


def test_transe_learns_ranking(triples_ds):
    """After training, the mean distance of TRUE triples is smaller than
    the mean distance under random tail corruption (the margin objective
    did its job), and per-epoch loss is finite and trends down."""
    e_df, r_df, losses = transe_train(triples_ds, dim=8, epochs=12,
                                      lr=0.1, seed=5)
    emb = {n: np.asarray(v) for n, v in zip(e_df["name"],
                                            e_df["embedding"])}
    rel = {n: np.asarray(v) for n, v in zip(r_df["name"],
                                            r_df["embedding"])}
    ents = sorted(emb)
    rng = np.random.default_rng(0)

    def dist(s, p, o):
        return float(((emb[s] + rel[p] - emb[o]) ** 2).sum())

    d_true = np.mean([dist(s, p, o) for s, p, o in TRIPLES])
    d_corrupt = np.mean([
        dist(s, p, ents[rng.integers(len(ents))])
        for s, p, _ in TRIPLES for _ in range(3)])
    assert d_true < d_corrupt
    assert losses[-1] <= losses[0]
    assert all(l >= 0 for l in losses)


def test_link_prediction_eval_matches_bruteforce(triples_ds):
    """Distributed eval == a straight numpy replay (same tie-rank
    definition), and a well-trained toy model beats the untrained
    init on MRR."""
    from opennre_ray.functions.kge import link_prediction_eval

    e_df, r_df, _ = transe_train(triples_ds, dim=8, epochs=12, lr=0.1,
                                 seed=5)
    got = link_prediction_eval(triples_ds, e_df, r_df, hits_k=5)

    names = list(e_df["name"])
    e_ix = {n: i for i, n in enumerate(names)}
    ent = np.stack([np.asarray(v) for v in e_df["embedding"]])
    rel = {n: np.asarray(v) for n, v in zip(r_df["name"],
                                            r_df["embedding"])}
    ranks = []
    for s, p, o in TRIPLES:
        d = ((ent - (ent[e_ix[s]] + rel[p])) ** 2).sum(axis=1)
        ti = e_ix[o]
        ranks.append(1 + int((d < d[ti]).sum())
                     + int((d[:ti] == d[ti]).sum()))
    n = len(ranks)
    assert got["n_triples"].iloc[0] == n
    assert got["hits_at_k"].iloc[0] == sum(r <= 5 for r in ranks)
    assert got["mean_rank_fp"].iloc[0] == int(
        np.floor(sum(ranks) * 1_000_000.0 / n + 0.5))
    assert got["mrr_fp"].iloc[0] == int(np.floor(
        sum(int(np.floor(1_000_000.0 / r + 0.5)) for r in ranks) / n
        + 0.5))

    # trained beats untrained init
    e0, r0, _ = transe_train(triples_ds, dim=8, epochs=0, seed=5)
    base = link_prediction_eval(triples_ds, e0, r0, hits_k=5)
    assert got["mrr_fp"].iloc[0] > base["mrr_fp"].iloc[0]
