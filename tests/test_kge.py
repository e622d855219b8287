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
