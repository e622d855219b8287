"""Dawid-Skene weak-label aggregation: the distributed fixed-point EM
must equal a single-process pure-Python replay of the same arithmetic,
and the labeling functions must match their integer-threshold specs."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray.functions.weaklabel import (LABELERS, SCALE,
                                             dawid_skene, fit_params,
                                             posterior_chain,
                                             weak_label_signals,
                                             weak_labels_batch)


def test_signals_spec():
    # empty / whitespace-only: everything 0
    assert weak_label_signals("") == (0, 0, 0, 0)
    assert weak_label_signals("   ") == (0, 0, 0, 0)
    # 20 short distinct tokens with 2 stopwords: all four fire
    text = "the of " + " ".join(f"w{i}" for i in range(18))
    assert weak_label_signals(text) == (1, 1, 1, 1)
    # 19 tokens: len fails; one stopword: stop fails
    text = "the " + " ".join(f"w{i}" for i in range(18))
    assert weak_label_signals(text) == (0, 0, 1, 1)
    # all-same token: uniq fails (1 distinct of 20)
    assert weak_label_signals("the of " + "zz " * 18)[2] == 0
    # long words: wordlen fails (mean 10 > 4.5)
    text = "the of " + " ".join("abcdefghijkl" for _ in range(18))
    assert weak_label_signals(text)[3] == 0
    # uniq counts lowercased distinct: "AA aa" is 1 distinct of 2
    assert weak_label_signals("AA aa")[2] == 1
    assert weak_label_signals("AA bb")[2] == 1


def _slow_em(y: np.ndarray, rounds: int) -> pd.DataFrame:
    """Pure-Python int replay — no numpy in the EM arithmetic."""
    n, k = y.shape
    p = [(int(sum(r)) * SCALE) // k for r in y]
    hist = []
    for _ in range(rounds):
        s = sum(p)
        sb = n * SCALE - s
        clamp = lambda x: max(1, min(SCALE - 1, x))  # noqa: E731
        par = {
            "pi": clamp(s // n),
            "alpha": [clamp((sum(pi for pi, r in zip(p, y) if r[j])
                             * SCALE) // max(s, 1)) for j in range(k)],
            "beta": [clamp((sum(SCALE - pi for pi, r in zip(p, y)
                                if not r[j]) * SCALE) // max(sb, 1))
                     for j in range(k)]}
        hist.append(par)
        newp = []
        for row, _pi in zip(y, p):
            num, den = par["pi"], SCALE - par["pi"]
            for j in range(k):
                a, b = par["alpha"][j], par["beta"][j]
                if row[j]:
                    num, den = num * a, den * (SCALE - b)
                else:
                    num, den = num * (SCALE - a), den * b
                num, den = max(1, num // SCALE), max(1, den // SCALE)
            newp.append((num * SCALE) // (num + den))
        p = newp
    par = hist[-1]
    keep = sum(1 for v in p if 2 * v >= SCALE)
    flip = sum(1 for v, r in zip(p, y)
               if (2 * v >= SCALE) != (2 * int(sum(r)) >= k))
    return pd.DataFrame({
        "labeler": list(LABELERS),
        "n_said_keep": [int(y[:, j].sum()) for j in range(k)],
        "alpha_fp": par["alpha"], "beta_fp": par["beta"],
        "pi_fp": [par["pi"]] * k, "n_docs": [n] * k,
        "n_posterior_keep": [keep] * k, "n_flipped": [flip] * k})


@pytest.mark.parametrize("seed", [0, 7])
def test_distributed_em_matches_sequential(ray_session, seed):
    import ray

    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(300):
        n = int(rng.integers(0, 60))
        words = ["the", "of", "and", "data", "graph", "abcdefghijkl",
                 "x1", "zz"]
        texts.append(" ".join(rng.choice(words, size=n)) if n else "")
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    labels = (ray.data.from_pandas(df).repartition(7)
              .map_batches(weak_labels_batch, batch_format="pyarrow")
              .materialize())
    got = dawid_skene(labels, rounds=3)

    y = np.array([weak_label_signals(t) for t in texts], dtype=np.int64)
    want = _slow_em(y, rounds=3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"alpha_fp": np.int64,
                                           "beta_fp": np.int64}),
        want.astype(got.dtypes.to_dict()))


def test_posterior_chain_respects_params():
    """A labeler with perfect sensitivity/specificity dominates: docs it
    keeps get higher posterior than docs it drops, other votes equal."""
    y_keep = np.array([[1, 1, 0, 0]], dtype=np.int64)
    y_drop = np.array([[0, 1, 0, 0]], dtype=np.int64)
    par = {"pi": SCALE // 2,
           "alpha": [SCALE - 1, SCALE // 2, SCALE // 2, SCALE // 2],
           "beta": [SCALE - 1, SCALE // 2, SCALE // 2, SCALE // 2]}
    hi = posterior_chain(y_keep, [par])[0]
    lo = posterior_chain(y_drop, [par])[0]
    assert hi > lo
    assert 0 <= lo and hi <= SCALE


def test_fit_params_clamps():
    sums = {"S": 0, "A": [0] * 4, "B": [0] * 4}
    par = fit_params(sums, n_docs=10, k=4)
    assert par["pi"] == 1
    assert all(a == 1 for a in par["alpha"])
    assert all(1 <= b <= SCALE - 1 for b in par["beta"])
