"""Weak-supervision label aggregation (Dawid & Skene 1979, binary) —
the label-model pass a training-data pipeline runs over its labeling
functions before any model sees the data: K cheap heuristic labelers
vote keep/drop per document, EM jointly estimates each labeler's
sensitivity/specificity and the per-document posterior, and the
posterior replaces the naive majority vote (a labeler that always says
"keep" gets down-weighted automatically).

Everything is FIXED-POINT integer arithmetic on a 1e-6 grid (floor
division on non-negative ints), so the whole EM — labeler signals,
per-round confusion parameters, per-document posterior chain — replays
bit-exactly in DuckDB HUGEINT (see queries.py::docs_weak_label_model's
oracle). No float enters at any point.

Scale shape: the label table is 5 small ints per document (computed in
ONE streaming pass over text, then materialized — it is ~40 bytes/doc,
corpus-text-independent). Each EM round is one map_batches pass
emitting a FIXED number of integer partial sums per block (2K + 2),
folded on the driver with Python ints (no overflow at any corpus
size); the per-document posterior is re-derived row-locally from the
labels + the broadcast parameter history, so no per-document state is
ever shuffled or collected. Rounds are O(R) passes over the tiny label
table, not over the text.

Reference behavior anchor: the reference's eval/aggregation passes are
driver-side loops (/root/reference/opennre/framework/data_loader.py);
this operator is an engine addition with no reference counterpart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000          # fixed-point grid (micro-units)

#: the ten stopwords shared with textstats._STOPWORDS (kept literal here
#: so the SQL oracle's IN-list and this set cannot drift separately).
_STOP10 = ("the", "a", "an", "of", "and", "or", "in", "on", "to", "is")

LABELERS = ("len", "stop", "uniq", "wordlen")   # sorted, fixed order


def weak_label_signals(text: str) -> tuple[int, int, int, int]:
    """(y_len, y_stop, y_uniq, y_wordlen) — four integer-threshold
    labeling functions, each 1=keep / 0=drop, all row-local and
    expressible as exact integer comparisons (no float ratios):

    - len:     ≥20 whitespace tokens
    - stop:    ≥2 distinct lowercase tokens from the 10-word stoplist
    - uniq:    ≥50% distinct lowercased tokens (2·n_distinct ≥ n)
    - wordlen: mean token length ≤ 4.5 chars (2·Σ|w| ≤ 9·n)
    """
    toks = text.split()
    n = len(toks)
    y_len = int(n >= 20)
    y_stop = int(len({w.lower() for w in toks
                      if w.lower() in _STOP10}) >= 2)
    y_uniq = int(n > 0 and 2 * len({w.lower() for w in toks}) >= n)
    y_wordlen = int(n > 0 and 2 * sum(len(w) for w in toks) <= 9 * n)
    return y_len, y_stop, y_uniq, y_wordlen


def weak_labels_batch(batch: pa.Table) -> pa.Table:
    """doc_id + the four labeler votes as int64 columns."""
    texts = batch.column("text").to_pylist()
    cols = {f"y_{name}": np.empty(len(texts), dtype=np.int64)
            for name in LABELERS}
    for i, t in enumerate(texts):
        yl, ys, yu, yw = weak_label_signals(t)
        cols["y_len"][i] = yl
        cols["y_stop"][i] = ys
        cols["y_uniq"][i] = yu
        cols["y_wordlen"][i] = yw
    return pa.table({"doc_id": batch.column("doc_id"),
                     **{k: pa.array(v) for k, v in cols.items()}})


def _clamp_param(x: int) -> int:
    return max(1, min(SCALE - 1, x))


def posterior_chain(y: np.ndarray, params: list[dict]) -> np.ndarray:
    """Replay the per-document posterior chain from the vote matrix
    ``y`` (n×K int64) through the parameter history (one dict per
    completed round: {"pi": int, "alpha": [K], "beta": [K]}). Returns
    the fixed-point posterior after the last round (or the majority-
    fraction init when ``params`` is empty). Vectorized; every op is
    the same floor-div-on-nonneg the SQL oracle uses."""
    n, k = y.shape
    p = (y.sum(axis=1, dtype=np.int64) * SCALE) // k
    for par in params:
        num = np.full(n, par["pi"], dtype=np.int64)
        den = np.full(n, SCALE - par["pi"], dtype=np.int64)
        for j in range(k):
            a, b = par["alpha"][j], par["beta"][j]
            yes = y[:, j] == 1
            num = np.where(yes, num * a, num * (SCALE - a)) // SCALE
            den = np.where(yes, den * (SCALE - b), den * b) // SCALE
            np.maximum(num, 1, out=num)
            np.maximum(den, 1, out=den)
        p = (num * SCALE) // (num + den)
    return p


def fit_params(sums: dict, n_docs: int, k: int) -> dict:
    """One M-step from the folded integer sums:
    sums = {"S": Σp, "A": [Σ p·y_j], "B": [Σ (SCALE−p)·(1−y_j)]}."""
    s = sums["S"]
    sb = n_docs * SCALE - s
    pi = _clamp_param(s // n_docs)
    alpha = [_clamp_param((sums["A"][j] * SCALE) // max(s, 1))
             for j in range(k)]
    beta = [_clamp_param((sums["B"][j] * SCALE) // max(sb, 1))
            for j in range(k)]
    return {"pi": pi, "alpha": alpha, "beta": beta}


def dawid_skene(labels_ds, *, rounds: int = 3) -> pd.DataFrame:
    """Run ``rounds`` EM rounds over a materialized label dataset
    (columns doc_id, y_alpha, y_digit, y_len, y_stop) and report the
    final per-labeler confusion parameters plus posterior summary —
    4 rows × 8 exact-integer/string columns.

    Each round is one distributed pass emitting 2K+3 integer partials
    per block; the posterior chain is re-derived from the broadcast
    parameter history so no per-doc state persists between passes.
    """
    k = len(LABELERS)
    ycols = [f"y_{n}" for n in LABELERS]

    def partials(batch: pa.Table, params: list[dict]) -> pa.Table:
        y = np.stack([batch.column(c).to_numpy(zero_copy_only=False)
                      for c in ycols], axis=1).astype(np.int64)
        p = posterior_chain(y, params)
        out = {"n": [y.shape[0]], "S": [int(p.sum())]}
        for j, name in enumerate(LABELERS):
            out[f"A_{name}"] = [int((p * y[:, j]).sum())]
            out[f"B_{name}"] = [int(((SCALE - p) * (1 - y[:, j])).sum())]
            out[f"V_{name}"] = [int(y[:, j].sum())]
        maj = (2 * y.sum(axis=1) >= k).astype(np.int64)
        post = (2 * p >= SCALE).astype(np.int64)
        out["keep"] = [int(post.sum())]
        out["flip"] = [int((post != maj).sum())]
        return pa.table(out)

    history: list[dict] = []
    n_docs = 0
    final = None
    for _ in range(rounds + 1):          # last pass only counts keep/flip
        hist = list(history)
        folded = labels_ds.map_batches(
            lambda b, h=hist: partials(b, h),
            batch_format="pyarrow").to_pandas()
        n_docs = int(folded["n"].sum())
        sums = {"S": int(folded["S"].sum()),
                "A": [int(folded[f"A_{n}"].sum()) for n in LABELERS],
                "B": [int(folded[f"B_{n}"].sum()) for n in LABELERS]}
        final = folded
        if len(history) < rounds:
            history.append(fit_params(sums, n_docs, k))

    par = history[-1]
    return pd.DataFrame({
        "labeler": list(LABELERS),
        "n_said_keep": [int(final[f"V_{n}"].sum()) for n in LABELERS],
        "alpha_fp": par["alpha"],
        "beta_fp": par["beta"],
        "pi_fp": [par["pi"]] * k,
        "n_docs": [n_docs] * k,
        "n_posterior_keep": [int(final["keep"].sum())] * k,
        "n_flipped": [int(final["flip"].sum())] * k,
    }).astype({c: np.int64 for c in
               ("n_said_keep", "alpha_fp", "beta_fp", "pi_fp", "n_docs",
                "n_posterior_keep", "n_flipped")})
