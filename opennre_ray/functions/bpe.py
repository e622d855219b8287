"""Distributed BPE vocabulary induction (Sennrich et al. 2016 — public).

The reference tokenizes with a FIXED WordPiece vocab (`tokenization.py`);
training-data pipelines also need to LEARN the subword vocabulary from the
corpus. Scale shape:

- pass 1 reduces the corpus to a word-frequency table — the only
  corpus-wide aggregation (bucketed, map-side Counter partials);
- every merge round then runs over the VOCABULARY table (distinct words),
  not the corpus: adjacent-symbol-pair counts are map-side partials per
  vocab block (already collapsed to distinct pairs before leaving the
  task), the driver reduces the kilobyte pair table and broadcasts the
  winning pair back into a vectorized rewrite pass. The vocabulary is
  re-materialized each round so round r+1 does not recompute rounds 1..r.

Determinism: the winning pair is (count DESC, left ASC, right ASC) — the
exact tie-break the sequential oracle in tests/test_bpe.py replays.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

END_OF_WORD = "</w>"


def word_frequencies(docs_ds, *, text_col: str = "text",
                     rows_hint: int | None = None):
    """Corpus word-frequency table: (word, freq). Map-side Counter
    partials collapse each block to its distinct words; one bucketed
    aggregate sums them — the shuffle moves vocabulary-sized frames."""
    from .relational import hash_bucket_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(t.split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "freq": pa.array(list(c.values()), pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False).agg(freq=("freq", "sum"))

    return hash_bucket_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], per_bucket, rows_hint=rows_hint)


def _merge_syms(syms: list[str], left: str, right: str,
                joined: str) -> list[str]:
    """One BPE merge applied to one symbol sequence (standard greedy
    left-to-right scan)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn(docs_ds, n_merges: int = 12, *, text_col: str = "text",
              rows_hint: int | None = None) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, left, right, cnt) — the artifact a subword tokenizer is
    built from. Each word is seeded as its characters plus an explicit
    ``</w>`` end-of-word symbol (word-boundary merges stay distinct from
    word-internal ones, per the original algorithm).

    Per round over the vocab table: distributed pair-count partials
    (weighted by word frequency, collapsed per block), a driver-side
    reduce of the kilobyte pair table, and a broadcast rewrite of the
    symbol sequences. Corpus text is touched exactly once, in pass 1.
    """
    vocab = word_frequencies(docs_ds, text_col=text_col,
                             rows_hint=rows_hint)

    def seed(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        syms = [list(w) + [END_OF_WORD] for w in words]
        return pa.table({
            "word": batch.column("word"),
            "freq": batch.column("freq"),
            "syms": pa.array(syms, pa.list_(pa.string()))})

    state = vocab.map_batches(seed, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        def pair_partial(batch: pa.Table) -> pa.Table:
            c: Counter = Counter()
            freqs = batch.column("freq").to_numpy(zero_copy_only=False)
            for f, syms in zip(freqs, batch.column("syms").to_pylist()):
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += int(f)
            ls, rs, cs = [], [], []
            for (a, b), n in c.items():
                ls.append(a)
                rs.append(b)
                cs.append(n)
            return pa.table({"left": pa.array(ls, pa.string()),
                             "right": pa.array(rs, pa.string()),
                             "cnt": pa.array(cs, pa.int64())})

        pairs = (state.map_batches(pair_partial, batch_format="pyarrow")
                 .to_pandas())
        if pairs.empty:
            break
        agg = (pairs.groupby(["left", "right"], as_index=False)
               .agg(cnt=("cnt", "sum"))
               .sort_values(["cnt", "left", "right"],
                            ascending=[False, True, True], kind="stable"))
        left, right, cnt = (agg.iloc[0]["left"], agg.iloc[0]["right"],
                            int(agg.iloc[0]["cnt"]))
        merges.append((rank, left, right, cnt))
        joined = left + right

        def apply(batch: pa.Table, left=left, right=right,
                  joined=joined) -> pa.Table:
            syms = [_merge_syms(s, left, right, joined)
                    for s in batch.column("syms").to_pylist()]
            return pa.table({
                "word": batch.column("word"),
                "freq": batch.column("freq"),
                "syms": pa.array(syms, pa.list_(pa.string()))})

        state = state.map_batches(apply,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"]) \
        .astype({"rank": np.int64, "cnt": np.int64})


def bpe_learn_sequential(texts: list[str], n_merges: int = 12) \
        -> pd.DataFrame:
    """Single-process oracle: identical math, no Ray — the
    distributed-vs-sequential parity target for tests."""
    wf = Counter()
    for t in texts:
        wf.update(t.split())
    state = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for rank in range(n_merges):
        c: Counter = Counter()
        for w, syms in state.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += f
        if not c:
            break
        (left, right), cnt = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, int(cnt)))
        joined = left + right
        state = {w: _merge_syms(s, left, right, joined)
                 for w, s in state.items()}
    return pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"]) \
        .astype({"rank": np.int64, "cnt": np.int64})


def bpe_apply_stats(docs_ds, merges: pd.DataFrame, *,
                    text_col: str = "text") -> pd.DataFrame:
    """Apply a learned merge table to the corpus and report subword
    statistics — the "tokenize with the trained vocab" step. Merges ship
    once via ``ray.put``; each worker memoizes word → subword-count
    (vocabulary-sized cache, same rationale as the scorer's worker
    cache), so the corpus pass is a stateless streaming map emitting
    integer partials. Returns one row: (n_docs, n_words, n_subwords).
    """
    import ray

    merge_list = list(zip(merges["left"], merges["right"]))
    ref = ray.put(merge_list)
    ref_key = ref.hex()

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        ml = cached(("bpe_merges", ref_key), lambda: ray.get(ref))
        memo = cached(("bpe_memo", ref_key), dict)

        def subwords(word: str) -> int:
            n = memo.get(word)
            if n is None:
                syms = list(word) + [END_OF_WORD]
                for left, right in ml:
                    syms = _merge_syms(syms, left, right, left + right)
                n = len(syms)
                memo[word] = n
            return n

        # vectorized split/explode; the Python-level encoder runs once
        # per UNIQUE word per batch (then memoized across batches)
        toks = batch.column(text_col).to_pandas().str.split().explode() \
            .dropna()
        vc = toks.value_counts()
        n_sub = sum(int(c) * subwords(w) for w, c in vc.items())
        return pa.table({
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_words": pa.array([int(len(toks))], pa.int64()),
            "n_subwords": pa.array([n_sub], pa.int64())})

    parts = docs_ds.map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_docs": pd.Series([int(parts["n_docs"].sum())], dtype=np.int64),
        "n_words": pd.Series([int(parts["n_words"].sum())],
                             dtype=np.int64),
        "n_subwords": pd.Series([int(parts["n_subwords"].sum())],
                                dtype=np.int64)})
