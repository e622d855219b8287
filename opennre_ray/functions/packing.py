"""Training-data assembly operators: sequence packing and deterministic
hash splits.

A 100 TB pretraining pipeline ends by (a) splitting the corpus into
train/held-out by a content-stable hash (no global shuffle, no state) and
(b) packing variable-length documents into fixed-token-budget sequences.
Both are expressed here so every row's assignment is a pure function of
the row (+ a partition key), which keeps them embarrassingly parallel AND
value-oracle-able in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_split(ds, key_col: str = "doc_id", train_frac: float = 0.8,
               salt: str = ""):
    """Deterministic train/test assignment: first 4 md5 bytes of
    ``salt + str(key)`` as a uniform u32 draw. Content-stable (adding or
    removing rows never reassigns others), stateless, and exactly
    reproducible by any engine with md5.
    """
    cut = split_cut(train_frac)

    def assign(batch: pa.Table) -> pa.Table:
        draws = split_draws(batch.column(key_col).to_pylist(), salt)
        split = pa.array(["train" if d < cut else "test" for d in draws],
                         pa.string())
        return batch.append_column("split", split)

    return ds.map_batches(assign, batch_format="pyarrow")


def split_cut(train_frac: float) -> int:
    """u32 acceptance cut for :func:`split_draws` (floor of frac·2^32)."""
    return int(train_frac * 4294967296)


def split_draws(keys, salt: str = "") -> np.ndarray:
    """The hash_split uniform draw (first 4 md5 bytes of salt+str(key)) —
    shared so compositions (e.g. the pretrain pipeline) cannot drift from
    ``docs_hash_split``'s oracle."""
    return np.array([int(hashlib.md5(
        (salt + str(k)).encode()).hexdigest()[:8], 16) for k in keys],
        dtype=np.uint64)


def stratified_sample(ds, strat_col: str, key_col: str = "doc_id",
                      salt: str = ""):
    """Deterministic down-sampling to equal stratum sizes (in expectation):
    stratum g keeps each row with probability min_count/count(g), decided by
    the same md5 draw as :func:`hash_split`.

    The acceptance cut is computed in INTEGER arithmetic
    (``min_count * 2^32 // count``) so any engine reproduces the exact row
    set. The draw is prefixed ``'strat:'`` so it is INDEPENDENT of
    :func:`hash_split`'s draw — with a shared hash family, sampling then
    splitting would send every surviving row of a down-sampled stratum to
    'train' (sampler keep ⊆ split-train whenever keep rate < train_frac).
    Scale shape: one tiny groupby for the counts, rates broadcast, then a
    stateless vectorized filter — the corpus itself never shuffles.
    """
    import ray
    from ray.data.aggregate import Count

    counts = ds.groupby(strat_col).aggregate(
        Count(alias_name="n")).to_pandas()
    if not len(counts):                 # empty input → empty sample
        return ds
    mn = int(counts["n"].min())
    cuts = {g: (mn << 32) // int(n)
            for g, n in zip(counts[strat_col], counts["n"])}
    ref = ray.put(cuts)

    def keep(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        keys = batch.column(key_col).to_pylist()
        strata = batch.column(strat_col).to_pylist()
        draws = [int(hashlib.md5(
            ("strat:" + salt + str(k)).encode()).hexdigest()[:8], 16)
            for k in keys]
        mask = pa.array([d < c[g] for d, g in zip(draws, strata)])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_sample(ds, strat_col: str, key_col: str = "doc_id",
                       alpha: float = 0.3, salt: str = ""):
    """Temperature-based stratum rebalancing (the multilingual-corpus
    sampling rule of mT5/XLM-R, public): stratum g's share of the output
    is proportional to count(g)**alpha, flattening the head without
    discarding the tail entirely. Cannot upsample, so keep-probability is
    normalized to 1 at the smallest stratum:
    ``q_g = (min_count / count(g)) ** (1 - alpha)``.

    The decision draw is the shared md5 family (prefix ``'temp:'``, so it
    is independent of hash_split's and stratified_sample's draws); the cut
    is ``floor(q_g * 2^32)`` — ``pow`` on both sides is the same libm, so
    the SQL replay selects the identical row set. Same scale shape as
    :func:`stratified_sample`: tiny groupby for counts, cuts broadcast,
    stateless vectorized filter; the corpus never shuffles.
    """
    import math

    import ray
    from ray.data.aggregate import Count

    counts = ds.groupby(strat_col).aggregate(
        Count(alias_name="n")).to_pandas()
    if not len(counts):
        return ds
    mn = float(counts["n"].min())
    cuts = {g: int(math.floor(
        math.pow(mn / float(n), 1.0 - alpha) * 4294967296.0))
        for g, n in zip(counts[strat_col], counts["n"])}
    ref = ray.put(cuts)

    def keep(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        keys = batch.column(key_col).to_pylist()
        strata = batch.column(strat_col).to_pylist()
        draws = [int(hashlib.md5(
            ("temp:" + salt + str(k)).encode()).hexdigest()[:8], 16)
            for k in keys]
        mask = pa.array([d < c[g] for d, g in zip(draws, strata)])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def chunk_windows(ds, size: int = 32, stride: int = 24,
                  key_col: str = "doc_id", text_col: str = "text"):
    """RAG-style document chunking: overlapping token windows of
    ``size`` tokens advancing by ``stride`` (the last window covers the
    tail and may be short; a doc of <= ``size`` tokens is one chunk;
    empty docs emit nothing). Stateless flat-map — each input row expands
    row-locally, so the operator streams at read bandwidth and chunk
    counts scale with document length, never corpus size.

    Output: (key_col, chunk_id, chunk_text, n_tokens); chunk boundaries
    replicate in SQL as list slices, so the op is value-oracle-able.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # stride > size would skip tokens AND the chunk-count formula
        # would emit an empty trailing chunk (found by the property
        # test); overlapping windows require stride <= size
        raise ValueError("stride must be <= size (overlapping windows)")

    def expand(batch: pa.Table) -> pa.Table:
        ids, cids, texts, lens = [], [], [], []
        keys = batch.column(key_col).to_pylist()
        for k, t in zip(keys, batch.column(text_col).to_pylist()):
            toks = t.split()
            n = len(toks)
            if not n:
                continue
            n_chunks = (1 if n <= size
                        else (n - size + stride - 1) // stride + 1)
            for c in range(n_chunks):
                start = c * stride
                end = min(start + size, n)
                ids.append(k)
                cids.append(c)
                texts.append(" ".join(toks[start:end]))
                lens.append(end - start)
        return pa.table({key_col: pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(cids, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string()),
                         "n_tokens": pa.array(lens, pa.int64())})

    return ds.map_batches(expand, batch_format="pyarrow")


def pack_sequences(ds, budget: int = 512, part_size: int = 1000,
                   key_col: str = "doc_id", text_col: str = "text"):
    """Greedy first-fit-in-order sequence packing within key-range
    partitions.

    Documents are processed in ``key`` order inside each partition
    (``key // part_size``); a sequence closes when the next document would
    exceed ``budget`` tokens (an over-budget document sits alone in its own
    sequence). Partition-local packing is the scale contract: packing is a
    serial fold, so the parallel unit is the partition, and sequence ids
    are (part_id, seq_id) pairs — no cross-partition coordination.

    Returns (doc_id, n_tokens, part_id, seq_id, seq_pos). If the input
    already carries an ``n_tokens`` column (an upstream stage counted),
    it is used as-is — no re-tokenization pass.
    """
    from .relational import hash_bucket_aggregate
    from .textstats import token_count_batch

    def counts(batch: pa.Table) -> pa.Table:
        if "n_tokens" in batch.column_names:
            t = batch.select([key_col, "n_tokens"])
        else:
            t = token_count_batch(batch)
        part = pa.compute.divide(
            batch.column(key_col).cast(pa.int64()),
            pa.scalar(part_size, pa.int64()))
        return t.append_column("part_id", part)

    counted = ds.map_batches(counts, batch_format="pyarrow")

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for part_id, grp in g.groupby("part_id", sort=True):
            grp = grp.sort_values(key_col)
            n = grp["n_tokens"].to_numpy()
            seq = np.empty(len(n), dtype=np.int64)
            pos = np.empty(len(n), dtype=np.int64)
            cur_seq, filled, cur_pos = 0, 0, 0
            for i, tok in enumerate(n):
                if i > 0 and filled + tok > budget:
                    cur_seq += 1
                    filled, cur_pos = 0, 0
                filled += tok
                seq[i] = cur_seq
                pos[i] = cur_pos
                cur_pos += 1
            out.append(grp.assign(seq_id=seq, seq_pos=pos))
        return pd.concat(out) if out else g.assign(
            seq_id=pd.Series(dtype="int64"), seq_pos=pd.Series(dtype="int64"))

    return hash_bucket_aggregate(counted, ["part_id"], pack_bucket)


def bottomk_sample(ds, key_col: str, id_col: str = "doc_id", k: int = 20,
                   salt: str = "", rows_hint: int | None = None):
    """Deterministic per-key bottom-k sample: for each ``key_col`` group,
    keep the ``k`` rows with the smallest md5 draw of the row id (ties —
    cryptographically negligible but oracle-relevant — broken by id).

    This is the order-independent equivalent of per-key reservoir
    sampling: the winner set is a pure function of the row ids, so it is
    content-stable under re-partitioning / re-ordering and exactly
    replayable in SQL (``row_number() OVER (PARTITION BY key ORDER BY
    draw, id) <= k``). Scale shape: a map-side partial bottom-k inside
    every batch bounds the shuffle to ≤ k rows per (block, key), then one
    bucketed shuffle finishes the exact per-key bottom-k — the corpus
    itself never moves, only candidate rows.
    """
    from .relational import hash_bucket_aggregate

    def draws_of(ids) -> np.ndarray:
        return np.array([int(hashlib.md5(
            ("bk:" + salt + str(i)).encode()).hexdigest()[:8], 16)
            for i in ids], dtype=np.int64)     # u32 range, int64-safe

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "draw", id_col], kind="mergesort")
        return df.groupby(key_col, as_index=False, sort=False).head(k)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(draw=pd.Series([], dtype="int64"))
        return head_k(df.assign(draw=draws_of(df[id_col])))

    candidates = ds.map_batches(partial, batch_format="pandas")
    return hash_bucket_aggregate(candidates, [key_col], head_k,
                                 rows_hint=rows_hint)


def topk_by_key(ds, key_col: str, score_col: str, id_col: str = "doc_id",
                k: int = 10, rows_hint: int | None = None):
    """Exact per-key top-k by a score column ("keep the k best docs per
    domain"), ties broken by smallest id. Same scale shape as
    :func:`bottomk_sample`: a map-side partial top-k inside every batch
    bounds the shuffle to ≤ k candidate rows per (block, key); one
    bucketed shuffle finishes the exact per-key top-k."""
    from .relational import hash_bucket_aggregate

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, score_col, id_col],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby(key_col, as_index=False, sort=False).head(k)

    candidates = ds.map_batches(head_k, batch_format="pandas")
    return hash_bucket_aggregate(candidates, [key_col], head_k,
                                 rows_hint=rows_hint)


def weighted_sample(ds, weight_col: str, id_col: str = "doc_id",
                    k: int = 100, salt: str = ""):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006, public): each row gets an exponential
    clock E = -ln(u)/w from an md5-derived uniform u and its weight w;
    the k smallest clocks are exactly a weight-proportional sample.

    Selection ranks on the 6-decimal-rounded clock with id tie-break, so
    the winner set is a pure function of (id, weight) — content-stable
    under re-partitioning and replayable in SQL (same md5 bytes, same
    formula, same rounding). Scale shape: each batch keeps only its k
    smallest clocks (map-side partial bottom-k), and the ≤ k·n_blocks
    candidate rows merge on the driver — the corpus never moves.
    Weights < 1 are clamped to 1 (zero-weight rows would divide by zero;
    a w=1 floor keeps empty docs sampleable at minimum weight).
    """
    def clocks(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(e=pd.Series([], dtype="float64"))
        u32 = np.array([int(hashlib.md5(
            ("ws:" + salt + str(i)).encode()).hexdigest()[:8], 16)
            for i in df[id_col]], dtype=np.float64)
        u = (u32 + 1.0) / 4294967296.0            # (0, 1] — ln never -inf
        w = np.maximum(df[weight_col].to_numpy(dtype=np.float64), 1.0)
        from .sqlcompat import sql_round
        df = df[[id_col, weight_col]].assign(e=sql_round(-np.log(u) / w, 6))
        return df.sort_values(["e", id_col], kind="mergesort").head(k)

    cand = ds.map_batches(clocks, batch_format="pandas").to_pandas()
    return (cand.sort_values(["e", id_col], kind="mergesort").head(k)
            .reset_index(drop=True))


def _md5_u64(s: str) -> int:
    """First 8 md5 digest bytes, big-endian — the repo's standard
    SQL-replayable u64 draw (``('0x'||substr(md5(s),1,16))::UBIGINT``)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _poisson1_cdf_u64() -> tuple:
    """u64 acceptance thresholds for a Poisson(1) draw from a uniform
    u64: weight w = #{k : u >= t_k}, k = 0..7 (tail mass beyond 8 is
    ~1e-8 per draw and folds into w=8). Both the engine and the SQL
    oracle consume these EXACT integers, so the weights agree bit-wise."""
    import math
    cdf, acc = [], 0.0
    for k in range(8):
        acc += 1.0 / math.factorial(k)
        cdf.append(int(math.exp(-1) * acc * 18446744073709551616.0))
    return tuple(cdf)


POISSON1_CDF_U64 = _poisson1_cdf_u64()


def bootstrap_params(n_replicas: int, salt: str = ""):
    """Per-replica (a, c) multiply-shift constants for the u64-wrap draw
    u = (a*h + c) mod 2^64 — the MinHash-permutation idiom, replayable
    in SQL. ``a`` is odd (bijective mod 2^64) and < 2^61 so the oracle's
    h·a product fits DuckDB's signed INT128."""
    a = np.array([(_md5_u64(f"bootA:{salt}:{b}") >> 3) | 1
                  for b in range(n_replicas)], dtype=np.uint64)
    c = np.array([_md5_u64(f"bootC:{salt}:{b}")
                  for b in range(n_replicas)], dtype=np.uint64)
    return a, c


def poisson_bootstrap_ci(ds, value_col: str, key_col: str, *,
                         n_replicas: int = 40, salt: str = "",
                         value_scale: int = 100) -> pd.DataFrame:
    """Poisson bootstrap: the web-scale bootstrap (each row enters
    replica b with an independent Poisson(1) multiplicity instead of the
    undistributable n-out-of-n multinomial resample — the standard trick
    for CIs over sharded data, e.g. Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google 2012).

    Fully deterministic and SQL-replayable: row r's replica-b weight
    comes from u = (a_b * md5_u64(key) + c_b) mod 2^64 compared against
    the integer Poisson(1) CDF thresholds (:data:`POISSON1_CDF_U64`);
    values quantize to ``value_scale`` integer units so every replica
    sum is an exact int64 under any partial-sum order. Each block emits
    only (n_replicas + 1) integer partial rows (the +1 is the exact
    full-sample sum for the point estimate); the CI is the nearest-rank
    2.5 / 97.5 percentile of the replica means. One driver fold over
    O(n_replicas x n_blocks) scalar rows — the corpus never collects.
    """
    B = n_replicas
    a, c = bootstrap_params(B, salt)
    thr = np.array(POISSON1_CDF_U64, dtype=np.uint64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"b": pd.Series([], dtype="int64"),
                                 "sw": pd.Series([], dtype="int64"),
                                 "swx": pd.Series([], dtype="int64")})
        h = np.array([_md5_u64(f"boot:{salt}:{k}") for k in df[key_col]],
                     dtype=np.uint64)
        cents = np.round(df[value_col].to_numpy(np.float64)
                         * value_scale).astype(np.int64)
        u = h[:, None] * a[None, :] + c[None, :]          # uint64 wrap
        w = (u[:, :, None] >= thr[None, None, :]).sum(2).astype(np.int64)
        out = pd.DataFrame({
            "b": np.arange(B, dtype=np.int64),
            "sw": w.sum(0), "swx": (w * cents[:, None]).sum(0)})
        out.loc[len(out)] = [-1, len(df), int(cents.sum())]
        return out.astype(np.int64)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("b", as_index=False)[["sw", "swx"]].sum()

    from .sqlcompat import sql_round
    full = agg[agg["b"] == -1].iloc[0]
    reps = agg[agg["b"] >= 0].reset_index(drop=True)
    assert (reps["sw"] > 0).all(), "degenerate replica (empty resample)"
    m = sql_round(reps["swx"].to_numpy(np.float64)
                  / reps["sw"].to_numpy(np.float64) / value_scale, 12)
    order = np.lexsort((reps["b"].to_numpy(), m))
    lo_rank = -(-25 * B // 1000)                       # ceil(0.025 * B)
    hi_rank = -(-975 * B // 1000)                      # ceil(0.975 * B)
    mean = sql_round(np.float64(full["swx"]) / np.float64(full["sw"])
                     / value_scale, 12)
    return pd.DataFrame({
        "mean": [float(mean)],
        "ci_lo": [float(m[order[lo_rank - 1]])],
        "ci_hi": [float(m[order[hi_rank - 1]])],
        "n_rows": np.array([full["sw"]], dtype=np.int64),
        "n_replicas": np.array([B], dtype=np.int64)})
