"""Mergeable sketches: heavy hitters (Misra-Gries) and HyperLogLog.

The scale pattern for approximate aggregation (Ray guide: "emit one
serialized sketch per batch and merge them in a second, tiny stage"):
vectorized per-batch sketch build → tiny all-to-all of sketches → driver
(or single-task) merge. Both sketches here have the standard mergeability
proofs: Misra-Gries summaries merge by counter addition + trim (Agarwal et
al. 2012), HLL registers merge by elementwise max (Flajolet et al. 2007).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def mg_sketch(items, k: int) -> dict[str, int]:
    """Misra-Gries summary with k counters over an item stream."""
    counters: dict[str, int] = {}
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def mg_merge(sketches, k: int) -> dict[str, int]:
    """Merge summaries: add counters, then subtract the (k+1)-th largest."""
    total: Counter = Counter()
    for sk in sketches:
        total.update(sk)
    if len(total) <= k:
        return dict(total)
    values = sorted(total.values(), reverse=True)
    cut = values[k]
    return {key: c - cut for key, c in total.items() if c > cut}


def heavy_hitters(ds, column: str, k: int = 10, counters: int = 64):
    """Approximate top-k frequent values of a column.

    Guarantee: any value with true frequency > n/counters survives; counts
    are under-estimates by at most n/counters. Returns a pa.Table
    (value, approx_count) sorted desc — verify against exact counts in
    tests, not SQL (the sketch is deliberately approximate).
    """
    def per_batch(batch: pa.Table) -> pa.Table:
        sk = mg_sketch(batch.column(column).to_pylist(), counters)
        return pa.table({"value": pa.array(list(sk.keys()), pa.string()),
                         "cnt": pa.array(list(sk.values()), pa.int64())})

    # merge = counter addition (associative + commutative); each per-batch
    # summary under-counts by ≤ batch_n/counters, so sums keep the
    # guarantee. Summation runs DISTRIBUTED (the shuffle moves ≤ counters
    # rows per batch, never the vocabulary); only the summed candidate
    # table reaches the driver. Deterministic tie-break (cnt desc, value).
    from ray.data.aggregate import Sum

    summed = (ds.map_batches(per_batch, batch_format="pyarrow")
              .groupby("value").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    top = summed.sort_values(["cnt", "value"],
                             ascending=[False, True]).head(k)
    return pa.table({"value": pa.array(top["value"], pa.string()),
                     "approx_count": pa.array(top["cnt"].astype("int64"),
                                              pa.int64())})


def heavy_hitters_verified(ds, column: str, k: int = 10,
                           counters: int = 256):
    """EXACT top-k via the production candidate+verify pattern.

    Pass 1 streams Misra-Gries summaries; their counters are SUMMED
    DISTRIBUTED (a shuffle of ≤ ``counters`` rows per batch, never the
    vocabulary), and the candidate set is pruned on the driver with the MG
    error bound (err = n/counters): summed counts under-count true
    frequency by at most err, so a value whose (summed count + err) is
    below the k-th largest summed count cannot be in the true top-k. Pass
    2 streams the data again counting ONLY those candidates exactly.

    Exactness guard: the prune is only valid when the k-th summed count
    exceeds err (i.e. the top-k are genuinely heavy). On distributions too
    flat for the sketch to bound, this falls back to a full exact count —
    the vocabulary-wide shuffle is then unavoidable for an exact answer.
    Deterministic tie-break: (count desc, value asc).
    """
    import ray
    from ray.data.aggregate import Sum

    def per_batch(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_pylist()
        sk = mg_sketch(vals, counters)
        if not sk and vals:
            # a stream ending on a full-decrement flush drains the sketch
            # even though the batch was non-empty — keep a zero-count
            # carrier row so batch_n (and thus the error bound) stays exact
            sk = {vals[0]: 0}
        # the batch row count rides on the first summary row; summing the
        # column across batches reconstructs n without a second pass
        t = pa.table({"value": pa.array(list(sk.keys()), pa.string()),
                      "cnt": pa.array(list(sk.values()), pa.int64())})
        if t.num_rows == 0:             # genuinely empty batch
            return t.append_column("batch_n", pa.array([], pa.int64()))
        return t.append_column(
            "batch_n", pa.array([len(vals)] + [0] * (t.num_rows - 1),
                                pa.int64()))

    summed = (ds.map_batches(per_batch, batch_format="pyarrow")
              .groupby("value").aggregate(Sum("cnt", alias_name="cnt"),
                                          Sum("batch_n",
                                              alias_name="batch_n"))
              .to_pandas())
    n_total = int(summed["batch_n"].sum()) if len(summed) else 0
    err = n_total // counters
    kth = (summed["cnt"].nlargest(min(k, len(summed))).iloc[-1]
           if len(summed) else 0)
    cand_ref = (ray.put(pa.array(
        sorted(summed.loc[summed["cnt"] + err >= kth, "value"]), pa.string()))
        if kth > err else None)

    def count_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vals = batch.column(column).combine_chunks()
        if cand_ref is not None:        # exact-count candidates only
            vals = vals.filter(pc.is_in(vals, value_set=ray.get(cand_ref)))
        vc = pc.value_counts(vals)
        return pa.table({"value": vc.field("values"),
                         "cnt": vc.field("counts")})

    exact = (ds.map_batches(count_candidates, batch_format="pyarrow")
             .groupby("value").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    exact = exact.sort_values(["cnt", "value"],
                              ascending=[False, True]).head(k)
    return pa.table({"value": pa.array(exact["value"], pa.string()),
                     "cnt": pa.array(exact["cnt"].astype("int64"),
                                     pa.int64())})


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable by elementwise addition)
# ---------------------------------------------------------------------------

def _km_positions(items, k: int, mod: int) -> np.ndarray:
    """(N, k) probe positions via Kirsch-Mitzenmacher double hashing: one
    md5 per item, its two 64-bit halves combined as h1 + i*h2 (mod ``mod``).
    Shared by Bloom and Count-Min so the derivation cannot drift."""
    h1 = np.empty(len(items), dtype=np.uint64)
    h2 = np.empty(len(items), dtype=np.uint64)
    for i, it in enumerate(items):
        d = hashlib.md5(str(it).encode()).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big") | 1   # odd -> full period
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(mod)



class CountMin:
    """Count-Min sketch: ``depth`` rows × ``width`` counters.

    Point estimate = min over rows (always an OVER-estimate; error
    ≤ e·n/width with probability 1 - e^-depth). Merge = elementwise
    addition, so per-batch sketches built distributed combine exactly.
    Row hashes derive from one md5 per item (Kirsch-Mitzenmacher).
    """

    def __init__(self, width: int = 1 << 14, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _positions(self, items) -> np.ndarray:
        return _km_positions(items, self.depth, self.width)   # (N, depth)

    def add_many(self, items) -> "CountMin":
        if len(items):
            pos = self._positions(items)
            for r in range(self.depth):
                np.add.at(self.table[r], pos[:, r].astype(np.int64), 1)
        return self

    def estimate_many(self, items) -> np.ndarray:
        if not len(items):
            return np.zeros(0, dtype=np.int64)
        pos = self._positions(items)
        ests = np.stack([self.table[r][pos[:, r].astype(np.int64)]
                         for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, width: int = 1 << 14,
                   depth: int = 4) -> "CountMin":
        c = cls(width, depth)
        c.table = np.frombuffer(raw, dtype=np.int64).reshape(
            depth, width).copy()
        return c


def build_count_min(ds, column: str, width: int = 1 << 14,
                    depth: int = 4) -> CountMin:
    """Distributed CM build: one sketch per batch, added on the driver
    (each is depth×width×8 bytes regardless of input size)."""
    def per_batch(batch: pa.Table) -> pa.Table:
        c = CountMin(width, depth).add_many(
            batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([c.to_bytes()], pa.binary())})

    merged = CountMin(width, depth)
    for t in ds.map_batches(per_batch,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in t.column("sketch").to_pylist():
            merged.merge(CountMin.from_bytes(raw, width, depth))
    return merged


# ---------------------------------------------------------------------------
# Bloom filter (mergeable by OR)
# ---------------------------------------------------------------------------

class Bloom:
    """Bit-array Bloom filter with ``n_hashes`` md5-derived probes.

    No false negatives; false-positive rate ≈ (1 - e^(-kn/m))^k. Merge is
    bitwise OR, so per-batch filters built distributed combine exactly.
    One md5 per item yields all k probe positions — its two 64-bit halves
    combined via the Kirsch-Mitzenmacher double-hash trick.
    """

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 5):
        self.n_bits = n_bits
        self.k = n_hashes
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, items) -> np.ndarray:
        return _km_positions(items, self.k, self.n_bits)      # (N, k)

    def add_many(self, items) -> "Bloom":
        if len(items):
            pos = self._positions(items).ravel()
            np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return self

    def contains_many(self, items) -> np.ndarray:
        if not len(items):
            return np.zeros(0, dtype=bool)
        pos = self._positions(items)                   # (N, k)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def merge(self, other: "Bloom") -> "Bloom":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, n_bits: int = 1 << 20,
                   n_hashes: int = 5) -> "Bloom":
        b = cls(n_bits, n_hashes)
        b.bits = np.frombuffer(raw, dtype=np.uint8).copy()
        return b


def build_bloom(ds, column: str, n_bits: int = 1 << 20,
                n_hashes: int = 5, canon=None) -> Bloom:
    """Distributed Bloom build: one filter per batch, OR-merged on the
    driver (each is n_bits/8 bytes regardless of input size). ``canon``
    (optional) canonicalizes values before hashing — probes must apply
    the SAME transform."""
    def per_batch(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_pylist()
        if canon is not None:
            vals = canon(vals)
        b = Bloom(n_bits, n_hashes).add_many(vals)
        return pa.table({"sketch": pa.array([b.to_bytes()], pa.binary())})

    merged = Bloom(n_bits, n_hashes)
    for t in ds.map_batches(per_batch,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in t.column("sketch").to_pylist():
            merged.merge(Bloom.from_bytes(raw, n_bits, n_hashes))
    return merged


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% typical error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, items):
        hashes = np.fromiter(
            (int.from_bytes(hashlib.blake2b(str(it).encode(),
                                            digest_size=8).digest(), "little")
             for it in items), dtype=np.uint64, count=len(items))
        return self.add_hashes(hashes)

    def add_hashes(self, hashes: "np.ndarray"):
        """Fold pre-computed uint64 hashes (e.g. the repo's md5-derived
        ``_word_hash64``, which DuckDB can replay) into the registers."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rem = rest.copy()
        rank = np.ones(len(hashes), dtype=np.uint8)
        live = np.ones(len(hashes), dtype=bool)
        for _ in range(64 - self.p):
            top = (rem & mask) != 0
            done = live & top
            ranks[done] = rank[done]
            live &= ~top
            rem = rem << np.uint64(1)
            rank += 1
        ranks[live] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)          # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(raw, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Distributed approximate count-distinct: one HLL per batch, register
    max-merge on the driver (bytes are tiny: 2^p)."""
    def per_batch(batch: pa.Table) -> pa.Table:
        h = HLL(p).add_many(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HLL(p)
    for b in ds.map_batches(per_batch,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in b.column("sketch").to_pylist():
            merged.merge(HLL.from_bytes(raw, p))
    return merged.estimate()


# ---------------------------------------------------------------------------
# DDSketch — mergeable relative-error quantile sketch
# ---------------------------------------------------------------------------

class DDSketch:
    """Log-bucketed quantile sketch with relative-error guarantee
    (Masson et al., "DDSketch", VLDB 2019 — public algorithm).

    bucket(x) = ceil(ln x / ln γ); estimate for a bucket is the geometric
    midpoint 2γ^b/(γ+1), so every estimate is within (γ-1)/(γ+1) relative
    error of the true value. Chosen over KLL/t-digest because it is fully
    DETERMINISTIC and order-independent: per-batch bucket counts merge by
    plain addition, results are identical at any parallelism, and the
    whole computation is SQL-replayable (hash-oracle-able). Positive
    values only (zeros/negatives counted separately as ``n_nonpos`` and
    excluded from quantiles, matching the SQL oracle's WHERE x > 0).
    """

    def __init__(self, gamma: float = 1.02):
        if gamma <= 1.0:
            raise ValueError("gamma must be > 1")
        self.gamma = gamma
        self._lg = np.log(gamma)
        self.counts: dict[int, int] = {}
        self.n_nonpos = 0

    def add_many(self, values) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        pos = v[v > 0]
        self.n_nonpos += int(v.size - pos.size)
        if pos.size:
            buckets = np.ceil(np.log(pos) / self._lg).astype(np.int64)
            uniq, cnt = np.unique(buckets, return_counts=True)
            for b, c in zip(uniq.tolist(), cnt.tolist()):
                self.counts[b] = self.counts.get(b, 0) + int(c)
        return self

    def merge(self, other: "DDSketch") -> "DDSketch":
        for b, c in other.counts.items():
            self.counts[b] = self.counts.get(b, 0) + c
        self.n_nonpos += other.n_nonpos
        return self

    @property
    def n(self) -> int:
        return sum(self.counts.values())

    def quantile(self, q: float) -> float:
        """Smallest bucket whose cumulative count reaches ceil(q·n) —
        the same integer rank rule as the exact per-group quantiles
        (quantile_disc semantics over buckets)."""
        if not self.counts:
            return float("nan")
        rank = max(1, int(np.ceil(q * self.n)))
        cum = 0
        for b in sorted(self.counts):
            cum += self.counts[b]
            if cum >= rank:
                return 2.0 * self.gamma ** b / (self.gamma + 1.0)
        raise AssertionError("unreachable")


def dd_quantiles(ds, column: str, qs=(0.5, 0.95),
                 gamma: float = 1.02) -> dict[float, float]:
    """Distributed approximate quantiles: one DDSketch per batch, count
    merge on the driver (sketch size is O(log(max/min)/log γ) buckets —
    kilobytes regardless of input size)."""
    import pyarrow as pa

    def per_batch(batch: pa.Table) -> pa.Table:
        sk = DDSketch(gamma).add_many(
            batch.column(column).to_numpy(zero_copy_only=False))
        items = sorted(sk.counts.items())
        return pa.table({
            "bucket": pa.array([b for b, _ in items], pa.int64()),
            "n": pa.array([c for _, c in items], pa.int64()),
        })

    merged = DDSketch(gamma)
    for b in ds.map_batches(per_batch,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for bk, c in zip(b.column("bucket").to_pylist(),
                         b.column("n").to_pylist()):
            merged.counts[bk] = merged.counts.get(bk, 0) + c
    return {q: merged.quantile(q) for q in qs}


def exact_int_quantile(ds, column: str, q_num: int = 1,
                       q_den: int = 2) -> int:
    """Exact quantile of a bounded-cardinality INTEGER column via a
    distributed value histogram — the exact companion to ``dd_quantiles``
    (use DDSketch when the value domain is unbounded/continuous).

    Definition (integer-exact, SQL-replayable): the smallest value whose
    cumulative count reaches ``ceil(n * q_num / q_den)`` in ascending
    value order. Scale shape: map-side ``value_counts`` collapses every
    block to its distinct values before one groupby; only the histogram
    — sized by the value DOMAIN (e.g. token counts ≤ max doc length),
    not the row count — reaches the driver.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].value_counts()
        return pd.DataFrame({"v": vc.index.astype("int64"),
                             "c": vc.to_numpy(dtype="int64")})

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    # an all-empty input aggregates to a schema-less empty frame
    if not len(hist) or "v" not in hist.columns:
        raise ValueError("exact_int_quantile on an empty dataset")
    hist = hist.sort_values("v")
    total = int(hist["c"].sum())
    rank = -(-total * q_num // q_den)          # ceil, pure integers
    cum = hist["c"].cumsum()
    return int(hist.loc[cum >= rank, "v"].iloc[0])


def exact_int_quantiles(ds, column: str, n_parts: int) -> list[int]:
    """The n_parts−1 interior exact quantiles (i/n_parts for i=1..n−1)
    from ONE distributed histogram pass — same integer-exact definition
    as ``exact_int_quantile`` (smallest value whose cumulative count
    reaches ceil(n·i/n_parts)), shared so range-partition boundaries cost
    a single pass regardless of the partition count.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].value_counts()
        return pd.DataFrame({"v": vc.index.astype("int64"),
                             "c": vc.to_numpy(dtype="int64")})

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if not len(hist) or "v" not in hist.columns:
        raise ValueError("exact_int_quantiles on an empty dataset")
    hist = hist.sort_values("v")
    total = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for i in range(1, n_parts):
        rank = (total * i + n_parts - 1) // n_parts     # ceil
        out.append(int(hist.loc[cum >= rank, "v"].iloc[0]))
    return out


def join_size_estimate(ds_l, ds_r, col_l: str, col_r: str, *,
                       width: int = 1 << 12, depth: int = 4,
                       rows_hint: int | None = None):
    """Join-cardinality estimation by Count-Min inner product (Cormode &
    Muthukrishnan 2005, §4.2): |L ⋈ R| is estimated as
    min over rows r of sum_c CM_L[r,c] * CM_R[r,c] — an always-over
    estimate, like the point query. This is the planning preflight that
    pairs with ``key_skew_profile``: before shuffling two corpus-scale
    tables, two fixed-size sketch scans bound the output volume.

    Both sketches build distributed (one depth×width partial per batch,
    merged by addition); the exact size — sum over matching keys of
    n_l(k)*n_r(k) — runs as two bucketed per-key counts + one bucketed
    join + scalar partials, and rides along so the estimate is
    value-audited in the same row. All integers except the 12-dp
    relative error. md5-KM hashing makes the sketch itself replayable
    in SQL (HUGEINT wrap arithmetic), so the oracle checks the
    ESTIMATE too, not just the exact count.

    Overflow bound: row inner products are sums of count products —
    int64-exact while |L|·|R|/width < 2^63 per hash row.

    Returns one row: (exact_pairs, cm_estimate, rel_err).
    """
    from .relational import hash_bucket_aggregate, shuffle_join
    from .sqlcompat import sql_round

    cm_l = build_count_min(ds_l, col_l, width, depth)
    cm_r = build_count_min(ds_r, col_r, width, depth)
    est = min(int((cm_l.table[r].astype(object)
                   * cm_r.table[r].astype(object)).sum())
              for r in range(depth))

    def count_bucket(name):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("k", as_index=False).size()
            return pd.DataFrame({"k": out["k"].to_numpy(np.int64),
                                 name: out["size"].to_numpy(np.int64)})
        return fn

    def keyed(ds, col):
        return ds.map_batches(
            lambda t, c=col: pa.table({"k": t.column(c).cast(pa.int64())}),
            batch_format="pyarrow")

    cl = hash_bucket_aggregate(keyed(ds_l, col_l), ["k"],
                               count_bucket("c1"), rows_hint=rows_hint)
    cr = hash_bucket_aggregate(keyed(ds_r, col_r), ["k"],
                               count_bucket("c2"), rows_hint=rows_hint)
    joined = shuffle_join(cl, cr, "k", "k", ["c1"], ["c2"],
                          rows_hint=rows_hint)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p": [np.int64(
            (g["c1"].to_numpy(np.int64)
             * g["c2"].to_numpy(np.int64)).sum())]})

    exact = int(joined.map_batches(
        partial, batch_format="pandas").to_pandas()["p"].sum())
    rel = float(sql_round((est - exact) / float(exact), 12)) if exact \
        else 0.0
    return pd.DataFrame({
        "exact_pairs": pd.Series([exact], dtype="int64"),
        "cm_estimate": pd.Series([est], dtype="int64"),
        "rel_err": pd.Series([rel], dtype="float64")})
