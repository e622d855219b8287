"""Distributed EXACT nonparametric statistics over integer-quantized
values: two-sample Kolmogorov-Smirnov, Mann-Whitney U (tie-corrected),
and Spearman rank correlation.

Every statistic here reduces to prefix sums over the sorted table of
DISTINCT values with per-group counts, so the distributed shape is

    per-block partial groupby  ->  hash-bucket distinct-value counts
    ->  one global sort of the (much smaller) distinct table
    ->  per-block slices stitched with carried prefix offsets
        (the ``bag_eval_distributed`` / ``streaming.running_totals``
        pattern -- only per-block scalars reach the driver).

All rank arithmetic stays in int64 (DOUBLED midranks keep the halves
integral: a distinct value with ``prev`` smaller rows and tie count
``t`` has midrank ``prev + (t+1)/2``, i.e. ``2*midrank = 2*prev+t+1``).
The single final float per statistic mirrors its DuckDB oracle
expression shape operation-for-operation (int -> double casts, then
the identical multiply/divide/sqrt order) and is rounded to 12
decimals per the repo's pinned-float rule.

Reference capability parity: the reference computes its order
statistics driver-side after collecting all scores
(/root/reference/opennre/framework/data_loader.py:251-277); these are
the same order-statistics primitives kept distributed, plus the
classical two-sample drift tests a training-data pipeline runs
between crawl snapshots.

Scale notes: the shuffle volume is one bucketed aggregate over the
input plus one sort of the distinct-value table (<= input rows, and
typically far smaller for quantized metrics); per-block slice tasks
return O(1) scalars. int64 bounds: with n rows, the doubled-rank
moment partials stay under ``n * (2n)^2`` per block and the final
folds run in Python ints (arbitrary precision) on the driver, exactly
like the HUGEINT casts in the oracle SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import hash_bucket_aggregate
from .sqlcompat import sql_round


def _distinct_sorted_counts(ds, v_col: str, sum_cols: list[str],
                            partial_fn, rows_hint: int | None = None):
    """Map-side partial counts -> bucketed exact per-distinct-value sums
    -> one global ascending sort. Returns the materialized sorted
    Dataset (block order == value order, the invariant the stitched
    prefix passes rely on)."""
    part = ds.map_batches(partial_fn, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(v_col, as_index=False)[sum_cols].sum()

    counts = hash_bucket_aggregate(part, [v_col], merge,
                                   rows_hint=rows_hint)
    return counts.sort(v_col).materialize()


def _block_int_sums(refs, cols: list[str]):
    """One tiny remote per block: int sums of ``cols`` (driver receives
    len(refs) x len(cols) ints, never rows)."""
    import ray

    @ray.remote
    def sums(t: pa.Table, cols=tuple(cols)):
        if t.num_rows == 0 or t.schema.names == []:
            return [0] * len(cols)
        return [int(np.asarray(
            t.column(c).to_numpy(zero_copy_only=False),
            dtype=np.int64).sum()) for c in cols]

    return ray.get([sums.remote(r) for r in refs])


def _exclusive_prefix(per_block: list[list[int]]):
    """Exclusive prefix offsets per column across block order."""
    if not per_block:
        return [], []
    arr = np.asarray(per_block, dtype=np.int64)
    offs = np.vstack([np.zeros((1, arr.shape[1]), np.int64),
                      np.cumsum(arr, axis=0)[:-1]])
    return offs, arr.sum(axis=0)


def _two_group_partial(v_col: str):
    """Per-batch partial: rows (v, n1, n2) summed per distinct v. The
    input batch must carry integer ``v`` and 0/1 ``g`` columns."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({v_col: pd.Series([], dtype="int64"),
                                 "n1": pd.Series([], dtype="int64"),
                                 "n2": pd.Series([], dtype="int64")})
        g = df["g"].to_numpy(np.int64)
        out = pd.DataFrame({v_col: df[v_col].to_numpy(np.int64),
                            "n1": g, "n2": 1 - g})
        return out.groupby(v_col, as_index=False).sum()

    return partial


def ks_two_sample(ds, rows_hint: int | None = None) -> dict:
    """Exact two-sample Kolmogorov-Smirnov over a Dataset with columns
    ``v`` (int64 quantized value) and ``g`` (1 = sample one, 0 = sample
    two). Returns the integer cross-multiplied statistic
    ``d_num = max |c1*N2 - c2*N1|`` (so ``D = d_num/(N1*N2)`` exactly),
    the smallest value attaining it, and D rounded to 12 decimals."""
    import ray

    counts = _distinct_sorted_counts(
        ds, "v", ["n1", "n2"], _two_group_partial("v"),
        rows_hint=rows_hint)
    refs = counts.to_arrow_refs()
    per = _block_int_sums(refs, ["n1", "n2"])
    offs, totals = _exclusive_prefix(per)
    n1_tot, n2_tot = int(totals[0]), int(totals[1])

    @ray.remote
    def block_max(t: pa.Table, o1: int, o2: int,
                  big1: int, big2: int):
        if t.num_rows == 0:
            return (-1, 0)
        n1 = np.asarray(t.column("n1").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        n2 = np.asarray(t.column("n2").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        v = np.asarray(t.column("v").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        c1 = o1 + np.cumsum(n1)
        c2 = o2 + np.cumsum(n2)
        diff = np.abs(c1 * big2 - c2 * big1)
        i = int(diff.argmax())          # first occurrence = min value
        return (int(diff[i]), int(v[i]))

    slices = ray.get([
        block_max.remote(r, int(o[0]), int(o[1]), n1_tot, n2_tot)
        for r, o in zip(refs, offs)])
    d_num, at = max(slices, key=lambda s: (s[0], -s[1]))
    ks_d = float(sql_round(d_num / (n1_tot * n2_tot), 12))
    return {"n1": n1_tot, "n2": n2_tot, "d_num": int(d_num),
            "ks_at": int(at), "ks_d": ks_d}


def mann_whitney(ds, rows_hint: int | None = None) -> dict:
    """Exact tie-corrected Mann-Whitney U over a Dataset with columns
    ``v`` (int64) and ``g`` (1/0 group flag). Integer invariants:
    ``two_r1`` (doubled rank-sum of group 1), ``u1_x2 = 2*U1``, and the
    tie term ``sum(t^3 - t)``; the normal-approximation z mirrors the
    oracle's double expression and rounds to 12 decimals."""
    import ray

    counts = _distinct_sorted_counts(
        ds, "v", ["n1", "n2"], _two_group_partial("v"),
        rows_hint=rows_hint)
    refs = counts.to_arrow_refs()

    @ray.remote
    def block_tot(t: pa.Table):
        if t.num_rows == 0:
            return (0, 0)
        n1 = np.asarray(t.column("n1").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        n2 = np.asarray(t.column("n2").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        return (int(n1.sum()), int((n1 + n2).sum()))

    per = ray.get([block_tot.remote(r) for r in refs])
    n1_tot = int(sum(p[0] for p in per))
    t_tot = int(sum(p[1] for p in per))
    n2_tot = t_tot - n1_tot
    t_offs = np.concatenate([[0], np.cumsum(
        [p[1] for p in per])[:-1]]).astype(np.int64) if per else []

    @ray.remote
    def block_rank(t: pa.Table, prev0: int):
        if t.num_rows == 0:
            return (0, 0)
        n1 = np.asarray(t.column("n1").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        tt = n1 + np.asarray(t.column("n2").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        prev = prev0 + np.cumsum(tt) - tt      # exclusive prefix
        two_r1 = int((n1 * (2 * prev + tt + 1)).sum())
        ties = int((tt ** 3 - tt).sum())
        return (two_r1, ties)

    parts = ray.get([block_rank.remote(r, int(o))
                     for r, o in zip(refs, t_offs)])
    two_r1 = sum(p[0] for p in parts)
    tie_sum = sum(p[1] for p in parts)
    n = n1_tot + n2_tot
    u1_x2 = two_r1 - n1_tot * (n1_tot + 1)
    dev_x2 = u1_x2 - n1_tot * n2_tot
    var_num = n1_tot * n2_tot * ((n + 1) * n * (n - 1) - tie_sum)
    # mirror the oracle: HUGEINT::DOUBLE, then /(12.0*n*(n-1)), sqrt
    z = ((dev_x2 / 2.0)
         / math.sqrt(float(var_num) / (12.0 * n * (n - 1))))
    return {"n1": n1_tot, "n2": n2_tot, "two_r1": int(two_r1),
            "u1_x2": int(u1_x2), "tie_sum": int(tie_sum),
            "z": float(sql_round(z, 12))}


def _rank_map(ds, v_col: str, rows_hint: int | None = None):
    """Distributed doubled-midrank map: Dataset (v, cnt) -> Dataset
    (v, two_r, cnt) where ``two_r = 2*prev + cnt + 1`` over the global
    value order, built with the stitched-prefix pattern. Also returns
    the exact integer moments (n, sum 2r, sum (2r)^2) folded from
    per-block partials (Python-int exact)."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({v_col: pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        out = pd.DataFrame({v_col: df[v_col].to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby(v_col, as_index=False).sum()

    counts = _distinct_sorted_counts(ds, v_col, ["cnt"], partial,
                                     rows_hint=rows_hint)
    refs = counts.to_arrow_refs()
    per = _block_int_sums(refs, ["cnt"])
    offs, totals = _exclusive_prefix(per)
    n = int(totals[0]) if len(per) else 0

    @ray.remote
    def block_ranks(t: pa.Table, prev0: int, v_col=v_col):
        if t.num_rows == 0:
            return (pa.table({v_col: pa.array([], pa.int64()),
                              "two_r": pa.array([], pa.int64()),
                              "cnt": pa.array([], pa.int64())}),
                    0, 0)
        cnt = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        v = np.asarray(t.column(v_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        prev = prev0 + np.cumsum(cnt) - cnt
        two_r = 2 * prev + cnt + 1
        s1 = int((cnt * two_r).sum())
        s2 = int((cnt * two_r * two_r).sum())
        return (pa.table({v_col: pa.array(v, pa.int64()),
                          "two_r": pa.array(two_r, pa.int64()),
                          "cnt": pa.array(cnt, pa.int64())}), s1, s2)

    out = ray.get([block_ranks.remote(r, int(o[0]))
                   for r, o in zip(refs, offs)])
    tables = [o[0] for o in out]
    s1 = sum(o[1] for o in out)
    s2 = sum(o[2] for o in out)
    rank_ds = ray.data.from_arrow(tables) if tables else None
    return rank_ds, n, s1, s2


#: distinct-x ceiling for spearman's broadcast-rank fast path: the x
#: rank table collects to the driver and ships in every task closure
#: below this, replacing two shuffle joins with one bucketed aggregate
#: (measured 4.2 s -> sub-second on 600k rows with 50 distinct x)
SPEARMAN_X_BROADCAST_LIMIT = 65536


def _spearman_finish(n, sx, sxx, sy, syy, sxy) -> dict:
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    rho = float(num) / (math.sqrt(float(den_x))
                        * math.sqrt(float(den_y)))
    return {"n": n, "rho": float(sql_round(rho, 12))}


def _spearman_broadcast_x(ds, x_col: str, y_col: str, counts_x,
                          rows_hint: int | None = None) -> dict:
    """Fast path: x's distinct table is driver-sized, so its doubled
    midranks become a broadcast dict and the WHOLE cross moment folds
    into the single y-bucketed aggregate — per distinct y the partial
    carries (cnt, w = sum of two_rx over rows with that y), and the
    stitched prefix pass computes sum w*two_ry alongside the y moments.
    One bucketed shuffle total; no joins."""
    import ray

    dfx = counts_x.to_pandas().sort_values(x_col)
    cx = dfx["cnt"].to_numpy(np.int64)
    prev = np.cumsum(cx) - cx
    two_rx = 2 * prev + cx + 1
    n = int(cx.sum())
    sx = sum(int(c) * int(r) for c, r in zip(cx, two_rx))
    sxx = sum(int(c) * int(r) * int(r) for c, r in zip(cx, two_rx))
    rank = dict(zip((int(v) for v in dfx[x_col].to_numpy(np.int64)),
                    (int(r) for r in two_rx)))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({y_col: pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            y_col: df[y_col].to_numpy(np.int64),
            "w": df[x_col].map(rank).to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby(y_col, as_index=False)[["cnt", "w"]].sum()

    parts = ds.map_batches(pair_partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(y_col, as_index=False)[["cnt", "w"]].sum()

    counts = (hash_bucket_aggregate(parts, [y_col], merge,
                                    rows_hint=rows_hint)
              .sort(y_col).materialize())
    refs = counts.to_arrow_refs()
    per = _block_int_sums(refs, ["cnt"])
    offs, totals = _exclusive_prefix(per)
    assert int(totals[0]) == n

    @ray.remote
    def block(t: pa.Table, prev0: int):
        if t.num_rows == 0:
            return (0, 0, 0)
        cnt = np.asarray(t.column("cnt").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        w = np.asarray(t.column("w").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        prev = prev0 + np.cumsum(cnt) - cnt
        two_r = 2 * prev + cnt + 1
        return (int((cnt * two_r).sum()),
                int((cnt * two_r * two_r).sum()),
                int((w * two_r).sum()))

    out = ray.get([block.remote(r, int(o[0]))
                   for r, o in zip(refs, offs)])
    sy = sum(o[0] for o in out)
    syy = sum(o[1] for o in out)
    sxy = sum(o[2] for o in out)
    return _spearman_finish(n, sx, sxx, sy, syy, sxy)


def spearman(ds, x_col: str, y_col: str,
             rows_hint: int | None = None,
             x_broadcast_limit: int = SPEARMAN_X_BROADCAST_LIMIT
             ) -> dict:
    """Exact Spearman rank correlation (Pearson on tie-midranks) over a
    Dataset with two int64-quantized columns. When x's distinct count
    fits ``x_broadcast_limit`` the broadcast fast path runs (one
    bucketed aggregate, zero joins — ``_spearman_broadcast_x``);
    otherwise the general shape: one doubled-midrank map per column
    (stitched prefix over the sorted distinct table), one bucketed
    (x, y) pair-count aggregate, and two shuffle joins attaching the
    rank maps with the cross moment folding map-side. Final rho is
    computed from Python-int exact moments, mirroring the oracle's
    HUGEINT->DOUBLE expression; both paths produce IDENTICAL moments."""
    import ray  # noqa: F401  (rank maps / joins spawn remote tasks)

    from .relational import shuffle_join

    def x_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({x_col: pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        out = pd.DataFrame({x_col: df[x_col].to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby(x_col, as_index=False).sum()

    counts_x = hash_bucket_aggregate(
        ds.select_columns([x_col]).map_batches(x_partial,
                                               batch_format="pandas"),
        [x_col],
        lambda g: g.groupby(x_col, as_index=False)["cnt"].sum(),
        rows_hint=rows_hint).materialize()
    if counts_x.count() <= x_broadcast_limit:
        return _spearman_broadcast_x(ds, x_col, y_col, counts_x,
                                     rows_hint=rows_hint)

    xmap, n, sx, sxx = _rank_map(ds.select_columns([x_col]), x_col,
                                 rows_hint=rows_hint)
    ymap, n2, sy, syy = _rank_map(ds.select_columns([y_col]), y_col,
                                  rows_hint=rows_hint)
    assert n == n2

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({x_col: pd.Series([], dtype="int64"),
                                 y_col: pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        out = pd.DataFrame({x_col: df[x_col].to_numpy(np.int64),
                            y_col: df[y_col].to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby([x_col, y_col], as_index=False).sum()

    pair_part = ds.map_batches(pair_partial, batch_format="pandas")

    def pair_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([x_col, y_col], as_index=False)["cnt"].sum()

    pairs = hash_bucket_aggregate(pair_part, [x_col, y_col], pair_merge,
                                  rows_hint=rows_hint)

    def recast(cols):
        # shuffle_join's tagged union round-trips value columns through
        # pandas object dtype; the SECOND join keys on one of them, and
        # the bucket hash canonicalizes numerics only for numeric
        # dtypes — recast to int64 between joins or keys miss buckets.
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {c: df[c].to_numpy(np.int64) for c in cols})
        return fn

    # key column is carried by the join itself; left_cols/right_cols
    # list only the value columns (shuffle_join contract)
    jx = shuffle_join(pairs, xmap.map_batches(
        lambda t: t.rename_columns([x_col, "two_rx", "cnt_x"]),
        batch_format="pyarrow"),
        x_col, x_col, [y_col, "cnt"], ["two_rx"],
        rows_hint=rows_hint).map_batches(
        recast([y_col, "cnt", "two_rx"]), batch_format="pandas")
    jxy = shuffle_join(jx, ymap.map_batches(
        lambda t: t.rename_columns([y_col, "two_ry", "cnt_y"]),
        batch_format="pyarrow"),
        y_col, y_col, ["cnt", "two_rx"], ["two_ry"],
        rows_hint=rows_hint)

    def cross_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"sxy": pd.Series([], dtype="int64")})
        c = df["cnt"].to_numpy(np.int64)
        rx = df["two_rx"].to_numpy(np.int64)
        ry = df["two_ry"].to_numpy(np.int64)
        return pd.DataFrame({"sxy": [int((c * rx * ry).sum())]})

    sxy = int(jxy.map_batches(cross_partial, batch_format="pandas")
              .to_pandas()["sxy"].sum())

    return _spearman_finish(n, sx, sxx, sy, syy, sxy)


#: distinct-x ceiling for kendall's vector-carry pass (the carried
#: dominance state is one int per distinct x per block boundary)
KENDALL_X_LIMIT = 4096


def kendall_tau_b(ds, x_col: str, y_col: str,
                  rows_hint: int | None = None) -> dict:
    """Exact Kendall tau-b over a Dataset with two int64-quantized
    columns, for a SMALL distinct-x side (<= KENDALL_X_LIMIT — e.g. an
    ordinal grade vs a continuous metric). Dominance counting by a
    VECTOR-CARRIED stitched prefix: cells aggregate to one row per
    distinct y holding the x-count vector; after one global y sort,
    each block receives the per-x cumulative vector at its boundary
    (blocks x |x| ints to the driver) and counts concordant/discordant
    pairs vectorized inside the block. C, D, and both tie terms are
    exact integers; tau mirrors the oracle's double expression.
    Shuffles: ONE bucketed y aggregate + one sort of the distinct-y
    table. The same pattern distributes any 2-D dominance count."""
    import ray

    def x_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({x_col: pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        out = pd.DataFrame({x_col: df[x_col].to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby(x_col, as_index=False).sum()

    counts_x = hash_bucket_aggregate(
        ds.select_columns([x_col]).map_batches(x_partial,
                                               batch_format="pandas"),
        [x_col],
        lambda g: g.groupby(x_col, as_index=False)["cnt"].sum(),
        rows_hint=rows_hint).to_pandas().sort_values(x_col)
    if len(counts_x) > KENDALL_X_LIMIT:
        raise ValueError(
            f"kendall_tau_b: {len(counts_x)} distinct x exceeds the "
            f"vector-carry limit {KENDALL_X_LIMIT}; quantize x or use "
            "spearman")
    xs = counts_x[x_col].to_numpy(np.int64)
    x_pos = {int(v): i for i, v in enumerate(xs)}
    kx = len(xs)
    n = int(counts_x["cnt"].sum())
    n1 = sum(int(c) * (int(c) - 1) // 2 for c in counts_x["cnt"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({y_col: pd.Series([], dtype="int64"),
                                 "xi": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            y_col: df[y_col].to_numpy(np.int64),
            "xi": df[x_col].map(x_pos).to_numpy(np.int64)})
        out["cnt"] = np.int64(1)
        return out.groupby([y_col, "xi"], as_index=False).sum()

    parts = ds.map_batches(pair_partial, batch_format="pandas")

    vcols = [f"x{k}" for k in range(kx)]

    def to_vec(g: pd.DataFrame) -> pd.DataFrame:
        # one row per distinct y: the x-count vector as kx WIDE int64
        # columns (never a list column / per-y Python loop — both
        # measured 20x slower at 600k distinct values)
        y = g[y_col].to_numpy(np.int64)
        xi = g["xi"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        uy, inv = np.unique(y, return_inverse=True)
        flat = np.bincount(inv * kx + xi, weights=cnt,
                           minlength=len(uy) * kx)
        m = flat.reshape(len(uy), kx).astype(np.int64)
        out = pd.DataFrame({y_col: uy})
        for k, col in enumerate(vcols):
            out[col] = m[:, k]
        return out

    cells = (hash_bucket_aggregate(parts, [y_col], to_vec,
                                   rows_hint=rows_hint)
             .sort(y_col).materialize())
    refs = cells.to_arrow_refs()

    def _mat(t: pa.Table) -> np.ndarray:
        return np.stack(
            [np.asarray(t.column(c).to_numpy(zero_copy_only=False),
                        dtype=np.int64) for c in vcols], axis=1)

    @ray.remote
    def vec_sum(t: pa.Table, kx=kx):
        if t.num_rows == 0:
            return np.zeros(kx, dtype=np.int64)
        return _mat(t).sum(axis=0)

    sums = ray.get([vec_sum.remote(r) for r in refs])
    offs = [np.zeros(kx, dtype=np.int64)]
    for s in sums[:-1]:
        offs.append(offs[-1] + s)

    @ray.remote
    def block_cd(t: pa.Table, cum0: np.ndarray):
        if t.num_rows == 0:
            return (0, 0, 0)
        m = _mat(t)
        # B[r] = cumulative x-vector over all rows with smaller y
        # (carried block offset + exclusive row prefix) — fully
        # vectorized: no Python loop over the distinct-y rows
        b = cum0[None, :] + np.cumsum(m, axis=0) - m
        pre = np.cumsum(b, axis=1)
        below = pre - b                      # sum of B for x' < x
        above = pre[:, -1:] - pre            # sum of B for x' > x
        c = int((m * below).sum())
        d = int((m * above).sum())
        ty = m.sum(axis=1)
        n2 = int((ty * (ty - 1) // 2).sum())
        return (c, d, n2)

    out = ray.get([block_cd.remote(r, o) for r, o in zip(refs, offs)])
    c_tot = sum(o[0] for o in out)
    d_tot = sum(o[1] for o in out)
    n2 = sum(o[2] for o in out)
    n0 = n * (n - 1) // 2
    tau = (float(c_tot - d_tot)
           / (math.sqrt(float(n0 - n1)) * math.sqrt(float(n0 - n2))))
    return {"n": n, "concordant": int(c_tot), "discordant": int(d_tot),
            "tie_x_pairs": int(n1), "tie_y_pairs": int(n2),
            "tau_b": float(sql_round(tau, 12))}
