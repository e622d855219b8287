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


def spearman(ds, x_col: str, y_col: str,
             rows_hint: int | None = None) -> dict:
    """Exact Spearman rank correlation (Pearson on tie-midranks) over a
    Dataset with two int64-quantized columns. Distributed pieces: one
    doubled-midrank map per column (stitched prefix over the sorted
    distinct table), one bucketed (x, y) pair-count aggregate, and two
    shuffle joins attaching the rank maps; the cross moment
    ``sum cnt*2rx*2ry`` folds map-side. Final rho is computed from
    Python-int exact moments, mirroring the oracle's HUGEINT->DOUBLE
    expression."""
    import ray  # noqa: F401  (rank maps / joins spawn remote tasks)

    from .relational import shuffle_join

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

    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    rho = float(num) / (math.sqrt(float(den_x))
                        * math.sqrt(float(den_y)))
    return {"n": n, "rho": float(sql_round(rho, 12))}
