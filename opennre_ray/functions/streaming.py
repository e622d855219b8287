"""Stream-shaped operators: running aggregates and incremental keyed state.

Ray Data has no event-time windows/watermarks (SURVEY §2.7 — neither does
the reference); stream semantics are expressed as:

- ordered per-key computation: hash-bucket the key, sort by ts inside the
  bucket, vectorized cumulative ops (``running_totals``) — the batch
  expression of a per-key ordered stream;
- genuinely incremental state: ``KeyedStateActor`` — one actor per key-hash
  bucket fed batches in ts order, holding running state across feeds
  (the pattern for operators whose state cannot be recomputed per window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def running_totals(ds, key: str, ts: str, value: str,
                   n_buckets: int | None = None,
                   rows_hint: int | None = None,
                   tiebreak: str | None = None):
    """Per-row running count and running sum per key, ordered by ts.

    Equivalent SQL: ``sum(value) OVER (PARTITION BY key ORDER BY ts ROWS
    UNBOUNDED PRECEDING)``. Keys never span buckets, so per-bucket
    sort+cumsum is exact. Pass ``tiebreak`` (a unique column) whenever ts
    values can repeat per key — without it, tie order is whatever the
    shuffle produced and the cumulative values become nondeterministic.
    """
    from .relational import hash_bucket_aggregate
    from .sqlcompat import sql_round

    order = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        g["running_n"] = g.groupby(key).cumcount().add(1).astype("int64")
        g["running_sum"] = sql_round(
            g.groupby(key)[value].cumsum().to_numpy(), 2)
        return g

    return hash_bucket_aggregate(ds, [key], per_bucket, n_buckets=n_buckets,
                                 rows_hint=rows_hint)


def lag_column(ds, key: str, ts: str, value: str,
               n_buckets: int | None = None, rows_hint: int | None = None,
               tiebreak: str | None = None, out_col: str = "prev_value"):
    """Per-row previous ``value`` of the same key in ts order (SQL
    ``lag(value) OVER (PARTITION BY key ORDER BY ts)``; null on each key's
    first row). Same bucketed sort-within-partition shape as
    ``running_totals`` — keys never span buckets, so per-bucket shift is
    exact.
    """
    from .relational import hash_bucket_aggregate

    order = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        g[out_col] = g.groupby(key)[value].shift(1)
        return g

    return hash_bucket_aggregate(ds, [key], per_bucket,
                                 n_buckets=n_buckets, rows_hint=rows_hint)


def debounce(ds, key_cols, ts: str, window_s: int, *,
             tiebreak: str | None = None, n_buckets: int | None = None,
             rows_hint: int | None = None):
    """Windowed event dedup ("debounce"): drop a row when its immediate
    predecessor of the same key sits within ``window_s`` seconds — the
    LAG formulation (each row compares to the previous row in ts order),
    which SQL replays exactly. A steady burst therefore thins to its
    leading edge plus any row whose gap to the previous row exceeds the
    window. Same bucketed sort-within-partition shape as ``lag_column``:
    keys never span buckets, so per-bucket shift is exact and no state
    crosses partitions. Keeps all input columns.
    """
    from .relational import hash_bucket_aggregate

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    order = list(key_cols) + [ts] + ([tiebreak] if tiebreak else [])
    win = np.timedelta64(window_s, "s")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        prev = g.groupby(list(key_cols))[ts].shift(1)
        gap = g[ts] - prev
        return g[prev.isna() | (gap > win)]

    return hash_bucket_aggregate(ds, list(key_cols), per_bucket,
                                 n_buckets=n_buckets, rows_hint=rows_hint)


class KeyedStateActor:
    """Incremental per-key state held in a Ray actor (one per bucket).

    Feed batches in ts order; the actor maintains running (count, sum, max)
    per key across feeds. This is the escape hatch for true streaming state
    (e.g. deduplicating an unbounded stream, monotonic counters) where the
    groupby-recompute expression doesn't apply.
    """

    def __init__(self):
        self.state: dict = {}

    def feed(self, keys, values) -> int:
        for k, v in zip(keys, values):
            cur = self.state.get(k)
            if cur is None:
                self.state[k] = [1, float(v), float(v)]
            else:
                cur[0] += 1
                cur[1] += float(v)
                if v > cur[2]:
                    cur[2] = float(v)
        return len(keys)

    def snapshot(self) -> dict:
        return {k: tuple(v) for k, v in self.state.items()}


def incremental_keyed_state(ds, key: str, ts: str, value: str,
                            n_buckets: int = 8) -> dict:
    """Drive a bucket-sharded actor fleet over a Dataset in ts order.

    Returns the merged {key: (count, sum, max)} state. The per-bucket feed
    order follows the global ts sort, so state transitions observe the
    stream order (the ordering assumption is the sort — document per use).
    """
    import ray

    actors = [ray.remote(KeyedStateActor).remote() for _ in range(n_buckets)]
    ordered = ds.sort(ts)
    for batch in ordered.iter_batches(batch_size=4096, batch_format="pandas"):
        h = pd.util.hash_pandas_object(batch[[key]], index=False).to_numpy()
        buckets = (h % n_buckets).astype(np.int64)
        pending = []
        for b in range(n_buckets):
            m = buckets == b
            if m.any():
                pending.append(actors[b].feed.remote(
                    batch.loc[m, key].tolist(), batch.loc[m, value].tolist()))
        ray.get(pending)     # barrier per batch preserves ts order per key
    merged: dict = {}
    for snap in ray.get([a.snapshot.remote() for a in actors]):
        merged.update(snap)
    return merged


def cohort_retention(events_ds, *, user_col: str = "user_id",
                     ts_col: str = "ts", rows_hint: int | None = None):
    """Cohort retention matrix: cohort_day = each user's first active day,
    day_offset = a later active day minus the cohort day, n_users = how
    many of that cohort were active at that offset (offset 0 row = cohort
    size). The classic product-analytics retention triangle, as two
    bucketed aggregates:

    1. map-side: each batch collapses to DISTINCT (user, epoch-day) pairs
       (integer days — the shuffle moves 16 bytes/active-day, never raw
       events);
    2. user-bucketed aggregate: per user min(day) = cohort, explode that
       user's distinct days to (cohort, offset) rows — every user
       contributes at most #active-days rows;
    3. (cohort, offset)-bucketed count — the output is calendar-sized
       (days × offsets), kilobytes at any corpus scale.

    Per-user state never leaves its bucket, so no driver-side maps and no
    skew beyond a user's own activity span.
    """
    import pyarrow as pa

    from .relational import hash_bucket_aggregate

    def day_pairs(batch: pa.Table) -> pa.Table:
        days = batch.column(ts_col).cast(pa.date32()).cast(pa.int32())
        u = batch.column(user_col).to_numpy(zero_copy_only=False)
        d = days.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table({user_col: pa.array(uniq[:, 0], pa.int64()),
                         "day": pa.array(uniq[:, 1], pa.int64())})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "day"])
        cohort = g.groupby(user_col)["day"].transform("min")
        return pd.DataFrame({
            "cohort": cohort.astype(np.int64),
            "day_offset": (g["day"] - cohort).astype(np.int64)})

    pairs = hash_bucket_aggregate(
        events_ds.map_batches(day_pairs, batch_format="pyarrow"),
        [user_col], per_user, rows_hint=rows_hint)

    def count_cell(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cohort", "day_offset"], as_index=False)
               .agg(n_users=("day_offset", "size")))
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    cells = hash_bucket_aggregate(pairs, ["cohort", "day_offset"],
                                  count_cell, n_buckets=8)

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = np.datetime64("1970-01-01", "D")
        days = (epoch + batch["cohort"].to_numpy(np.int64)).astype(str)
        return pd.DataFrame({"cohort_day": days,
                             "day_offset": batch["day_offset"],
                             "n_users": batch["n_users"]})

    return cells.map_batches(fmt, batch_format="pandas")
