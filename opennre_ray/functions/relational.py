"""Relational building blocks: broadcast join, semi/anti join, windowed aggregate.

The reference has no joins at all (SURVEY §2.4 J1 — its only lookups are
in-process dicts); the KG/corpus build needs dimension joins and log
windowing. Patterns per the Ray Data playbook:

- small side → ``ray.put`` once, pandas merge per batch (no shuffle);
- semi/anti join → broadcast the key set, vectorized ``isin`` filter;
- event-time windows → truncate timestamp to the window in a batch UDF,
  then a (partially-aggregated) groupby on (key, window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner"):
    """Map-side hash join against a broadcast dimension table.

    ``small_df`` is put in the object store once; each batch task merges
    against the shared copy — zero shuffle, the canonical pattern for
    dimension tables at any corpus scale.
    """
    import ray

    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(Join, batch_format="pandas", concurrency=(1, 4))


def semi_anti_join(ds, keys, col: str, anti: bool = False):
    """Filter rows whose ``col`` is (not) in a broadcast key set."""
    import ray

    ref = ray.put(frozenset(keys))

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = pc.is_in(batch.column(col), value_set=pa.array(list(self.keys)))
            if anti:
                m = pc.invert(m)
            return batch.filter(m)

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 4))


def add_time_window(ds, ts_col: str, unit: str = "day",
                    out_col: str = "window"):
    """Append a truncated-timestamp window column (event-time tumbling window).

    Emitted as an ISO string so comparisons with SQL ``strftime`` are exact.
    """
    fmt = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d %H:00"}[unit]

    def trunc(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = batch[ts_col].dt.strftime(fmt)
        return batch

    return ds.map_batches(trunc, batch_format="pandas")
