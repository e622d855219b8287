"""Data-quality expectations — Deequ / Great-Expectations-style checks
as distributed aggregates.

Each check streams the table once as vectorized map-side partials and
reduces to a single (check, n_violations) row; ``run_checks`` unions any
number of checks into the quality report consumed by ingest gates (fail
the pipeline when a critical expectation breaks, log the rest). The
uniqueness check is the one wide operator (duplicate detection needs
same-value co-location — one bucketed shuffle of the key column only);
referential integrity rides the size-gated ``anti_join``.

No reference analogue (thunlp/OpenNRE validates nothing about its
inputs); this is the data-platform layer a 100 TB ingest needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def check_not_null(ds, col: str):
    """Violations = null rows in ``col`` (one streaming pass)."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.column(col).null_count],
                                       pa.int64())})
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return int(parts.sum("n") or 0)


def check_in_range(ds, col: str, lo, hi):
    """Violations = rows with ``col`` outside [lo, hi] (nulls count as
    violations — range checks imply presence)."""
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        ok = (v >= lo) & (v <= hi)
        return pa.table({"n": pa.array([int(len(v) - ok.sum())],
                                       pa.int64())})
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return int(parts.sum("n") or 0)


def check_accepted_values(ds, col: str, allowed):
    """Violations = rows whose ``col`` is not in ``allowed``."""
    allowed = set(allowed)

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        bad = sum(1 for v in vals if v not in allowed)
        return pa.table({"n": pa.array([bad], pa.int64())})
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return int(parts.sum("n") or 0)


def check_unique(ds, col: str, rows_hint: int | None = None):
    """Violations = rows beyond the first per duplicate value. Map-side
    ``value_counts`` collapses each block to distinct values, then ONE
    bucketed aggregate on the value sums counts — the only shuffle in
    the check set, and it moves (value, count) pairs, not rows."""
    from .relational import hash_bucket_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        return pd.DataFrame({col: vc.index, "c": vc.to_numpy()})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(col)["c"].sum()
        return pd.DataFrame({"n": [int((s[s > 1] - 1).sum())]})

    parts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pandas"), [col],
        per_bucket, rows_hint=rows_hint)
    return int(parts.sum("n") or 0)


def check_foreign_key(child_ds, parent_ds, child_col: str,
                      parent_col: str, rows_hint: int | None = None):
    """Violations = child rows whose key is absent from the parent
    (referential integrity) — the size-gated ``anti_join`` does the
    work: parent keys broadcast under the limit, bucketed shuffle
    beyond it."""
    from .relational import anti_join

    def keyed(side_col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"_k": t.column(side_col)})
        return fn

    orphans = anti_join(
        child_ds.map_batches(keyed(child_col), batch_format="pyarrow"),
        parent_ds.map_batches(keyed(parent_col), batch_format="pyarrow"),
        "_k", [], rows_hint=rows_hint)
    return int(orphans.count())


def run_checks(checks: list[tuple[str, int]]) -> pd.DataFrame:
    """Assemble (name, violation-count) pairs into the quality report:
    (chk, n_violations, passed)."""
    return pd.DataFrame({
        "chk": [c[0] for c in checks],
        "n_violations": pd.Series([int(c[1]) for c in checks],
                                  dtype="int64"),
        "passed": [int(c[1]) == 0 for c in checks]})
