"""Bucketed (co-partitioned) parquet storage — the pay-the-shuffle-once
pattern for 100 TB layouts.

A table written with ``write_bucketed(key)`` lands as
``root/bucket=<i>/*.parquet`` using the SAME dtype-canonical hash as every
bucketed shuffle in this engine (``relational.canonical_bucket``), so any
two tables bucketed on compatible keys with the same ``n_buckets``
CO-PARTITION: equal keys always live under the same bucket index on both
sides. ``bucketed_join`` then joins them with ONE task per bucket and NO
shuffle — each task reads bucket *i* from both roots and merges locally.
This is the Hive/Iceberg bucketing pattern: on a cluster the expensive
all-to-all exchange is paid once at ingest, and every subsequent join,
at any scale, is an embarrassingly parallel map over bucket indices.

There is no reference analogue (thunlp/OpenNRE has no storage layer); the
closest contract is its result sink (`opennre/framework/data_loader.py`
writing eval artifacts), generalized here to resumable partitioned layout.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def write_bucketed(ds, key_cols, root: str, *, n_buckets: int = 64):
    """Write ``ds`` hash-bucketed by ``key_cols`` to ``root/bucket=i/``.

    The bucket column is assigned with the dtype-canonical hash shared by
    all bucketed shuffles, then ``write_parquet(partition_cols=)`` lays
    out one directory per bucket (many files per bucket is fine — readers
    glob the directory). Returns ``root``.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    from .relational import canonical_bucket

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=canonical_bucket(df, key_cols, n_buckets))

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        root, partition_cols=["bucket"])
    return root


def bucketed_join(root_l: str, root_r: str, left_key: str, right_key: str,
                  left_cols: list[str], right_cols: list[str], *,
                  n_buckets: int = 64, how: str = "inner"):
    """Map-side join of two CO-BUCKETED parquet layouts — no shuffle.

    One task per bucket index: read ``bucket=i`` from both roots, merge
    locally (equal keys co-partition by construction, so the per-bucket
    merge is exact). The bucket fan-out is the parallelism — size
    ``n_buckets`` at write time so a single bucket from each side fits a
    worker's heap. A missing bucket directory on either side is an empty
    frame (hash buckets can be unpopulated at small scale).
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray

    def read_bucket(root: str, b: int, cols: list[str]) -> pd.DataFrame:
        files = sorted(_glob.glob(f"{root}/bucket={b}/*.parquet"))
        if not files:
            return pd.DataFrame(columns=cols)
        tbl = pa.concat_tables([_pq.read_table(f, columns=cols)
                                for f in files])
        return tbl.to_pandas()

    lcols = list(dict.fromkeys([left_key] + left_cols))
    rcols = list(dict.fromkeys([right_key] + right_cols))

    def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in batch["bucket"]:
            lf = read_bucket(root_l, int(b), lcols)
            rf = read_bucket(root_r, int(b), rcols)
            merged = lf.merge(rf, left_on=left_key, right_on=right_key,
                              how=how)
            frames.append(merged[list(dict.fromkeys(
                [left_key] + left_cols + right_cols))])
        return pd.concat(frames, ignore_index=True)

    ids = ray.data.from_pandas(
        pd.DataFrame({"bucket": range(n_buckets)})).repartition(n_buckets)
    # batch_size=None: keep each one-row bucket block its own task (the
    # default 1024 would bundle every bucket into one task, serializing
    # the bucket reads this layout exists to parallelize)
    return ids.map_batches(join_bucket, batch_format="pandas",
                           batch_size=None)


def write_range_partitioned(ds, col: str, root: str, *, n_parts: int = 8,
                            boundaries: list[int] | None = None):
    """Range-partitioned layout on an integer column: rows land under
    ``root/part=<i>/`` where part *i* holds the i-th value range — the
    sorted-layout pattern that lets range scans prune whole partitions by
    min/max. Boundaries default to the EXACT interior n_parts-quantiles
    (one histogram pass, ``sketches.exact_int_quantiles``) so partitions
    balance even under skew; pass precomputed ``boundaries`` to reproduce
    an existing layout. part(v) = number of boundaries ≤ v. Returns the
    boundary list (persist it next to the layout for pruning readers).
    """
    import numpy as np

    from .sketches import exact_int_quantiles

    if boundaries is None:
        boundaries = exact_int_quantiles(ds, col, n_parts)
    bounds = np.asarray(sorted(boundaries), dtype=np.int64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        return df.assign(part=np.searchsorted(bounds, v,
                                              side="right").astype("int64"))

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        root, partition_cols=["part"])
    return list(int(b) for b in bounds)


def export_jsonl(ds, root: str) -> str:
    """Write a Dataset as sharded JSON-lines (one file per block) —
    the interchange sink for downstream consumers that do not speak
    parquet (annotation UIs, legacy tokenizers). Lossy relative to
    parquet (no schema, no statistics, text floats) — keep parquet as
    the canonical layout and export JSONL at the edge."""
    ds.write_json(root)
    return root


def read_jsonl(root: str, **kwargs):
    """Read sharded JSON-lines back as a Dataset (schema inferred).
    The inverse edge-format reader for ``export_jsonl``; columnar
    pipelines should convert to parquet after ingest (one
    ``write_parquet`` pass) rather than re-reading JSONL repeatedly."""
    import ray

    return ray.data.read_json(root, **kwargs)


def compact_shards(root: str, out_root: str, *,
                   target_rows: int = 1_000_000):
    """Small-file compaction: re-chunk a directory of parquet shards into
    ~``target_rows``-row output files, preserving rows and schema.

    The 100 TB housekeeping op — streaming jobs emit many small shards
    per partition and small files dominate open/plan costs downstream.
    Reads stream block-by-block; Ray's writer splits on block boundaries,
    so output file sizes track ``target_max_block_size``. Returns the
    output row count.
    """
    import ray

    ds = ray.data.read_parquet(root)
    n = ds.count()
    n_files = max(1, -(-n // target_rows))
    ds.repartition(n_files).write_parquet(out_root)
    return n
