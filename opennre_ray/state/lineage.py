"""Lineage, per-partition manifests, and checkpoint/resume.

North-star requirements: every output partition carries lineage metadata
(input file, byte/row range, model hash) and per-stage counters, with
checkpoint manifests enabling exact resume mid-corpus. The reference has no
data-plane resume at all (only best-model checkpoints,
``framework/sentence_re.py:134-139``) — this module is new engineering.

Design (batch-pipeline resume, SURVEY §4):
- the corpus is processed as named shards (one input file / key range each);
- each shard's output goes to ``<out>/shard=<name>/`` written ATOMICALLY
  (write to ``_tmp-<name>``, fsync, rename) + a ``manifest.json`` recording
  input path, row count, stage counters, model hash, extractor version;
- a restart lists completed manifests and skips those shards — exactly-once
  output without any coordination service.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class ShardManifest:
    def __init__(self, shard: str, input_path: str, model_hash: str = "",
                 extractor_version: str = "", counters: dict | None = None):
        self.data = {
            "shard": shard,
            "input_path": input_path,
            "model_hash": model_hash,
            "extractor_version": extractor_version,
            "counters": counters or {},
            "completed_at": None,
        }

    def to_json(self) -> str:
        return json.dumps(self.data, indent=1, sort_keys=True)


def shard_dir(out_root: str, shard: str) -> str:
    return os.path.join(out_root, f"shard={shard}")


def is_shard_complete(out_root: str, shard: str) -> bool:
    return os.path.exists(os.path.join(shard_dir(out_root, shard),
                                       "manifest.json"))


def completed_shards(out_root: str) -> list[str]:
    if not os.path.isdir(out_root):
        return []
    out = []
    for name in sorted(os.listdir(out_root)):
        if name.startswith("shard=") and os.path.exists(
                os.path.join(out_root, name, "manifest.json")):
            out.append(name[len("shard="):])
    return out


def write_shard(ds, out_root: str, shard: str, manifest):
    """Atomically write one shard's Dataset + manifest; idempotent.

    If the shard is already complete this is a no-op (resume path).
    ``manifest`` may be a ShardManifest or a zero-arg callable returning one
    — callables are invoked AFTER the data is written, so manifests can
    snapshot post-execution state (stage counters).
    """
    if is_shard_complete(out_root, shard):
        return False
    final = shard_dir(out_root, shard)
    tmp = os.path.join(out_root, f"_tmp-{shard}-{os.getpid()}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    if callable(manifest):
        manifest = manifest()
    manifest.data["completed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime())
    parts = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
    manifest.data["num_files"] = len(parts)
    try:
        import pyarrow.parquet as pq
        manifest.data["num_rows"] = sum(
            pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
            for f in parts)
    except Exception:
        manifest.data["num_rows"] = None
    mpath = os.path.join(tmp, "manifest.json")
    with open(mpath, "w") as fh:
        fh.write(manifest.to_json())
        fh.flush()
        os.fsync(fh.fileno())
    # sync the tmp directory so file entries are durable before the rename
    # publishes the shard (a crash after rename must not expose a complete-
    # looking shard with missing contents)
    dfd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return True


def run_sharded(shards: dict[str, "callable"], out_root: str,
                make_manifest) -> dict:
    """Resume-aware driver loop: process only incomplete shards.

    Args:
        shards: {shard_name: fn() -> Dataset} lazily-built per-shard pipelines.
        make_manifest: fn(shard_name) -> ShardManifest (called after the
            shard's data is written — may snapshot execution counters).
    Returns summary {completed, skipped}.
    """
    os.makedirs(out_root, exist_ok=True)
    skipped, completed = [], []
    for name, build in shards.items():
        if is_shard_complete(out_root, name):
            skipped.append(name)
            continue
        write_shard(build(), out_root, name,
                    lambda name=name: make_manifest(name))
        completed.append(name)
    return {"completed": completed, "skipped": skipped}


class StageCounters:
    """Cheap per-stage row counters carried through batch UDF closures.

    Counters are *per-manifest* aggregates: stages report rows-in/rows-out
    per batch into a plain dict the driver merges at shard close. (Local-mode
    substitute for Ray metrics; keys surface in manifests.)
    """

    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, key: str, n: int):
        self.counts[key] = self.counts.get(key, 0) + int(n)

    def merge(self, other: dict):
        for k, v in other.items():
            self.add(k, v)
