"""Benchmark harness.

Runs the headline KG-construction pipeline plus representative operator
pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE
JSON line.

``--scaling``: runs the headline job twice in fresh processes at 8 and 32
CPUs on the same input and reports both throughputs + scaling efficiency
(the sandbox substitute for the N vs 4N node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _bench_queries(sf_dir: str) -> tuple[dict, dict]:
    """Run each benched pipeline once; return ({name: sec}, extras)."""
    from opennre_ray.pipelines import queries as Q
    from opennre_ray.pipelines.kg import extract_triples

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return res

    # headline: full KG pipeline, consumed by parquet write (streaming sink)
    out_dir = f"/tmp/bench_graph_{os.getpid()}"
    t0 = time.perf_counter()
    triples = extract_triples(sf_dir)
    triples.write_parquet(out_dir)
    kg_sec = time.perf_counter() - t0
    timings["kg_triples"] = round(kg_sec, 3)

    import pyarrow.parquet as pq
    n_triples = pq.ParquetDataset(out_dir).read(columns=["subj"]).num_rows
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    # count instances scored (throughput denominator = docs and instances)
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    extras["n_docs"] = n_docs
    extras["n_triples"] = n_triples
    extras["docs_per_sec"] = round(n_docs / kg_sec, 1)
    extras["triples_per_sec"] = round(n_triples / kg_sec, 2)

    # representative operator pipelines
    timed("lineitem_group_agg",
          lambda: Q.lineitem_group_agg(sf_dir).to_pandas())
    timed("events_daily_window",
          lambda: Q.events_daily_window(sf_dir).to_pandas())
    timed("docs_quality", lambda: Q.docs_quality(sf_dir).to_pandas())
    timed("docs_minhash_dedup",
          lambda: Q.docs_minhash_dedup(sf_dir).to_pandas())
    timed("knn_cosine", lambda: Q.knn_cosine(sf_dir))
    timed("docs_word_freq", lambda: Q.docs_word_freq(sf_dir).to_pandas())
    return timings, extras


def main():
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # keep stdout to exactly one JSON line: Ray Data logs INFO to stdout
    for name in ("ray", "ray.data"):
        logging.getLogger(name).setLevel(logging.ERROR)

    # warm the page cache so we measure compute+shuffle, not first disk read
    for name in ("documents", "lineitem", "events", "embeddings"):
        with open(f"{SF_DIR}/{name}.parquet", "rb") as fh:
            fh.read()

    t0 = time.perf_counter()
    timings, extras = _bench_queries(SF_DIR)
    total = time.perf_counter() - t0
    ray.shutdown()

    result = {
        "metric": "kg_construction_end_to_end",
        "value": timings["kg_triples"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "total_sec": round(total, 3),
        **extras,
    }
    print(json.dumps(result))


def scaling():
    """Same job at 8 and 32 CPUs in fresh processes; efficiency report."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo = r_lo["value"]
    t_hi = r_hi["value"]
    # throughput ratio normalized by CPU ratio: 1.0 == linear scaling
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "sec_8": t_lo, "sec_32": t_hi,
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
