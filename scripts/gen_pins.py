"""Regenerate opennre_ray/pipelines/pins.py — pinned-value SQL oracles for
the model pipelines SQL cannot replay (seeded numpy forwards).

Run from the repo root:  python scripts/gen_pins.py

For each scale factor the pinned queries are executed and their outputs
embedded as SQL literals, dispatched at oracle time on
``(SELECT count(*) FROM customer)`` (150 / 1,500 / 15,000 — the one table
whose cardinality distinguishes all three sf dirs). Re-running must be a
no-op unless pipeline semantics deliberately changed — these are golden
pins with the same contract as tests/test_models.py::GOLDEN_EXPECTED.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

#: queries whose full output (small) or stats row gets pinned
PINNED = [
    "kg_triples",
    "kg_degree_stats",
    "kg_components",
    "bag_eval_metrics",
    "kg_triples_pcnn_stats",
    "kg_triples_bert_stats",
    "sentence_scores_stats",
    # per-relation P/R/F1 table at the 0.5 threshold: |R|-bounded exact
    # tp/fp/fn ints + 12-dp ratios over model scores — full-table pin
    "bag_per_relation_metrics",
    # decile reliability histogram is <= 10 exact-integer rows per sf —
    # full-table pin (model scores are seeded; SQL cannot replay them)
    "sentence_calibration_bins",
    # margin-sampling acquisition batch: k=40 rows of int/string columns
    # over seeded model scores — full-table pin
    "sentence_uncertainty_sample",
    # temperature-grid ECE table: 6 exact-integer rows per sf —
    # full-table pin (model scores are seeded; SQL cannot replay them)
    "sentence_temperature_scaling",
    # split-conformal coverage table: 3 exact-integer rows per sf —
    # full-table pin (histogram-exact quantile/coverage/set-size)
    "sentence_conformal_sets",
    # snowball pattern-induction top-k: k=25 int/string rows over model
    # triples + NER spans — full-table pin
    "kg_snowball_patterns",
    # majority-vote object election per (subj, pred): int/string columns
    # over the pinnable triple table — full-table pin
    "kg_truth_discovery",
    # schema-validation report over the triple table: |schema|²-bounded
    # exact int/string rows — full-table pin
    "kg_type_violations",
    # RDFS type-inference report: |E|x|classes|-bounded exact
    # int/string rows (model argmax labels) — full-table pin
    "kg_type_inference",
    # rule-mining QA over the candidate KG: |R|²/|R|³/|R|-bounded exact
    # int/string rows (model argmax labels) — full-table pins
    "kg_inverse_relations",
    "kg_path_rules",
    "kg_relation_profile",
    "kg_rule_inference",
    "kg_relation_implications",
    # entity importance over the candidate KG: |E|-bounded (gazetteer)
    # exact-integer ranks — full-table pin
    "kg_entity_pagerank",
    # two-snapshot incremental rebuild diff: |R|×3-bounded exact rows
    # with md5 content checksums — full-table pin
    "kg_snapshot_diff",
    # entity co-mention priors: top-50 pairs by support, exact counts +
    # one deterministic ln() rounded to 12 decimals — full-table pin
    "kg_entity_cooccurrence",
    "encoded_instances_stats",
    "bag_scores_stats",
    "fewshot_stats",
    # deterministic seeded ANN (sample + numpy k-means/LSH/PQ training SQL
    # cannot replay) — outputs are queries × k rows, small enough to pin whole
    "knn_lsh",
    "knn_ivf",
    "knn_pq",
    # recall@k of each ANN path vs brute-force truth: 3 exact-int rows
    "knn_ann_recall_eval",
    # deterministic iterative algorithm (merge table is n_merges rows);
    # recursive-SQL replay of BPE is impractical, so the value oracle pins
    "docs_bpe_learn",
    # corpus encode with the learned merges — integer partial sums, so
    # the (n_docs, n_words, n_subwords) row pins exactly
    "docs_bpe_encode_stats",
    # zlib-level-6 sizes are deterministic but SQL cannot replay
    # DEFLATE — the integer stats row pins
    "docs_compression_stats",
    # bit-deterministic training run (fixed-point gradient sums); SQL
    # cannot replay SGD, so the stats row pins
    "kg_transe_stats",
    "kg_link_prediction",
    # actor-pool multimodal plumbing with the deterministic fake codec —
    # blake2b payloads are not SQL-derivable, so the checksum row pins
    "media_features_stats",
    # real-codec audio modality checksum row (WAV decode + RMS/ZCR
    # head — deterministic seeded payloads; SQL cannot replay)
    "media_audio_stats",
]

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "opennre_ray", "pipelines", "pins.py")


def _lit(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        # CAUTION: DuckDB's decimal parser is NOT correctly rounded at
        # 16-17 significant digits (measured: '0.9230200397912465' parses
        # 1 ulp low), so full-precision reprs can hash-mismatch. Pinned
        # queries must emit floats already rounded to ≤12 decimals
        # (bag_eval does); shorter literals parse identically everywhere.
        return repr(float(v))
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _cast(dtype) -> str:
    if pd.api.types.is_integer_dtype(dtype):
        return "BIGINT"
    if pd.api.types.is_float_dtype(dtype):
        return "DOUBLE"
    return "VARCHAR"


def build_sql(frames: dict[int, pd.DataFrame]) -> str:
    any_df = next(iter(frames.values()))
    cols = list(any_df.columns)
    qcols = ", ".join(f'"{c}"' for c in cols)
    rows = []
    for ckey, df in sorted(frames.items()):
        for t in df.itertuples(index=False):
            vals = ", ".join(_lit(v) for v in t)
            rows.append(f"  ({ckey}, {vals})")
    values = ",\n".join(rows)
    sel = ", ".join(f'"{c}"::{_cast(any_df[c].dtype)} AS "{c}"'
                    for c in cols)
    return (f"WITH k AS (SELECT count(*) AS c FROM customer),\n"
            f"p (c, {qcols}) AS (VALUES\n{values})\n"
            f"SELECT {sel} FROM p JOIN k USING (c)")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb

    from opennre_ray.pipelines.queries import QUERIES

    per_query: dict[str, dict[int, pd.DataFrame]] = {n: {} for n in PINNED}
    for sf in SF_DIRS:
        con = duckdb.connect()
        ckey = con.sql(
            f"SELECT count(*) FROM '{sf}/customer.parquet'").fetchone()[0]
        con.close()
        for name in PINNED:
            res = QUERIES[name](sf)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            # canonical row order so regeneration is diff-stable
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
            per_query[name][int(ckey)] = df
            print(f"{sf} {name}: {len(df)} rows", flush=True)

    lines = [
        '"""GENERATED by scripts/gen_pins.py — do not edit by hand.',
        "",
        "Pinned-value SQL oracles for model pipelines (seeded numpy",
        "forwards that SQL cannot replay). Dispatch key: customer count",
        "(150/1500/15000 across sf0.001/0.01/0.1). Golden pins — update",
        "only on a deliberate semantic change, and say why in the commit.",
        '"""', "",
        "PINNED_ORACLES = {",
    ]
    for name in PINNED:
        sql = build_sql(per_query[name]).replace('"""', "")
        lines.append(f'    "{name}": """\\\n{sql}\n""",')
    lines.append("}")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
