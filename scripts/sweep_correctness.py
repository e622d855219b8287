"""Replay the driver's correctness gate locally: run EVERY oracled query
against its DuckDB oracle at a chosen scale factor and report mismatches.

Run from the repo root (owns its Ray session):

    python scripts/sweep_correctness.py [/root/testdata/sf0.01]

This is the pre-flight for each round's CORRECTNESS_r{N}.json — round 3's
sweep caught a golden-pin mismatch (DuckDB's decimal parser is one ulp off
at 16-17 significant digits) that pytest at sf0.001 could not see.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd

    from opennre_ray.pipelines.queries import ORACLES, QUERIES

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    bad = []
    names = sorted(ORACLES)
    for i, name in enumerate(names):
        try:
            res = QUERIES[name](sf)
            rdf = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            odf = con.sql(ORACLES[name]).df()
            cols = sorted(rdf.columns)
            if sorted(odf.columns) != cols:
                bad.append((name, "schema", list(rdf.columns),
                            list(odf.columns)))
                continue
            rs = rdf[cols].sort_values(by=cols).reset_index(drop=True)
            os_ = odf[cols].sort_values(by=cols).reset_index(drop=True)
            if len(rs) != len(os_):
                bad.append((name, "rows", len(rs), len(os_)))
            elif not rs.astype(str).equals(os_.astype(str)):
                bad.append((name, "values", None, None))
        except Exception as e:                      # noqa: BLE001
            bad.append((name, "err", type(e).__name__, str(e)[:200]))
        if (i + 1) % 25 == 0:
            print(f"progress {i + 1}/{len(names)}", flush=True)
    print(f"TOTAL {len(names)} BAD {len(bad)}", flush=True)
    for b in bad:
        print("MISMATCH", b, flush=True)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
