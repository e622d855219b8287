"""Driver contract for the opennre_ray engine.

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) initializes or shuts down Ray.

- ``entry()``     — flagship KG-construction pipeline on sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
                    (SURVEY.md §2 inventory + training-data extensions).
- ``oracle_sql()``— DuckDB-equivalent SQL for every SQL-expressible query;
                    model/sketch/approximate operators are rows-only by
                    design (their oracles live in tests/).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: Common-Crawl-style pages → deduplicated, canonical
    (subj, pred, obj) triples with lineage columns."""
    from opennre_ray.pipelines.kg import extract_triples

    return extract_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from opennre_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opennre_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
