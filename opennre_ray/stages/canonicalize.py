"""Entity canonicalization: groupby-aggregate shuffle on normalized surfaces.

North-star requirement: "entity canonicalization runs as a groupby-aggregate
shuffle on normalized surface-form keys with explicit hash partitioning and
salted keys for head-entity skew". Design:

Phase 1 (map-side combine): inside ``map_batches``, collapse each batch to
    (norm_surface, entity_id) → partial count. Head-entity skew (a country
    name on billions of pages) is absorbed HERE — a hot key contributes at
    most one row per (batch, entity) no matter how many mentions it has, so
    the subsequent shuffle moves O(batches × distinct surfaces), not O(rows).
    This is the "salted key" two-phase pattern with the batch id acting as
    the implicit salt.
Phase 2 (small shuffle): ``groupby([norm_surface, entity_id]).sum`` over the
    partials, then per-surface argmax → the canonical id for each surface.
Phase 3 (broadcast rewrite): the surface→canonical map is gazetteer-sized;
    ``ray.put`` it once and rewrite subj/obj ids inside ``map_batches``.

The reference has no linker at all (it trusts ``h.id``/``t.id`` from the
file, ``data_loader.py:152``); canonicalization is the KG build's analogue
of its fact-key grouping.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


class PartialSurfaceCounts:
    """Phase 1: per-batch (norm_surface, entity_id) partial counts."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ner import normalize_surface

        counts: Counter = Counter()
        for name_col, id_col in (("h_name", "h_id"), ("t_name", "t_id")):
            for name, eid in zip(batch.column(name_col).to_pylist(),
                                 batch.column(id_col).to_pylist()):
                counts[(normalize_surface(name), eid)] += 1
        keys = list(counts)
        return pa.table({
            "norm_surface": pa.array([k[0] for k in keys], pa.string()),
            "entity_id": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([counts[k] for k in keys], pa.int64()),
        })


def build_canonical_map(instances_ds) -> dict[str, str]:
    """Phases 1+2: Dataset of instance rows → {norm_surface: canonical_id}.

    The final table is ≤ |alias vocabulary| rows, so collecting it on the
    driver is safe at any corpus scale.
    """
    from ray.data.aggregate import Sum

    partials = instances_ds.map_batches(
        PartialSurfaceCounts(), batch_format="pyarrow")
    totals = partials.groupby(["norm_surface", "entity_id"]).aggregate(
        Sum("cnt", alias_name="total"))
    # deterministic tie-break: higher count wins; on equal counts the
    # lexicographically SMALLER id wins. Vectorized argmax (sort + first
    # per surface) — the per-row iter_rows loop was the one driver-side
    # Python loop in the canonicalization path.
    df = totals.to_pandas()
    if not len(df):
        return {}
    df = df.sort_values(["norm_surface", "total", "entity_id"],
                        ascending=[True, False, True], kind="mergesort")
    best = df.drop_duplicates("norm_surface", keep="first")
    return dict(zip(best["norm_surface"], best["entity_id"]))


class CanonicalizeIds:
    """Phase 3: rewrite h_id/t_id through the broadcast canonical map."""

    def __init__(self, canon_ref):
        import ray
        self.canon = ray.get(canon_ref) if not isinstance(canon_ref, dict) \
            else canon_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ner import normalize_surface

        def remap(name_col, id_col):
            names = batch.column(name_col).to_pylist()
            ids = batch.column(id_col).to_pylist()
            return pa.array(
                [self.canon.get(normalize_surface(n), i)
                 for n, i in zip(names, ids)], pa.string())

        out = batch.set_column(
            batch.schema.get_field_index("h_id"), "h_id",
            remap("h_name", "h_id"))
        return out.set_column(
            out.schema.get_field_index("t_id"), "t_id",
            remap("t_name", "t_id"))
