"""Graph analytics over the materialized triple table.

The KG build's output is an edge list ``(subj, pred, obj)``; downstream
consumers need degree profiles, reachability, and component structure.
Everything here is expressed Ray-Data-first:

- degree stats: hash-bucket aggregation (no per-group Python);
- k-hop expansion: broadcast frontier set, vectorized membership filter per
  hop (the semi-join pattern — frontiers are small relative to edges);
- connected components: iterative min-label propagation — each round is one
  bucketed shuffle; converges in O(diameter) rounds. Label propagation over
  groupbys is the standard MapReduce/Pregel-style formulation; union-find on
  the driver is only safe when the candidate set is provably small (we keep
  it distributed instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import hash_bucket_aggregate


def degree_stats(triples_ds, subj_col="subj", obj_col="obj"):
    """Per-entity out-degree, in-degree, and distinct predicate count."""
    def explode(batch: pa.Table) -> pa.Table:
        subj = batch.column(subj_col).to_pylist()
        obj = batch.column(obj_col).to_pylist()
        pred = batch.column("pred").to_pylist()
        return pa.table({
            "entity": pa.array(subj + obj, pa.string()),
            "direction": pa.array(["out"] * len(subj) + ["in"] * len(obj),
                                  pa.string()),
            "pred": pa.array(pred + pred, pa.string()),
        })

    edges = triples_ds.map_batches(explode, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized flags, no per-group Python lambdas (they reintroduce
        # the per-group overhead this module exists to avoid)
        g = g.assign(_out=(g["direction"] == "out"),
                     _in=(g["direction"] == "in"))
        out = g.groupby("entity").agg(
            out_degree=("_out", "sum"), in_degree=("_in", "sum"),
            n_preds=("pred", "nunique")).reset_index()
        out["out_degree"] = out["out_degree"].astype("int64")
        out["in_degree"] = out["in_degree"].astype("int64")
        return out

    return hash_bucket_aggregate(edges, ["entity"], per_bucket, n_buckets=32)


def k_hop_neighbors(triples_ds, seeds, k: int = 2,
                    subj_col="subj", obj_col="obj") -> dict[str, int]:
    """Entities reachable from ``seeds`` within k directed hops.

    Returns {entity: first_hop_reached}. Each hop: broadcast the frontier,
    filter edges whose subj is in it (vectorized is_in), collect new objs.
    Frontier sets stay small; edges stream every hop (no materialized graph
    index — the 100 TB-safe formulation).
    """
    import pyarrow.compute as pc
    import ray

    reached = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, k + 1):
        if not frontier:
            break
        ref = ray.put(frozenset(frontier))

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(ref)
            m = pc.is_in(batch.column(subj_col),
                         value_set=pa.array(list(fr), pa.string()))
            return batch.filter(m).select([obj_col])

        new = set()
        for b in triples_ds.map_batches(
                expand, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            new.update(b.column(obj_col).to_pylist())
        frontier = {e for e in new if e not in reached}
        for e in frontier:
            reached[e] = hop
    return reached


def connected_components(triples_ds, max_iters: int = 20,
                         subj_col="subj", obj_col="obj"):
    """Undirected connected components via min-label propagation.

    Each iteration: every vertex adopts the min label among itself and its
    neighbors (one bucketed aggregate over edge endpoints). Terminates when
    no label changes. Returns a pandas frame (entity, component) where
    component = min entity id in the component.
    """
    import ray.data as rd

    def edge_frame(batch: pa.Table) -> pa.Table:
        s = batch.column(subj_col).to_pylist()
        o = batch.column(obj_col).to_pylist()
        return pa.table({"a": pa.array(s + o, pa.string()),
                         "b": pa.array(o + s, pa.string())})

    edges = triples_ds.map_batches(
        edge_frame, batch_format="pyarrow").materialize()

    # labels start as self; stored driver-side as a frame, joined per round
    # via broadcast (entity count << edge count for typical KGs; for
    # web-scale vertex sets the label table would itself be a Dataset and
    # the join a bucketed shuffle — same algorithm, bigger exchange)
    labels: dict[str, str] = {}
    for b in edges.iter_batches(batch_format="pyarrow"):
        for v in b.column("a").to_pylist():
            if v not in labels or labels[v] > v:
                labels[v] = min(labels.get(v, v), v)

    import ray

    for _ in range(max_iters):
        ref = ray.put(labels)

        def propose(batch: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            return pa.table({
                "entity": pa.array(a, pa.string()),
                "cand": pa.array([lab[x] for x in b], pa.string()),
            })

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("entity", as_index=False)["cand"].min()

        mins = hash_bucket_aggregate(
            edges.map_batches(propose, batch_format="pyarrow"),
            ["entity"], per_bucket, n_buckets=16).to_pandas()
        changed = False
        for ent, cand in zip(mins["entity"], mins["cand"]):
            if cand < labels[ent]:
                labels[ent] = cand
                changed = True
        if not changed:
            break
    return pd.DataFrame({"entity": list(labels.keys()),
                         "component": list(labels.values())})
