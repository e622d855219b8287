"""Distributed TransE knowledge-graph-embedding training (Bordes et al.
2013, public) — the KG-side counterpart of the RE trainers in
``training.py``: the engine that BUILDS the graph (pipelines/kg.py) can
also learn entity/relation embeddings from it.

Reference contrast: the reference trains sentence/bag RE models only
(`/root/reference/opennre/framework/`); KG-embedding training over the
extracted graph is the pipeline extension.

Determinism is the design driver, same recipe as the fixed-point
PageRank/k-means operators:

- all FLOAT math (per-triple distances/gradients) happens against the
  same broadcast parameter snapshot, so every worker computes identical
  per-triple values regardless of partitioning;
- per-triple gradients are quantized ONCE to a 1e-6 integer grid and
  accumulated as int64 — integer sums commute, so the distributed
  epoch's gradient table is bit-identical to a sequential replay;
- the optimizer step (SGD + entity renormalization) runs once on the
  model-sized aggregate (the natural parameter-server location), in a
  fixed entity order.

Scale shape: triples stream through ``map_batches``; each batch emits
(id, grad-vector) partial rows that collapse through one bucketed
aggregate — the shuffle moves model-row-sized partials, never triples.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

GRAD_SCALE = 1_000_000


def _fp(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero quantization to the 1e-6 integer grid."""
    return (np.sign(x) * np.floor(np.abs(x) * GRAD_SCALE + 0.5)) \
        .astype(np.int64)


def _neg_index(subj: str, pred: str, obj: str, epoch: int,
               n_entities: int) -> int:
    h = int.from_bytes(hashlib.md5(
        f"neg:{epoch}:{subj}|{pred}|{obj}".encode()).digest()[:8], "big")
    return h % n_entities


def init_embeddings(entities: list[str], relations: list[str],
                    dim: int = 8, seed: int = 7):
    """Seeded uniform(-6/sqrt(d), 6/sqrt(d)) init over SORTED vocab order
    (deterministic given the vocab, like registry.py's seeded weights)."""
    rng = np.random.default_rng(seed)
    b = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-b, b, size=(len(entities), dim))
    rel = rng.uniform(-b, b, size=(len(relations), dim))
    ent /= np.linalg.norm(ent, axis=1, keepdims=True)
    return ent, rel


def _triple_grads(batch_rows, ent, rel, e_index, r_index, ents_sorted,
                  epoch: int, margin: float):
    """Per-triple fixed-point gradient contributions + loss (shared by the
    distributed batch UDF and the sequential oracle — one definition, no
    drift). Yields (kind, idx, grad_fp_vector) plus the total loss_fp."""
    n_ent = len(ents_sorted)
    contributions: dict[tuple[str, int], np.ndarray] = {}
    loss_fp = 0
    for s, p, o in batch_rows:
        hi, ri, ti = e_index[s], r_index[p], e_index[o]
        ci = _neg_index(s, p, o, epoch, n_ent)
        h, r, t = ent[hi], rel[ri], ent[ti]
        tneg = ent[ci]
        d_pos = float(((h + r - t) ** 2).sum())
        d_neg = float(((h + r - tneg) ** 2).sum())
        loss = margin + d_pos - d_neg
        if loss <= 0.0:
            continue
        loss_fp += int(np.floor(loss * GRAD_SCALE + 0.5))
        g_h = _fp(2.0 * (tneg - t))           # d(pos)-d(neg) wrt h (and r)
        g_t = _fp(-2.0 * (h + r - t))
        g_n = _fp(2.0 * (h + r - tneg))
        for kind, idx, g in (("e", hi, g_h), ("r", ri, g_h),
                             ("e", ti, g_t), ("e", ci, g_n)):
            key = (kind, idx)
            if key in contributions:
                contributions[key] = contributions[key] + g
            else:
                contributions[key] = g
    return contributions, loss_fp


def transe_train(triples_ds, *, dim: int = 8, epochs: int = 5,
                 lr: float = 0.05, margin: float = 1.0, seed: int = 7,
                 rows_hint: int | None = None):
    """Train TransE over a (subj, pred, obj) triple Dataset. Returns
    (entity_df, relation_df, per-epoch loss_fp list); the embedding
    frames carry the vectors as ``list<double>`` columns plus an exact
    int64 micro-unit checksum per row (pin-friendly).

    Per epoch: one streaming pass over the triples (broadcast parameter
    snapshot via ``ray.put``), one bucketed aggregate of (id,
    grad-vector) partials, a driver-side SGD step + renormalization over
    the model-sized table. Updates use the MEAN gradient (sum / corpus
    size) so the step size is corpus-size-stable — a raw full-batch sum
    diverged at 10x the triple count with the same lr. Bit-identical to
    :func:`transe_train_sequential` at any block count.
    """
    import ray

    from .relational import hash_bucket_aggregate

    mat = triples_ds.materialize()
    ents, rels = set(), set()
    for b in mat.iter_batches(batch_format="pyarrow"):
        ents.update(b.column("subj").to_pylist())
        ents.update(b.column("obj").to_pylist())
        rels.update(b.column("pred").to_pylist())
    ents_sorted, rels_sorted = sorted(ents), sorted(rels)
    e_index = {e: i for i, e in enumerate(ents_sorted)}
    r_index = {r: i for i, r in enumerate(rels_sorted)}
    ent, rel = init_embeddings(ents_sorted, rels_sorted, dim=dim,
                               seed=seed)

    losses: list[int] = []
    for epoch in range(epochs):
        # vocab indexes ride the broadcast ref (object store, fetched once
        # per worker) rather than the task closure — at open-web entity
        # cardinality the closure would re-ship the model per task
        ref = ray.put((ent, rel, e_index, r_index, ents_sorted))
        ref_key = ref.hex()

        def grad_partial(batch: pa.Table, epoch=epoch,
                         ref=ref, ref_key=ref_key) -> pa.Table:
            from ..stages.score import cached

            ent_w, rel_w, e_ix, r_ix, ents_s = cached(
                ("transe", ref_key), lambda: ray.get(ref))
            rows = list(zip(batch.column("subj").to_pylist(),
                            batch.column("pred").to_pylist(),
                            batch.column("obj").to_pylist()))
            contrib, loss_fp = _triple_grads(
                rows, ent_w, rel_w, e_ix, r_ix, ents_s, epoch, margin)
            kinds = [k for k, _ in contrib] + ["loss"]
            idxs = [i for _, i in contrib] + [-1]
            grads = [g.tolist() for g in contrib.values()] + \
                [[loss_fp] * dim]
            return pa.table({
                "kind": pa.array(kinds, pa.string()),
                "idx": pa.array(idxs, pa.int64()),
                "grad": pa.array(grads, pa.list_(pa.int64()))})

        def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for (kind, idx), grp in g.groupby(["kind", "idx"],
                                              sort=False):
                tot = np.sum(np.stack(
                    [np.asarray(v, dtype=np.int64)
                     for v in grp["grad"]]), axis=0)
                out.append((kind, idx, tot.tolist()))
            return pd.DataFrame(out, columns=["kind", "idx", "grad"])

        agg = hash_bucket_aggregate(
            mat.map_batches(grad_partial, batch_format="pyarrow"),
            ["kind", "idx"], sum_bucket,
            rows_hint=rows_hint).to_pandas()

        n_triples = mat.count()
        denom = float(GRAD_SCALE * max(n_triples, 1))
        loss_total = 0
        for row in agg.itertuples(index=False):
            g = np.asarray(row.grad, dtype=np.int64)
            if row.kind == "loss":
                loss_total += int(g[0])
            elif row.kind == "e":
                ent[row.idx] = ent[row.idx] - lr * (g / denom)
            else:
                rel[row.idx] = rel[row.idx] - lr * (g / denom)
        norms = np.linalg.norm(ent, axis=1, keepdims=True)
        ent = ent / np.where(norms == 0.0, 1.0, norms)
        losses.append(loss_total)

    def frame(names, mat_w):
        chk = _fp(mat_w).sum(axis=1)
        return pd.DataFrame({
            "name": names,
            "embedding": [row.tolist() for row in mat_w],
            "checksum_fp": chk.astype(np.int64)})

    return frame(ents_sorted, ent), frame(rels_sorted, rel), losses


def transe_train_sequential(triples: list[tuple[str, str, str]], *,
                            dim: int = 8, epochs: int = 5,
                            lr: float = 0.05, margin: float = 1.0,
                            seed: int = 7):
    """Single-process oracle: identical math via the shared
    ``_triple_grads``, global integer gradient accumulation, same SGD
    step order — the bit-exactness target for the distributed trainer."""
    ents_sorted = sorted({s for s, _, _ in triples}
                         | {o for _, _, o in triples})
    rels_sorted = sorted({p for _, p, _ in triples})
    e_index = {e: i for i, e in enumerate(ents_sorted)}
    r_index = {r: i for i, r in enumerate(rels_sorted)}
    ent, rel = init_embeddings(ents_sorted, rels_sorted, dim=dim,
                               seed=seed)
    losses = []
    for epoch in range(epochs):
        contrib, loss_fp = _triple_grads(
            triples, ent, rel, e_index, r_index, ents_sorted, epoch,
            margin)
        denom = float(GRAD_SCALE * max(len(triples), 1))
        for (kind, idx), g in contrib.items():
            if kind == "e":
                ent[idx] = ent[idx] - lr * (g / denom)
            else:
                rel[idx] = rel[idx] - lr * (g / denom)
        norms = np.linalg.norm(ent, axis=1, keepdims=True)
        ent = ent / np.where(norms == 0.0, 1.0, norms)
        losses.append(loss_fp)

    def frame(names, mat_w):
        chk = _fp(mat_w).sum(axis=1)
        return pd.DataFrame({
            "name": names,
            "embedding": [row.tolist() for row in mat_w],
            "checksum_fp": chk.astype(np.int64)})

    return frame(ents_sorted, ent), frame(rels_sorted, rel), losses


def link_prediction_eval(triples_ds, ent_df: pd.DataFrame,
                         rel_df: pd.DataFrame, *, hits_k: int = 10):
    """Tail link-prediction evaluation of trained embeddings (the
    standard KGE metric suite): for every (h, r, t) triple, rank the
    true tail among ALL entities by squared L2 distance of h + r to each
    candidate — rank = 1 + #entities strictly closer + #equal-distance
    entities preceding t in sorted entity order (deterministic total
    order, no float-tie ambiguity in the aggregate). Returns one row:
    (n_triples, mean_rank_fp, mrr_fp, hits_at_k) with the float metrics
    in exact 1e-6 fixed-point (sum of per-triple integer contributions /
    n — order-free, pin-friendly).

    Scale shape: embeddings broadcast once (``ray.put``); each batch
    scores its triples against the full candidate matrix vectorized
    (B × n_entities matmul — the brute-force kNN shape; an IVF-bucketed
    candidate set is the usual trick beyond ~10⁷ entities); only integer
    partial sums leave the tasks.
    """
    import ray

    names = list(ent_df["name"])
    e_index = {n: i for i, n in enumerate(names)}
    ent = np.stack([np.asarray(v, dtype=np.float64)
                    for v in ent_df["embedding"]])
    rel_map = {n: np.asarray(v, dtype=np.float64)
               for n, v in zip(rel_df["name"], rel_df["embedding"])}
    ref = ray.put((ent, e_index, rel_map))
    ref_key = ref.hex()

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        ent_w, e_ix, rels = cached(("lpeval", ref_key),
                                   lambda: ray.get(ref))
        n_rank = 0
        sum_rank = 0
        sum_mrr_fp = 0
        hits = 0
        for s, p, o in zip(batch.column("subj").to_pylist(),
                           batch.column("pred").to_pylist(),
                           batch.column("obj").to_pylist()):
            q = ent_w[e_ix[s]] + rels[p]
            d = ((ent_w - q) ** 2).sum(axis=1)
            ti = e_ix[o]
            dt = d[ti]
            rank = 1 + int((d < dt).sum()) + int((d[:ti] == dt).sum())
            n_rank += 1
            sum_rank += rank
            sum_mrr_fp += int(np.floor(1_000_000.0 / rank + 0.5))
            hits += int(rank <= hits_k)
        return pa.table({
            "n": pa.array([n_rank], pa.int64()),
            "sum_rank": pa.array([sum_rank], pa.int64()),
            "sum_mrr_fp": pa.array([sum_mrr_fp], pa.int64()),
            "hits": pa.array([hits], pa.int64())})

    parts = triples_ds.map_batches(
        partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    return pd.DataFrame({
        "n_triples": pd.Series([n], dtype=np.int64),
        "mean_rank_fp": pd.Series(
            [int(np.floor(parts["sum_rank"].sum() * 1_000_000.0
                          / max(n, 1) + 0.5))], dtype=np.int64),
        "mrr_fp": pd.Series(
            [int(np.floor(float(parts["sum_mrr_fp"].sum())
                          / max(n, 1) + 0.5))], dtype=np.int64),
        "hits_at_k": pd.Series([int(parts["hits"].sum())],
                               dtype=np.int64)})
