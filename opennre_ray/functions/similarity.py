"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one dense matmul against it, a partial
top-k per batch, then a tiny global merge. Scale path: LSH-bucketed search
(probe only matching hyperplane buckets) for corpora where even one matmul
pass is too expensive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sqlcompat import sql_round


def _as_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> / fixed_size_list arrow column → (N, D) matrix.

    Near-zero-copy: flatten the list values to one contiguous numpy view and
    reshape — never ``to_pylist()`` (which boxes every float through Python,
    measured ~20× slower on wide embedding columns). ``flatten()`` respects
    chunk slicing/offsets for both list and fixed_size_list layouts.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if isinstance(col, pa.ExtensionArray):
        # Ray tensor extension type (ndarray-valued columns): already a
        # contiguous (N, D) block under the hood
        return np.asarray(col.to_numpy(zero_copy_only=False),
                          dtype=dtype).reshape(n, -1)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return flat.reshape(0, 0).astype(dtype, copy=False)
    d, rem = divmod(flat.size, n)
    if rem:
        raise ValueError("ragged embedding column (unequal vector lengths)")
    return flat.reshape(n, d).astype(dtype, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _empty_topk(query_ids, key_type: pa.DataType) -> pa.Table:
    """Schema-correct empty partial-top-k table: query_id type inferred
    from the actual query ids, neighbor_id from the batch key column — a
    hardcoded int64 would conflict with string-keyed datasets at schema
    unification time."""
    qid_t = (pa.array(list(query_ids)).type if len(query_ids)
             else pa.int64())
    return pa.table({"query_id": pa.array([], qid_t),
                     "neighbor_id": pa.array([], key_type),
                     "cosine": pa.array([], pa.float64())})


class PartialTopK:
    """map_batches stage: per-batch cosine top-k against broadcast queries.

    Emits ≤ (n_queries × k) candidate rows per batch; the global answer is
    the top-k of the union of partials (associative merge), so the final
    reduce handles kilobytes regardless of corpus size.
    """

    def __init__(self, queries_ref, k: int, key_col="vec_id",
                 vec_col="embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.query_ids, qmat = q
        self.qn = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.key_col = key_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:         # (0,0) matrix breaks the matmul
            return _empty_topk(self.query_ids,
                               batch.column(self.key_col).type)
        mat = _normalize(_as_matrix(batch.column(self.vec_col)))
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        # rank on the ROUNDED value with the neighbor-id tiebreak, exactly
        # like the oracle's ORDER BY round(cosine,6) DESC, neighbor_id —
        # raw-cosine argpartition could pick the wrong member of a tie at
        # the k boundary
        sims = sql_round(self.qn @ mat.T, 6)        # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.query_ids)):
            order = np.lexsort((keys, -sims[qi]))[:k]
            out_q.extend([self.query_ids[qi]] * len(order))
            out_n.extend(keys[order].tolist())
            out_s.extend(sims[qi, order].tolist())
        return pa.table({
            "query_id": pa.array(out_q),
            "neighbor_id": pa.array(out_n),
            "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
        })


def knn_brute_force(ds_emb, query_ids, query_matrix, k=10,
                    key_col="vec_id", vec_col="embedding"):
    """Exact cosine top-k for each query vector. Returns a small pa.Table
    (query_id, neighbor_id, cosine, rank) sorted deterministically."""
    import ray

    ref = ray.put((list(query_ids), np.asarray(query_matrix)))
    ref_key = ref.hex()

    def topk_batch(batch):
        from ..stages.score import cached

        stage = cached(("knn", ref_key, k, key_col, vec_col),
                       lambda: PartialTopK(ref, k, key_col=key_col,
                                           vec_col=vec_col))
        return stage(batch)

    partials = ds_emb.map_batches(topk_batch, batch_format="pyarrow")
    # global merge: tiny — (#batches × Q × k) rows
    import pandas as pd
    pdf = partials.to_pandas()
    out = []
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out).sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res.reset_index(drop=True),
                                preserve_index=False)


def knn_graph(ds_emb, k: int = 3, *, key_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Self-kNN GRAPH construction: every vector's exact top-k cosine
    neighbors, self excluded — the named first step of SemDeDup-style
    semantic dedup and graph-based diversity sampling.

    The normalized corpus matrix broadcasts ONCE (``ray.put``) and each
    streaming block computes its rows' similarities against it — because
    the broadcast side holds ALL candidate neighbors, one pass per block
    is already exact: no partial-top-k merge, no shuffle at all. Scale
    note: this is the broadcast-corpus path (fine while N·D floats fit
    the object store — 100 TB corpora use the IVF/LSH variants as the
    candidate stage and this only within cells). Cosines are rounded to
    1e-6 BEFORE ranking so the (−cosine, neighbor_id) order matches SQL
    ``ORDER BY`` exactly. Returns (vec_id, neighbor_id, cosine, rank).
    """
    import ray

    tbl = pa.concat_tables(
        [t.select([key_col, vec_col])
         for t in ray.get(ds_emb.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ids = tbl.column(key_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_as_matrix(tbl.column(vec_col)))
    ref = ray.put((ids, mat))
    ref_key = ref.hex()

    def topk_batch(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        key_type = batch.schema.field(key_col).type
        if batch.num_rows == 0:
            return pa.table({
                key_col: pa.array([], key_type),
                "neighbor_id": pa.array([], key_type),
                "cosine": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64())})
        all_ids, all_mat = cached(("knng", ref_key),
                                  lambda: ray.get(ref))
        q = _normalize(_as_matrix(batch.column(vec_col)))
        qids = batch.column(key_col).to_numpy(zero_copy_only=False)
        sims = np.round(q @ all_mat.T, 6)
        out_q, out_n, out_c, out_r = [], [], [], []
        for row, qid in enumerate(qids):
            s = sims[row]
            mask = all_ids != qid                   # exclude self
            cand_s = s[mask]
            cand_i = all_ids[mask]
            # top-k by (-cosine, neighbor_id): lexsort is stable+exact
            order = np.lexsort((cand_i, -cand_s))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(cand_i[order])
            out_c.extend(cand_s[order])
            out_r.extend(range(1, len(order) + 1))
        return pa.table({
            key_col: pa.array(out_q, key_type),
            "neighbor_id": pa.array(out_n, key_type),
            "cosine": pa.array(np.asarray(out_c, dtype=np.float64)),
            "rank": pa.array(np.asarray(out_r, dtype=np.int64))})

    return ds_emb.map_batches(topk_batch, batch_format="pyarrow")


def triplet_mine(ds_emb, *, key_col: str = "vec_id",
                 vec_col: str = "embedding", label_col: str = "label"):
    """Hard-triplet mining for metric/retrieval training: for each
    anchor, the most-similar SAME-label vector (positive) and the
    most-similar DIFFERENT-label vector (hard negative) — the classic
    batch-hard selection (Hermans et al. 2017), here corpus-global
    rather than minibatch-local.

    Same one-pass broadcast-corpus shape as ``knn_graph``: the
    normalized matrix + labels ship once, each streaming block scans its
    rows against them, and ties break by (−cosine, candidate id) on
    1e-6-rounded cosines so SQL ``row_number`` replays the choice.
    Anchors whose label has no other member are dropped (no positive
    exists). Returns (key, pos_id, pos_cos, neg_id, neg_cos).
    """
    import ray

    tbl = pa.concat_tables(
        [t.select([key_col, vec_col, label_col])
         for t in ray.get(ds_emb.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ids = tbl.column(key_col).to_numpy(zero_copy_only=False)
    labels = tbl.column(label_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_as_matrix(tbl.column(vec_col)))
    ref = ray.put((ids, labels, mat))
    ref_key = ref.hex()

    def mine_batch(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        all_ids, all_lab, all_mat = cached(("triplet", ref_key),
                                           lambda: ray.get(ref))
        q = _normalize(_as_matrix(batch.column(vec_col)))
        qids = batch.column(key_col).to_numpy(zero_copy_only=False)
        qlab = batch.column(label_col).to_numpy(zero_copy_only=False)
        sims = np.round(q @ all_mat.T, 6)

        def best(s, mask):
            idx = np.flatnonzero(mask)
            if not len(idx):
                return None
            order = np.lexsort((all_ids[idx], -s[idx]))
            j = idx[order[0]]
            return all_ids[j], s[j]

        rows = []
        for r, (qid, ql) in enumerate(zip(qids, qlab)):
            s = sims[r]
            not_self = all_ids != qid
            pos = best(s, not_self & (all_lab == ql))
            neg = best(s, not_self & (all_lab != ql))
            if pos is None or neg is None:
                continue
            rows.append((qid, pos[0], pos[1], neg[0], neg[1]))
        if not rows:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "pos_id": pa.array([], pa.int64()),
                "pos_cos": pa.array([], pa.float64()),
                "neg_id": pa.array([], pa.int64()),
                "neg_cos": pa.array([], pa.float64())})
        cols = list(zip(*rows))
        return pa.table({
            key_col: pa.array(np.asarray(cols[0], dtype=np.int64)),
            "pos_id": pa.array(np.asarray(cols[1], dtype=np.int64)),
            "pos_cos": pa.array(np.asarray(cols[2], dtype=np.float64)),
            "neg_id": pa.array(np.asarray(cols[3], dtype=np.int64)),
            "neg_cos": pa.array(np.asarray(cols[4], dtype=np.float64))})

    return ds_emb.map_batches(mine_batch, batch_format="pyarrow")


def cosine_pair_join(ds_emb, threshold: float = 0.9,
                     key_col: str = "vec_id", vec_col: str = "embedding"):
    """EXACT thresholded cosine self-join: all pairs (id_a < id_b) with
    round(cosine, 6) >= threshold.

    Shape: block-pair tasks over the Dataset's Arrow blocks — block i × j
    for i <= j, each one dense matmul, emitting only the (tiny) passing
    pairs. This is the exact baseline; O(B²) block pairs means it is the
    small/medium-corpus path — at 100 TB use the LSH-bucketed
    ``dedup.embedding_dup_groups`` (candidates) + this join restricted to
    candidate buckets. Raw Ray tasks are used because the Dataset API has
    no self-cartesian; blocks are consumed as object refs (zero-copy, never
    re-shipped to the driver).
    """
    import ray

    def pack(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, vec_col])

    refs = ds_emb.map_batches(pack, batch_format="pyarrow").to_arrow_refs()

    @ray.remote
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        key_type = ta.column(key_col).type
        if ta.num_rows == 0 or tb.num_rows == 0:
            return pa.table({"id_a": pa.array([], key_type),
                             "id_b": pa.array([], key_type),
                             "cosine": pa.array([], pa.float64())})
        a = _normalize(_as_matrix(ta.column(vec_col)))
        b = a if same else _normalize(_as_matrix(tb.column(vec_col)))
        # to_numpy (not to_pylist) keeps the key dtype even for 0 hits
        ka = ta.column(key_col).to_numpy(zero_copy_only=False)
        kb = ka if same else tb.column(key_col).to_numpy(zero_copy_only=False)
        sims = sql_round(a @ b.T, 6)
        ii, jj = np.nonzero(sims >= threshold)
        ia, ib, s = ka[ii], kb[jj], sims[ii, jj]
        keep = ia < ib if same else ia != ib
        ia, ib, s = ia[keep], ib[keep], s[keep]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)   # orient id_a < id_b
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                         "cosine": pa.array(s, pa.float64())})

    import ray.data as rd

    tasks = [pair_task.remote(refs[i], refs[j], i == j)
             for i in range(len(refs)) for j in range(i, len(refs))]
    if not tasks:                       # still a Dataset, like every path
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    # results stay in the object store (a Dataset over the task outputs);
    # each unordered pair appears exactly once (a vector lives in one block
    # and block pairs are enumerated i<=j), so no dedup pass is needed
    return rd.from_arrow_refs(tasks)


def cosine_pair_join_lsh(ds_emb, threshold: float = 0.9,
                         key_col: str = "vec_id", vec_col: str = "embedding",
                         n_planes: int = 8, n_bands: int = 16,
                         seed: int = 11, rows_hint: int | None = None):
    """Thresholded cosine self-join with LSH-bucketed candidates — the
    100 TB path composed from ``cosine_pair_join``'s exact math.

    Banding (the MinHash-LSH recipe applied to random hyperplanes): each of
    ``n_bands`` independent sets of ``n_planes`` hyperplanes maps a vector
    to a sign-pattern bucket; vectors sharing ANY band's bucket become
    candidates, and the exact rounded-cosine test runs only inside buckets
    (one small dense matmul per group, identical arithmetic to the exact
    join). A pair at cosine ``c`` agrees on one plane w.p.
    ``1 - arccos(c)/π``, so recall ≈ ``1-(1-p^n_planes)^n_bands`` — 0.996+
    at the default setting for c ≥ 0.9, and tunable to any target by
    raising ``n_bands``. Output ⊆ the exact join by construction (same
    predicate), ⊇ it with probability controlled by the banding.

    Scale shape: the shuffle moves ``n_bands`` copies of (key, vector) —
    linear in corpus size, vs the exact join's O(blocks²) matmuls. Pair
    dedup across bands is a second (id_a, id_b)-bucketed pass over the
    (tiny) passing pairs only.
    """
    import pandas as pd

    from .relational import hash_bucket_aggregate

    class BandSig:
        def __init__(self):
            self.planes = None          # (D, n_bands * n_planes), lazy on D

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _as_matrix(batch.column(vec_col))
            if self.planes is None or self.planes.shape[0] != mat.shape[1]:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal(
                    (mat.shape[1], n_bands * n_planes))
            bits = (mat @ self.planes) > 0                    # (N, B*P)
            bits = bits.reshape(len(mat), n_bands, n_planes)
            weights = 1 << np.arange(n_planes)
            sig = (bits * weights).sum(axis=2).astype(np.int64)  # (N, B)
            n = batch.num_rows
            keys = batch.column(key_col)
            return pa.table({
                "band": pa.array(np.repeat(np.arange(n_bands,
                                                     dtype=np.int64), n)),
                "sig": pa.array(sig.T.reshape(-1)),
                key_col: pa.concat_arrays(
                    [keys.combine_chunks() if isinstance(keys,
                                                         pa.ChunkedArray)
                     else keys] * n_bands),
                vec_col: pa.concat_arrays(
                    [batch.column(vec_col).combine_chunks()
                     if isinstance(batch.column(vec_col), pa.ChunkedArray)
                     else batch.column(vec_col)] * n_bands),
            })

    def sig_batch(batch):
        from ..stages.score import cached

        stage = cached(("pairlsh", seed, n_planes, n_bands, key_col,
                        vec_col), BandSig)
        return stage(batch)

    banded = ds_emb.map_batches(sig_batch, batch_format="pyarrow")

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket may span several (band, sig) groups — pairs only form
        # within a (band, sig) group, exactly the LSH candidate predicate
        parts = []
        for (_, _), grp in g.groupby(["band", "sig"], sort=False):
            if len(grp) < 2:
                continue
            mat = _normalize(np.stack(grp[vec_col].to_numpy())
                             .astype(np.float64))
            keys = grp[key_col].to_numpy()
            sims = sql_round(mat @ mat.T, 6)        # same math as exact join
            ii, jj = np.nonzero(sims >= threshold)
            keep = keys[ii] < keys[jj]
            if keep.any():
                parts.append(pd.DataFrame({
                    "id_a": keys[ii][keep], "id_b": keys[jj][keep],
                    "cosine": sims[ii, jj][keep]}))
        if not parts:
            return pd.DataFrame({"id_a": pd.Series(dtype=g[key_col].dtype),
                                 "id_b": pd.Series(dtype=g[key_col].dtype),
                                 "cosine": pd.Series(dtype="float64")})
        return pd.concat(parts, ignore_index=True)

    cand = hash_bucket_aggregate(
        banded, ["band", "sig"], in_bucket,
        rows_hint=None if rows_hint is None else rows_hint * n_bands)

    # a pair found by several bands appears once per band → exact dedup on
    # the (tiny) pair set
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])

    return hash_bucket_aggregate(cand, ["id_a", "id_b"], dedup)


def _kmeans_lite(sample: np.ndarray, n_centroids: int, n_iters: int = 10,
                 seed: int = 17) -> np.ndarray:
    """Seeded Lloyd's k-means on L2-normalized vectors (numpy only).

    Coarse quantizer training for IVF — a few iterations on a driver-side
    sample is the standard recipe (the sample is small; the corpus never
    reaches the driver). Empty clusters are re-seeded from the farthest
    points to keep ``n_centroids`` live.
    """
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    cents = x[rng.choice(n, min(n_centroids, n), replace=False)].copy()
    for _ in range(n_iters):
        sims = x @ cents.T                      # cosine == dot (normalized)
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                cents[c] = x[sims.max(axis=1).argmin()]
        cents = _normalize(cents)
    return cents


def knn_ivf(ds_emb, query_ids, query_matrix, k=10, n_centroids=32,
            nprobe=8, sample_size=2048, seed=17,
            key_col="vec_id", vec_col="embedding"):
    """IVF approximate top-k: probe only the ``nprobe`` nearest centroid
    cells per query.

    Scale shape: the coarse quantizer trains on a driver-side sample;
    centroids broadcast once; every batch assigns its vectors to cells
    (one small matmul) and scores a query only against vectors in that
    query's probed cells (vectorized mask). Per-batch output stays
    ≤ queries × k rows, merged exactly like the brute-force path. With
    ``nprobe == n_centroids`` recall is 1.0 by construction.
    """
    import ray

    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    sample_tables = [ray.get(r) for r in
                     ds_emb.limit(sample_size).to_arrow_refs()]
    sample = _as_matrix(pa.concat_tables(sample_tables).column(vec_col))
    cents = _kmeans_lite(sample, n_centroids, seed=seed)
    # per query: indices of its nprobe nearest cells
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((list(query_ids), qmat, cents, probe))
    ref_key = ref.hex()

    class CellTopK:
        def __init__(self):
            self.query_ids, self.qn, self.cents, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_topk(self.query_ids,
                                   batch.column(key_col).type)
            mat = _normalize(_as_matrix(batch.column(vec_col)))
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            assign = (mat @ self.cents.T).argmax(axis=1)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.query_ids)):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                sims = sql_round(mat[m] @ self.qn[qi], 6)
                sub_keys = keys[m]
                kk = min(k, len(sims))
                order = np.lexsort((sub_keys, -sims))[:kk]
                out_q.extend([self.query_ids[qi]] * kk)
                out_n.extend(sub_keys[order].tolist())
                out_s.extend(sims[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
            })

    def cell_topk_batch(batch):
        from ..stages.score import cached

        stage = cached(("knn_ivf", ref_key, k), CellTopK)
        return stage(batch)

    partials = ds_emb.map_batches(cell_topk_batch, batch_format="pyarrow")
    import pandas as pd
    pdf = partials.to_pandas()
    if not len(pdf):
        return pa.table({"query_id": [], "neighbor_id": [],
                         "cosine": [], "rank": []})
    out = []
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out).sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res.reset_index(drop=True),
                                preserve_index=False)


def knn_lsh(ds_emb, query_ids, query_matrix, k=10, n_planes=8, seed=11,
            key_col="vec_id", vec_col="embedding"):
    """Approximate top-k: probe only vectors in the query's hyperplane bucket.

    Recall < 1 by design; the bucket predicate turns the scan into a
    filter + small matmul. Same output schema as ``knn_brute_force``.
    """
    import ray

    qmat = np.asarray(query_matrix, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((qmat.shape[1], n_planes))
    qsig = ((qmat @ planes) > 0).astype(np.int64)
    qbuckets = (qsig * (1 << np.arange(n_planes))).sum(axis=1)
    ref = ray.put((list(query_ids), qmat, planes, qbuckets))

    class BucketTopK:
        def __init__(self):
            self.query_ids, qm, self.planes, self.qbuckets = ray.get(ref)
            self.qn = _normalize(qm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_topk(self.query_ids,
                                   batch.column(key_col).type)
            mat = _as_matrix(batch.column(vec_col))
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            bits = (mat @ self.planes) > 0
            buckets = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
            matn = _normalize(mat)
            out_q, out_n, out_s = [], [], []
            for qi, qb in enumerate(self.qbuckets):
                m = buckets == qb
                if not m.any():
                    continue
                sims = matn[m] @ self.qn[qi]
                kk = min(k, len(sims))
                sel = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([self.query_ids[qi]] * kk)
                out_n.extend(keys[m][sel].tolist())
                out_s.extend(sims[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(sql_round(out_s, 6), pa.float64()),
            })

    ref_key = ref.hex()

    def bucket_topk_batch(batch):
        from ..stages.score import cached

        stage = cached(("knn_lsh", ref_key, k), BucketTopK)
        return stage(batch)

    partials = ds_emb.map_batches(bucket_topk_batch, batch_format="pyarrow")
    import pandas as pd
    pdf = partials.to_pandas()
    out = []
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    if not out:
        return pa.table({"query_id": [], "neighbor_id": [],
                         "cosine": [], "rank": []})
    res = pd.concat(out).sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res.reset_index(drop=True),
                                preserve_index=False)


def _train_pq_codebooks(sample: np.ndarray, m: int, ksub: int,
                        seed: int = 29, n_iters: int = 10) -> np.ndarray:
    """Seeded per-subspace Lloyd k-means (euclidean) on an L2-normalized
    sample → (m, ksub, dsub) codebooks. Standard PQ training recipe
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011): codebooks train on a driver-side sample; the corpus
    itself never reaches the driver."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ksub = min(ksub, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        c = xs[rng.choice(n, ksub, replace=False)].copy()
        for _ in range(n_iters):
            d2 = ((xs * xs).sum(1, keepdims=True) + (c * c).sum(1)[None, :]
                  - 2 * (xs @ c.T))
            a = d2.argmin(axis=1)
            for j in range(ksub):
                mem = xs[a == j]
                if len(mem):
                    c[j] = mem.mean(axis=0)
                else:                       # re-seed dead code from the
                    c[j] = xs[d2.min(axis=1).argmax()]   # worst-fit point
        books[s] = c
    return books


def _pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, D) normalized vectors → (n, m) uint8 codes (nearest sub-centroid
    per subspace, euclidean; argmin takes the first minimum → smallest
    code id on ties, so encoding is order-independent)."""
    n = len(mat)
    m, ksub, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        xs = mat[:, s * dsub:(s + 1) * dsub]
        c = books[s]
        d2 = ((xs * xs).sum(1, keepdims=True) + (c * c).sum(1)[None, :]
              - 2 * (xs @ c.T))
        codes[:, s] = d2.argmin(axis=1)
    return codes


def knn_pq(ds_emb, query_ids, query_matrix, k=10, m=8, ksub=16,
           sample_size=2048, seed=29, key_col="vec_id",
           vec_col="embedding"):
    """Product-quantization ANN with asymmetric distance (ADC): each data
    vector is compressed to ``m`` one-byte codes; a query scores a vector
    by summing m lookup-table entries instead of a D-dim dot product.

    Scale shape: codebooks train once on a driver-side sample and
    broadcast (m·ksub·dsub doubles — kilobytes); every batch encodes its
    vectors (m small matmuls) and scores ALL queries with pure table
    gathers (`lut[:, codes]` — no per-row Python, no D-dim arithmetic per
    candidate). Memory per vector drops D·4 bytes → m bytes (32× here),
    which is what makes a 100 TB corpus scannable: the encode pass writes
    the code table once, and subsequent queries scan codes only. Per-batch
    output stays ≤ queries × k rows, merged exactly like the brute-force
    path. Approximate by construction; recall is bounded in tests against
    ``knn_brute_force``.
    """
    import ray

    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    sample_tables = [ray.get(r) for r in
                     ds_emb.limit(sample_size).to_arrow_refs()]
    sample = _as_matrix(pa.concat_tables(sample_tables).column(vec_col))
    books = _train_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)
    mm, kk_sub, dsub = books.shape
    # ADC lookup tables: lut[q, s, j] = q_sub(s) · centroid(s, j)
    luts = np.einsum("qsd,sjd->qsj", qmat.reshape(len(qmat), mm, dsub),
                     books)
    ref = ray.put((list(query_ids), luts, books))
    ref_key = ref.hex()

    class PQTopK:
        def __init__(self):
            self.query_ids, self.luts, self.books = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_topk(self.query_ids,
                                   batch.column(key_col).type)
            mat = _normalize(_as_matrix(batch.column(vec_col)))
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            codes = _pq_encode(mat, self.books)          # (n, m)
            n, m_ = codes.shape
            out_q, out_n, out_s = [], [], []
            cols = np.arange(m_)
            for qi in range(len(self.query_ids)):
                # gather-sum: approx cosine = Σ_s lut[s, code_s]
                sims = sql_round(
                    self.luts[qi][cols, codes].sum(axis=1), 6)
                kk = min(k, n)
                order = np.lexsort((keys, -sims))[:kk]
                out_q.extend([self.query_ids[qi]] * kk)
                out_n.extend(keys[order].tolist())
                out_s.extend(sims[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
            })

    def pq_topk_batch(batch):
        from ..stages.score import cached

        stage = cached(("knn_pq", ref_key, k), PQTopK)
        return stage(batch)

    partials = ds_emb.map_batches(pq_topk_batch, batch_format="pyarrow")
    import pandas as pd
    pdf = partials.to_pandas()
    if not len(pdf):
        return pa.table({"query_id": [], "neighbor_id": [],
                         "cosine": [], "rank": []})
    out = []
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out).sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(res.reset_index(drop=True),
                                preserve_index=False)


KM_SCALE = 10 ** 6


def _trunc_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero — SQL ``//`` semantics
    (Python/numpy ``//`` floors, which differs on negative sums)."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def kmeans_fixed_point(ds_emb, k: int = 8, iters: int = 3,
                       scale: int = KM_SCALE, id_col: str = "vec_id",
                       vec_col: str = "embedding", keep_vec: bool = False):
    """Distributed Lloyd k-means in integer fixed-point arithmetic.

    Float k-means is not reproducible across distributions (non-associative
    float sums in the centroid update). Here every coordinate is quantized
    once — ``floor(x * scale)`` in float64, identical IEEE ops to the SQL
    ``floor(x * 1e6)`` — and all distances/updates are int64, so the
    distributed result is bit-identical to a sequential or chained-CTE SQL
    replay (tie-breaks: argmin → smallest cluster id; centroid division
    truncates toward zero like SQL ``//``; empty clusters keep their
    previous centroid).

    Per iteration: ONE streaming pass — each batch computes assignments
    against the broadcast (``ray.put``) k×D centroid matrix and emits only
    per-cluster partial sums + counts (k rows/batch, order-independent
    int64 adds), which the driver folds into new centroids. The corpus
    never moves and nothing row-sized reaches the driver; a final
    assignment pass emits (id, cluster). Init: the k smallest ids (exact,
    via map-side partial bottom-k — no global sort).

    Overflow bounds (int64): dist² ≤ D·(2·scale·|x|ₘₐₓ)², per-cluster sums
    ≤ n·scale·|x|ₘₐₓ — safe past 10¹² rows for unit-norm-ish embeddings.
    """
    import ray

    def quantize(col) -> np.ndarray:
        return np.floor(_as_matrix(col, np.float64) * scale).astype(np.int64)

    # --- init: k smallest ids, map-side partial bottom-k then tiny merge
    def partial_min(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if not len(ids):
            return batch.select([id_col, vec_col])
        order = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(order))

    cand = pa.concat_tables(
        t for t in ds_emb.map_batches(partial_min, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if t.num_rows)
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    cand = cand.take(pa.array(order))
    cents = quantize(cand.column(vec_col))           # (k', D) int64
    kk, dim = cents.shape

    # --- Lloyd iterations: assignment + partial-stat pass per round
    def assign(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        # ||p-c||² = p² + c² - 2p·c, all int64 (exact); argmin takes the
        # FIRST minimum → smallest cluster id, matching ORDER BY dist, cluster
        d2 = ((mat * mat).sum(1, keepdims=True)
              + (c * c).sum(1)[None, :] - 2 * (mat @ c.T))
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        ref = ray.put(cents)

        def stats(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            mat = quantize(batch.column(vec_col))
            if not len(mat):
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.int64(), dim))})
            a = assign(mat, c)
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, a, mat)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel()), dim)})

        tot_s = np.zeros((kk, dim), dtype=np.int64)
        tot_c = np.zeros(kk, dtype=np.int64)
        for b in ds_emb.map_batches(stats, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            sums = (b.column("sums").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).reshape(-1, dim))
            np.add.at(tot_s, cl, sums)
            np.add.at(tot_c, cl,
                      b.column("cnt").to_numpy(zero_copy_only=False))
        cents = np.where(tot_c[:, None] > 0,
                         _trunc_div(tot_s, np.maximum(tot_c, 1)[:, None]),
                         cents)

    # --- final assignment pass under the converged centroids
    ref = ray.put(cents)

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = quantize(batch.column(vec_col))
        a = (assign(mat, c) if len(mat)
             else np.array([], dtype=np.int64))
        cols = {id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64))}
        if keep_vec:
            cols[vec_col] = batch.column(vec_col)
        return pa.table(cols)

    return ds_emb.map_batches(label, batch_format="pyarrow")


def kcenter_coreset(ds_emb, k: int = 8, scale: int = KM_SCALE,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Greedy k-center coreset selection (Gonzalez farthest-point — the
    classic 2-approximation for the k-center objective), the standard
    diversity-sampling primitive for curation: pick k maximally-spread
    exemplars so a small subset covers the embedding space.

    Determinism: coordinates quantize once (``floor(x*scale)``, same IEEE
    ops as the SQL ``floor(x*1e6)``) and every distance is exact int64,
    so argmax ties break identically everywhere (max dist, then smallest
    id). Center 0 = smallest id.

    Scale shape: k streaming passes; each block computes min-distance to
    the broadcast (ray.put) center matrix (≤ k×D ints) and emits ONE
    winning candidate row, so only blocks-many rows reach the driver per
    round and the corpus never shuffles. Already-selected ids are
    excluded per block so duplicate points can't re-win at distance 0.

    Returns an arrow table (rank, id, dist): dist = squared quantized
    distance to the previously-selected set at selection time (0 for the
    seed center).
    """
    import ray

    def quantize(col) -> np.ndarray:
        return np.floor(_as_matrix(col, np.float64) * scale).astype(np.int64)

    def partial_min(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if not len(ids):
            return batch.select([id_col, vec_col])
        o = np.argsort(ids, kind="stable")[:1]
        return batch.select([id_col, vec_col]).take(pa.array(o))

    cand = pa.concat_tables(
        t for t in ds_emb.map_batches(partial_min, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if t.num_rows)
    ids0 = cand.column(id_col).to_numpy(zero_copy_only=False)
    first = int(np.argmin(ids0))
    sel_ids = [int(ids0[first])]
    sel_vecs = quantize(cand.column(vec_col))[first:first + 1]
    sel_dist = [0]
    dim = sel_vecs.shape[1]

    for r in range(1, k):
        ref = ray.put((np.asarray(sel_ids, np.int64), sel_vecs.copy()))

        def block_winner(batch: pa.Table) -> pa.Table:
            cids, cvecs = ray.get(ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            mat = quantize(batch.column(vec_col)) if batch.num_rows else \
                np.empty((0, dim), np.int64)
            keep = ~np.isin(ids, cids)
            ids, mat = ids[keep], mat[keep]
            if not len(ids):
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.int64(), dim))})
            d2 = ((mat * mat).sum(1, keepdims=True)
                  + (cvecs * cvecs).sum(1)[None, :] - 2 * (mat @ cvecs.T))
            mind = d2.min(axis=1)
            o = np.lexsort((ids, -mind))[:1]
            return pa.table({
                id_col: pa.array(ids[o]),
                "dist": pa.array(mind[o]),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat[o].ravel()), dim)})

        t = pa.concat_tables(
            b for b in ds_emb.map_batches(block_winner,
                                          batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if b.num_rows)
        bids = t.column(id_col).to_numpy(zero_copy_only=False)
        bd = t.column("dist").to_numpy(zero_copy_only=False)
        w = int(np.lexsort((bids, -bd))[0])
        sel_ids.append(int(bids[w]))
        sel_dist.append(int(bd[w]))
        v = (t.column("vec").combine_chunks().flatten()
             .to_numpy(zero_copy_only=False).reshape(-1, dim))[w]
        sel_vecs = np.vstack([sel_vecs, v[None, :]])

    return pa.table({
        "rank": pa.array(np.arange(len(sel_ids), dtype=np.int64)),
        id_col: pa.array(np.asarray(sel_ids, np.int64)),
        "dist": pa.array(np.asarray(sel_dist, np.int64))})


def jl_project(ds_emb, in_dim: int, out_dim: int = 16, seed: int = 31,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Johnson-Lindenstrauss random projection (dimensionality reduction).

    A seeded Gaussian matrix R (in_dim × out_dim) maps each vector to
    x·R / sqrt(out_dim) — pairwise distances are preserved within
    (1±ε) w.h.p. (the JL lemma), which is the standard pre-step before
    expensive pairwise work on wide embeddings. Stateless one-pass
    ``map_batches`` matmul; R is a few KB and ships in the task closure.

    Output is LONG form (id, dim, val) with ``val`` rounded at 6 so the
    distributed result is value-identical to a SQL replay that embeds R
    as literals and group-sums x_i·R_ij (float sum order differs only at
    ulp scale; rounding absorbs it).
    """
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)

    def project(batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column(vec_col))
        if mat.shape[0] and mat.shape[1] != in_dim:
            raise ValueError(
                f"expected {in_dim}-dim embeddings, got {mat.shape[1]}")
        proj = sql_round(mat @ R, 6) if len(mat) else \
            np.empty((0, out_dim))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, out_dim)),
            "dim": pa.array(np.tile(np.arange(1, out_dim + 1,
                                              dtype=np.int64), len(mat))),
            "val": pa.array(proj.ravel(), pa.float64()),
        })

    return ds_emb.map_batches(project, batch_format="pyarrow")


def jl_matrix_sql_literals(in_dim: int, out_dim: int = 16,
                           seed: int = 31) -> str:
    """The exact R/sqrt(out_dim) entries as SQL VALUES rows ``(i, j, v)``
    (1-based dims) — repr round-trips each double bit-exactly."""
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
    rows = ", ".join(
        f"({i + 1}, {j + 1}, {R[i, j]!r})"
        for i in range(in_dim) for j in range(out_dim))
    return rows


def scalar_quantize_stats(ds_emb, scale: int = KM_SCALE,
                          vec_col: str = "embedding",
                          levels: int = 255) -> pd.DataFrame:
    """int8-style scalar quantization audit: per-dimension global range,
    uniform quantization to ``levels`` steps, and exact reconstruction
    error — the compression/recall trade a vector index makes before
    choosing SQ vs PQ.

    Everything is integer after the one ``floor(x * scale)`` quantize
    (identical IEEE ops to the SQL ``floor(x * 1e6)``), so the distributed
    result is bit-identical to the DuckDB replay. Two streaming passes,
    nothing row-sized on the driver:

    - pass 1: per-block per-dim (min, max) partials — D rows per block,
      folded to the global per-dim range on the driver (D-sized, ~KB);
    - pass 2: quantize q = ((v - mn) * levels) // span, reconstruct
      r = mn + (q * span) // levels, emit per-dim (sum|err|, max|err|, n)
      partials — again D rows per block, folded on the driver.

    All intermediates are >= 0 so int64 floor division matches DuckDB
    ``//`` exactly; (v - mn) * levels stays far below 2^63 for unit-ish
    embeddings at scale 1e6.
    """
    def quantize(col) -> np.ndarray:
        return np.floor(_as_matrix(col, np.float64) * scale).astype(np.int64)

    def mm_partial(batch: pa.Table) -> pa.Table:
        v = quantize(batch.column(vec_col))
        if not v.size:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        dims = np.arange(1, v.shape[1] + 1, dtype=np.int64)
        return pa.table({"dim": dims, "mn": v.min(axis=0),
                         "mx": v.max(axis=0)})

    mm = (ds_emb.map_batches(mm_partial, batch_format="pyarrow")
          .to_pandas().groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
          .sort_index())
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    span = mx - mn
    safe = np.where(span == 0, 1, span)

    def err_partial(batch: pa.Table) -> pa.Table:
        v = quantize(batch.column(vec_col))
        if not v.size:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "sum_abs_err": pa.array([], pa.int64()),
                             "max_abs_err": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        q = np.where(span == 0, 0, ((v - mn) * levels) // safe)
        recon = mn + (q * span) // levels
        err = np.abs(v - recon)
        dims = np.arange(1, v.shape[1] + 1, dtype=np.int64)
        n = np.full(v.shape[1], v.shape[0], dtype=np.int64)
        return pa.table({"dim": dims, "sum_abs_err": err.sum(axis=0),
                         "max_abs_err": err.max(axis=0), "n_vecs": n})

    parts = (ds_emb.map_batches(err_partial, batch_format="pyarrow")
             .to_pandas().groupby("dim")
             .agg(sum_abs_err=("sum_abs_err", "sum"),
                  max_abs_err=("max_abs_err", "max"),
                  n_vecs=("n_vecs", "sum")).sort_index())
    out = pd.DataFrame({
        "dim": mm.index.to_numpy(),
        "v_min": mn, "v_max": mx,
        "sum_abs_err": parts["sum_abs_err"].to_numpy(),
        "max_abs_err": parts["max_abs_err"].to_numpy(),
        "n_vecs": parts["n_vecs"].to_numpy(),
    })
    return out.astype({c: np.int64 for c in out.columns})
