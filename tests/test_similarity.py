"""Similarity-search tests: brute-force cosine top-k vs numpy oracle; LSH."""

import numpy as np
import pytest

from opennre_ray.functions.similarity import knn_brute_force, knn_lsh


@pytest.fixture(scope="module")
def emb(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _oracle(sf_dir, query_ids, qmat, k):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    out = {}
    for qi, qid in enumerate(query_ids):
        sims = np.round(mat @ qn[qi], 6)
        order = np.lexsort((ids, -sims))[:k]
        out[qid] = list(zip(ids[order], sims[order]))
    return out


def test_knn_brute_force_matches_oracle(emb, sf_dir):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qmat = np.array(t.column("embedding").to_pylist()[:3], dtype=np.float64)
    qids = t.column("vec_id").to_pylist()[:3]
    res = knn_brute_force(emb, qids, qmat, k=5).to_pandas()
    oracle = _oracle(sf_dir, qids, qmat, 5)
    for qid in qids:
        g = res[res["query_id"] == qid].sort_values("rank")
        want = oracle[qid]
        assert list(g["neighbor_id"]) == [w[0] for w in want]
        np.testing.assert_allclose(g["cosine"], [w[1] for w in want], atol=1e-5)
        # self is its own nearest neighbor
        assert g.iloc[0]["neighbor_id"] == qid


def test_knn_lsh_recalls_self(emb, sf_dir):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qmat = np.array(t.column("embedding").to_pylist()[:4], dtype=np.float64)
    qids = t.column("vec_id").to_pylist()[:4]
    res = knn_lsh(emb, qids, qmat, k=5, n_planes=6).to_pandas()
    # approximate: each query must at least find itself (same bucket)
    for qid in qids:
        g = res[res["query_id"] == qid]
        assert qid in set(g["neighbor_id"])


def test_knn_ivf_recall_and_exactness(emb, sf_dir):
    """IVF: full-probe == brute force (recall 1.0 by construction);
    partial probe still recalls self and a solid fraction of the true
    top-k."""
    import pyarrow.parquet as pq

    from opennre_ray.functions.similarity import knn_ivf

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qmat = np.array(t.column("embedding").to_pylist()[:3], dtype=np.float64)
    qids = t.column("vec_id").to_pylist()[:3]
    k = 5
    exact = knn_brute_force(emb, qids, qmat, k=k).to_pandas()

    full = knn_ivf(emb, qids, qmat, k=k, n_centroids=8, nprobe=8).to_pandas()
    for qid in qids:
        want = list(exact[exact["query_id"] == qid]
                    .sort_values("rank")["neighbor_id"])
        got = list(full[full["query_id"] == qid]
                   .sort_values("rank")["neighbor_id"])
        assert got == want

    part = knn_ivf(emb, qids, qmat, k=k, n_centroids=8, nprobe=3).to_pandas()
    recalls = []
    for qid in qids:
        g = part[part["query_id"] == qid]
        assert qid in set(g["neighbor_id"])      # self always in own cell
        want = set(exact[exact["query_id"] == qid]["neighbor_id"])
        recalls.append(len(want & set(g["neighbor_id"])) / k)
    assert np.mean(recalls) >= 0.5


def test_cosine_pair_join_matches_numpy_oracle(emb, sf_dir):
    """Exact thresholded self-join == all-pairs numpy at the same rounding."""
    import pyarrow.parquet as pq

    from opennre_ray.functions.similarity import cosine_pair_join

    got = cosine_pair_join(emb, threshold=0.4).to_pandas()

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 6)
    ii, jj = np.nonzero(np.triu(sims >= 0.4, k=1))
    want = {(min(ids[i], ids[j]), max(ids[i], ids[j])): sims[i, j]
            for i, j in zip(ii, jj)}
    assert len(got) == len(want)
    for r in got.itertuples():
        assert abs(want[(r.id_a, r.id_b)] - r.cosine) < 1e-9


def test_cosine_pair_join_multi_block(ray_session):
    """Pairs spanning blocks are found exactly once."""
    import ray.data as rd

    from opennre_ray.functions.similarity import cosine_pair_join

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 8))
    vecs = np.concatenate([base, base + 0.01 * rng.standard_normal((40, 8))])
    ids = list(range(80))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": v.tolist()} for i, v in zip(ids, vecs)]
    ).repartition(7)
    got = cosine_pair_join(ds, threshold=0.99).to_pandas()
    # each planted near-dup pair (i, i+40) must appear exactly once
    planted = {(i, i + 40) for i in range(40)}
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert planted <= pairs
    assert got.duplicated(["id_a", "id_b"]).sum() == 0


def test_cosine_pair_join_lsh_planted_neardups(ray_session):
    """The LSH-composed join must recover every planted near-dup pair the
    exact join finds at threshold 0.98 (superset check both ways: LSH ⊆
    exact by predicate, exact ⊆ LSH by banding recall)."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.similarity import (
        cosine_pair_join, cosine_pair_join_lsh)

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.tolist()})
        # plant a near-dup of every 4th vector (tiny perturbation)
        if i % 4 == 0:
            w = v + rng.standard_normal(16) * 0.01
            rows.append({"vec_id": 1000 + i, "embedding": w.tolist()})
    ds = rd.from_items(rows, override_num_blocks=6)

    def pairs(res):
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        return set(zip(df["id_a"], df["id_b"]))

    exact = pairs(cosine_pair_join(ds, threshold=0.98))
    lsh = pairs(cosine_pair_join_lsh(ds, threshold=0.98, n_planes=8,
                                     n_bands=16))
    assert len(exact) >= 10              # every planted pair qualifies
    assert lsh == exact                  # ⊆ by predicate, ⊇ by banding


def test_cosine_pair_join_lsh_values_match_exact(ray_session):
    """At a near-dup threshold (0.95) on a corpus mixing planted dups with
    mid-similarity noise, the banded join returns the exact join's pairs
    WITH identical rounded cosines (same matmul arithmetic per bucket).

    The LSH path is only claimed for near-dup thresholds: at low
    thresholds (e.g. embed_cosine_pairs' 0.4) sign-agreement probability
    per plane is too low for banding and the exact O(B²) join is the
    right operator — that division of labor is the documented scale
    story."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.similarity import (
        cosine_pair_join, cosine_pair_join_lsh)

    rng = np.random.default_rng(9)
    base = rng.standard_normal((60, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.tolist()})
        if i % 3 == 0:      # planted near-dup
            rows.append({"vec_id": 1000 + i,
                         "embedding": (v + rng.standard_normal(32) * 0.02)
                         .tolist()})
        if i % 5 == 0:      # mid-similarity distractor (~0.7): below the
            w = v + rng.standard_normal(32) * 0.9   # threshold, never emitted
            rows.append({"vec_id": 2000 + i, "embedding": w.tolist()})
    ds = rd.from_items(rows, override_num_blocks=7)

    def canon(res):
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        return (df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
                [["id_a", "id_b", "cosine"]])

    exact = canon(cosine_pair_join(ds, threshold=0.95))
    lsh = canon(cosine_pair_join_lsh(ds, threshold=0.95, n_planes=8,
                                     n_bands=16))
    assert len(exact) >= 20
    pd.testing.assert_frame_equal(exact, lsh, check_dtype=False)


def test_kmeans_fixed_point_matches_sequential(ray_session):
    """Distributed fixed-point k-means == sequential integer replay,
    independent of partitioning; clusters keep previous centroids when
    they empty out (k=6 on 3 tight blobs forces empty clusters)."""
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.similarity import (_trunc_div,
                                                  kmeans_fixed_point)

    rng = np.random.default_rng(7)
    K, T, S = 6, 3, 10 ** 6
    blobs = [rng.normal(c, 0.02, (40, 8)) for c in (-0.4, 0.0, 0.4)]
    X = np.concatenate(blobs).astype(np.float32)
    rows = [{"vec_id": i, "embedding": X[i].tolist()}
            for i in range(len(X))]

    Q = np.floor(X.astype(np.float64) * S).astype(np.int64)

    def assign(mat, c):
        d2 = ((mat * mat).sum(1, keepdims=True)
              + (c * c).sum(1)[None, :] - 2 * (mat @ c.T))
        return np.argmin(d2, axis=1)

    cents = Q[:K].copy()               # ids 0..K-1 are the K smallest
    for _ in range(T):
        a = assign(Q, cents)
        for c in range(K):
            m = a == c
            if m.sum():
                cents[c] = _trunc_div(Q[m].sum(0), np.int64(m.sum()))
    want = assign(Q, cents)
    assert len(set(want)) < K          # the blob setup empties clusters

    for n_parts in (1, 9):
        ds = rd.from_items(rows).repartition(n_parts)
        got = (kmeans_fixed_point(ds, k=K, iters=T).to_pandas()
               .sort_values("vec_id"))
        assert (got["cluster"].to_numpy() == want).all()
        assert got["cluster"].dtype == np.int64


def test_kcenter_coreset_matches_sequential(ray_session):
    """Distributed greedy k-center == the sequential farthest-point
    replay (same integer quantization and tie-breaks), independent of
    partitioning; exact duplicates never re-win at distance 0."""
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.similarity import kcenter_coreset

    rng = np.random.default_rng(11)
    X = rng.standard_normal((120, 8)).astype(np.float32)
    X[50] = X[0]                       # duplicate point
    rows = [{"vec_id": i, "embedding": X[i].tolist()}
            for i in range(len(X))]

    S, K = 10 ** 6, 6
    Q = np.floor(X.astype(np.float64) * S).astype(np.int64)
    sel, dist = [0], [0]
    for r in range(1, K):
        c = Q[sel]
        d2 = ((Q * Q).sum(1, keepdims=True)
              + (c * c).sum(1)[None, :] - 2 * (Q @ c.T)).min(axis=1)
        d2[sel] = -1                   # exclude selected
        ids = np.arange(len(Q))
        w = int(np.lexsort((ids, -d2))[0])
        sel.append(w)
        dist.append(int(d2[w]))

    for n_parts in (1, 7):
        ds = rd.from_items(rows).repartition(n_parts)
        got = kcenter_coreset(ds, k=K).to_pandas()
        assert got["vec_id"].tolist() == sel
        assert got["dist"].tolist() == dist
    assert 50 not in sel  # the duplicate sits at distance 0, never wins


def test_knn_pq_partition_invariant_and_recall(ray_session):
    """PQ/ADC top-k: identical at any block count, self-query ranks 1,
    recall vs brute force non-trivial even on hard random data."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.similarity import knn_brute_force, knn_pq

    rng = np.random.default_rng(3)
    n, d = 1000, 64
    base = rng.standard_normal((n, d))
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in base]})
    qids = [5, 17, 99]
    qmat = base[qids]

    r1 = knn_pq(rd.from_pandas(df).repartition(4), qids, qmat,
                k=10, m=16, ksub=32).to_pandas()
    r2 = knn_pq(rd.from_pandas(df).repartition(13), qids, qmat,
                k=10, m=16, ksub=32).to_pandas()
    pd.testing.assert_frame_equal(r1.reset_index(drop=True),
                                  r2.reset_index(drop=True))

    bf = knn_brute_force(rd.from_pandas(df).repartition(4), qids, qmat,
                         k=10).to_pandas()
    for q in qids:
        assert r1[r1.query_id == q].iloc[0].neighbor_id == q
        hits = (set(r1[r1.query_id == q].neighbor_id)
                & set(bf[bf.query_id == q].neighbor_id))
        assert len(hits) >= 2            # ≥0.2 recall@10 on random data


def test_pq_encode_exact_reconstruction_on_centroids():
    """A vector equal to a sub-centroid in every subspace encodes to that
    centroid's code and its ADC score replays exactly in numpy."""
    from opennre_ray.functions.similarity import (_normalize, _pq_encode,
                                                  _train_pq_codebooks)

    rng = np.random.default_rng(11)
    sample = rng.standard_normal((256, 32))
    books = _train_pq_codebooks(sample, m=8, ksub=8, seed=1)
    # build vectors straight from centroid rows j of every subspace
    for j in (0, 3, 7):
        v = books[:, j, :].reshape(1, -1)
        codes = _pq_encode(v, books)
        assert (codes == j).all()


def test_jl_projection_preserves_distances(ray_session):
    """JL projection: distributed output == direct numpy matmul, and
    pairwise distances are preserved within JL-lemma-plausible bounds."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.similarity import jl_project
    from opennre_ray.functions.sqlcompat import sql_round

    rng = np.random.default_rng(2)
    n, d, dout = 200, 64, 16
    base = rng.standard_normal((n, d))
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in base]})

    out = (jl_project(rd.from_pandas(df).repartition(5), in_dim=d,
                      out_dim=dout, seed=31).to_pandas()
           .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    R = np.random.default_rng(31).standard_normal((d, dout)) / np.sqrt(dout)
    exp = sql_round(base.astype(np.float32).astype(np.float64) @ R, 6)
    got = out["val"].to_numpy().reshape(n, dout)
    assert np.array_equal(got, exp)

    # JL property: sampled pairwise distance ratios stay near 1
    proj = got
    idx = rng.integers(0, n, size=(200, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    do = np.linalg.norm(base[idx[:, 0]] - base[idx[:, 1]], axis=1)
    dp = np.linalg.norm(proj[idx[:, 0]] - proj[idx[:, 1]], axis=1)
    ratio = dp / do
    assert 0.4 < ratio.min() and ratio.max() < 1.8
    assert abs(float(np.median(ratio)) - 1.0) < 0.15
