"""Planted-data oracles for functions/stats.py: the distributed exact
KS / Mann-Whitney / Spearman must equal a brute-force single-process
computation of the same definitions (and pandas' spearman)."""

import numpy as np
import pandas as pd
import pytest

import ray

from opennre_ray.functions.stats import (ks_two_sample, mann_whitney,
                                         spearman)


def _planted(seed=7, n=4000):
    rng = np.random.default_rng(seed)
    # heavy ties: integer values from two shifted distributions
    v1 = rng.integers(0, 80, size=n)            # group 1
    v2 = rng.integers(5, 90, size=n + 123)      # group 2 (shifted)
    v = np.concatenate([v1, v2]).astype(np.int64)
    g = np.concatenate([np.ones_like(v1), np.zeros_like(v2)]
                       ).astype(np.int64)
    return pd.DataFrame({"v": v, "g": g})


def _ds(df, blocks=7):
    return ray.data.from_pandas(df).repartition(blocks)


def test_ks_matches_bruteforce(ray_session):
    df = _planted()
    got = ks_two_sample(_ds(df))
    v1 = np.sort(df.loc[df.g == 1, "v"].to_numpy())
    v2 = np.sort(df.loc[df.g == 0, "v"].to_numpy())
    n1, n2 = len(v1), len(v2)
    pooled = np.unique(df["v"].to_numpy())
    c1 = np.searchsorted(v1, pooled, side="right")
    c2 = np.searchsorted(v2, pooled, side="right")
    diff = np.abs(c1.astype(np.int64) * n2 - c2.astype(np.int64) * n1)
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["d_num"] == int(diff.max())
    assert got["ks_at"] == int(pooled[diff.argmax()])
    assert got["ks_d"] == pytest.approx(diff.max() / (n1 * n2),
                                        abs=1e-12)


def test_mannwhitney_matches_bruteforce(ray_session):
    df = _planted(seed=11)
    got = mann_whitney(_ds(df))
    # brute-force midranks over the pooled sample
    v = df["v"].to_numpy()
    order = pd.Series(v).rank(method="average").to_numpy()  # midranks
    r1 = order[df.g.to_numpy() == 1].sum()
    n1 = int((df.g == 1).sum())
    n2 = int((df.g == 0).sum())
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["two_r1"] == int(round(2 * r1))
    u1 = r1 - n1 * (n1 + 1) / 2
    assert got["u1_x2"] == int(round(2 * u1))
    _, t = np.unique(v, return_counts=True)
    assert got["tie_sum"] == int((t.astype(object) ** 3 - t).sum())
    n = n1 + n2
    var = (n1 * n2 / 12) * ((n + 1) - got["tie_sum"] / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / np.sqrt(var)
    assert got["z"] == pytest.approx(z, abs=1e-9)


def test_spearman_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    n = 3000
    x = rng.integers(0, 40, size=n).astype(np.int64)
    # correlated-with-ties second column
    y = (x * 3 + rng.integers(0, 25, size=n)).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y})
    got = spearman(_ds(df), "x", "y")
    # brute-force: Pearson on midranks (scipy is not in this sandbox)
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    want = (np.mean(rx * ry) - rx.mean() * ry.mean()) / (
        rx.std() * ry.std())
    assert got["n"] == n
    assert got["rho"] == pytest.approx(want, abs=1e-9)
    # the generic (join-based) path must produce the IDENTICAL result
    slow = spearman(_ds(df), "x", "y", x_broadcast_limit=0)
    assert slow == got


def test_pca_top_component_recovers_planted_direction(ray_session,
                                                      tmp_path):
    """The fixed-point power iteration must align with the true top
    eigenvector of a planted low-rank-plus-noise embedding table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opennre_ray.pipelines.queries import embed_pca_top_component

    rng = np.random.default_rng(5)
    d = 16
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    n = 400
    x = (rng.normal(size=(n, 1)) * 3.0) @ u[None, :] \
        + rng.normal(size=(n, d)) * 0.05
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in x],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n), pa.int64())})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = embed_pca_top_component(str(tmp_path))
    v = got["v_fp"].to_numpy(np.float64)
    v /= np.linalg.norm(v)
    assert abs(float(v @ u)) > 0.995


def test_kendall_tau_b_matches_bruteforce(ray_session):
    from opennre_ray.functions.stats import kendall_tau_b

    rng = np.random.default_rng(9)
    n = 1200
    x = rng.integers(0, 12, size=n).astype(np.int64)
    y = (x * 5 + rng.integers(0, 30, size=n)).astype(np.int64)
    got = kendall_tau_b(_ds(pd.DataFrame({"x": x, "y": y})), "x", "y")
    # O(n^2) brute force over all pairs
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    c = int((prod > 0).sum())
    d = int((prod < 0).sum())
    tie_x = int((dx[iu] == 0).sum())
    tie_y = int((dy[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    assert got["concordant"] == c
    assert got["discordant"] == d
    assert got["tie_x_pairs"] == tie_x
    assert got["tie_y_pairs"] == tie_y
    tau = (c - d) / np.sqrt(float(n0 - tie_x) * float(n0 - tie_y))
    assert got["tau_b"] == pytest.approx(tau, abs=1e-9)
