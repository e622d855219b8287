"""Graph analytics vs pure-python oracles (BFS / union-find)."""

import numpy as np
import pandas as pd
import pytest

from opennre_ray.functions.graph import (
    connected_components,
    degree_stats,
    k_hop_neighbors,
)

EDGES = [
    ("a", "r1", "b"), ("b", "r1", "c"), ("a", "r2", "c"),   # comp {a,b,c}
    ("d", "r1", "e"),                                        # comp {d,e}
    ("f", "r3", "f2"), ("f2", "r3", "f3"), ("f3", "r1", "f"),  # cycle
]


@pytest.fixture(scope="module")
def triples(ray_session):
    import ray.data as rd
    return rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in EDGES])


def test_degree_stats(triples):
    df = degree_stats(triples).to_pandas().set_index("entity")
    assert df.loc["a", "out_degree"] == 2 and df.loc["a", "in_degree"] == 0
    assert df.loc["c", "in_degree"] == 2 and df.loc["c", "out_degree"] == 0
    assert df.loc["b", "out_degree"] == 1 and df.loc["b", "in_degree"] == 1
    assert df.loc["a", "n_preds"] == 2


def test_k_hop(triples):
    reached = k_hop_neighbors(triples, ["a"], k=2)
    assert reached == {"a": 0, "b": 1, "c": 1}
    reached_f = k_hop_neighbors(triples, ["f"], k=3)
    assert reached_f == {"f": 0, "f2": 1, "f3": 2}


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for s, _, o in edges:
        union(s, o)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("local_limit", [0, 2_000_000],
                         ids=["distributed", "local_gate"])
def test_connected_components_vs_union_find(triples, local_limit):
    got = connected_components(triples, local_limit=local_limit).to_pandas()
    got_map = dict(zip(got["entity"], got["component"]))
    want = _uf_oracle(EDGES)
    # same partition: components must induce the same grouping and the
    # min-label representative matches union-find's min root
    assert got_map == want


def test_connected_components_long_chain(ray_session):
    """A 60-node path converges within the iteration budget only because of
    pointer jumping (plain min propagation needs 59 rounds)."""
    import ray.data as rd

    edges = [(f"v{i:03d}", "r", f"v{i + 1:03d}") for i in range(59)]
    ds = rd.from_items([{"subj": s, "pred": p, "obj": o}
                        for s, p, o in edges])
    got = connected_components(ds, max_iters=12, local_limit=0).to_pandas()
    assert (got["component"] == "v000").all()
    assert len(got) == 60


def test_components_on_kg_output(ray_session, sf_dir):
    from opennre_ray.pipelines.kg import extract_triples

    tr = extract_triples(sf_dir)
    comp = connected_components(tr).to_pandas()
    deg = degree_stats(tr).to_pandas()
    # every entity in the degree table has a component assignment
    assert set(deg["entity"]) <= set(comp["entity"])
    # component representative is a member entity and is minimal
    for c, grp in comp.groupby("component"):
        assert c == grp["entity"].min()


def test_k_hop_dataset_path_matches_driver(triples):
    """local_limit=0 forces the distributed frontier; results must equal
    the driver-held path exactly."""
    want = k_hop_neighbors(triples, ["a"], k=2)
    got = k_hop_neighbors(triples, ["a"], k=2, local_limit=0)
    assert got == want


def test_k_hop_hub_graph_distributed(ray_session):
    """Hub graph: one entity links to many — hop-2 frontier is most of the
    vertex set. The Dataset path must assign first-reach hops exactly
    (BFS oracle) without any driver-held frontier."""
    import ray.data as rd

    from opennre_ray.functions.graph import k_hop_dataset

    n = 500
    edges = [{"subj": "seed", "pred": "r", "obj": "hub"}]
    edges += [{"subj": "hub", "pred": "r", "obj": f"v{i}"}
              for i in range(n)]
    edges += [{"subj": f"v{i}", "pred": "r", "obj": f"w{i}"}
              for i in range(0, n, 2)]
    edges += [{"subj": "v0", "pred": "r", "obj": "hub"}]   # back-edge
    ds = rd.from_items(edges, override_num_blocks=8)

    out = k_hop_dataset(ds, ["seed"], k=3).to_pandas()
    got = dict(zip(out["entity"], out["hop"].astype(int)))

    # BFS oracle
    adj = {}
    for e in edges:
        adj.setdefault(e["subj"], []).append(e["obj"])
    want, frontier = {"seed": 0}, ["seed"]
    for hop in (1, 2, 3):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = hop
                    nxt.append(v)
        frontier = nxt
    assert got == want


def _seq_pagerank(edges, iters=5, scale=10 ** 12, num=85, den=100):
    """Sequential integer-arithmetic replay of functions.graph.pagerank."""
    from collections import Counter

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    outdeg = Counter(a for a, b in edges)
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (scale * (den - num)) // (den * n)
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for a, b in edges:
            nxt[b] += (rank[a] * num) // (den * outdeg[a])
        rank = nxt
    return rank


def test_pagerank_matches_sequential(ray_session):
    """Distributed fixed-point PageRank == sequential integer replay on a
    graph with a hub, a chain, a dangling sink (no out-edges), and a pure
    source (no in-edges)."""
    import ray.data as rd

    from opennre_ray.functions.graph import pagerank

    edges = (
        # hub h -> many leaves, leaves point back (except the sink)
        [("h", l) for l in ("l1", "l2", "l3", "l4", "sink")]
        + [(l, "h") for l in ("l1", "l2", "l3", "l4")]
        # chain with a pure source
        + [("s0", "c1"), ("c1", "c2"), ("c2", "c3")]
        # parallel (multi-)edge: counted twice, like the SQL replay
        + [("l1", "l2"), ("l1", "l2")]
    )
    triples = rd.from_items(
        [{"subj": a, "pred": "e", "obj": b} for a, b in edges])
    got = pagerank(triples, iters=5).to_pandas()
    got_map = dict(zip(got["entity"], got["rank_micro"]))
    assert got_map == _seq_pagerank(edges, iters=5)
    assert got["rank_micro"].dtype == np.int64


def _seq_trustrank(edges, seeds, iters=5, scale=10 ** 12, num=85, den=100):
    """Sequential replay of pagerank(seeds=...): teleport only to seeds."""
    from collections import Counter

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    outdeg = Counter(a for a, b in edges)
    sset = set(seeds) & set(nodes)
    ns = len(sset)
    rank = {v: (scale // ns if v in sset else 0) for v in nodes}
    base = (scale * (den - num)) // (den * ns)
    for _ in range(iters):
        nxt = {v: (base if v in sset else 0) for v in nodes}
        for a, b in edges:
            nxt[b] += (rank[a] * num) // (den * outdeg[a])
        rank = nxt
    return rank


def test_trustrank_seeded_pagerank(ray_session):
    """pagerank(seeds=...) == the sequential seeded replay; trust stays 0
    on nodes unreachable from the seed set; missing seeds raise."""
    import pytest
    import ray.data as rd

    from opennre_ray.functions.graph import pagerank

    edges = [("t1", "a"), ("a", "b"), ("b", "a"),
             ("spam1", "spam2"), ("spam2", "spam1"),   # closed spam farm
             ("t2", "a"), ("x", "t1")]
    triples = rd.from_items(
        [{"subj": a, "pred": "e", "obj": b} for a, b in edges])
    seeds = {"t1", "t2", "never-in-graph"}
    got = pagerank(triples, iters=5, seeds=seeds).to_pandas()
    got_map = dict(zip(got["entity"], got["rank_micro"]))
    assert got_map == _seq_trustrank(edges, seeds, iters=5)
    assert got_map["spam1"] == 0 and got_map["spam2"] == 0
    assert got_map["a"] > 0 and got_map["x"] == 0  # x: no in-trust

    with pytest.raises(ValueError):
        pagerank(triples, iters=1, seeds={"never"}).to_pandas()


def _seq_hits(edges, iters=3, scale=10 ** 6):
    """Sequential integer-arithmetic replay of functions.graph.hits
    (L1-normalized floor-division mutual reinforcement)."""
    nodes = sorted({a for a, b in edges} | {b for a, b in edges})

    def normalize(raw):
        total = sum(raw.values())
        if total == 0:
            return raw
        return {v: (x * scale) // total for v, x in raw.items()}

    hub = {v: scale for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        raw_a = {v: 0 for v in nodes}
        for a, b in edges:
            raw_a[b] += hub[a]
        auth = normalize(raw_a)
        raw_h = {v: 0 for v in nodes}
        for a, b in edges:
            raw_h[a] += auth[b]
        hub = normalize(raw_h)
    return hub, auth


def test_hits_matches_sequential(ray_session):
    """Distributed fixed-point HITS == sequential integer replay on a
    graph with a directory-style hub, a popular authority, a dangling
    sink, a pure source, and a parallel multi-edge."""
    import ray.data as rd

    from opennre_ray.functions.graph import hits

    edges = (
        [("dir", t) for t in ("p1", "p2", "p3", "sink")]
        + [("dir2", t) for t in ("p1", "p2")]
        + [("p1", "p2"), ("p2", "p3"), ("s0", "p1")]
        + [("p3", "p1"), ("p3", "p1")]   # multi-edge counted twice
    )
    triples = rd.from_items(
        [{"subj": a, "pred": "e", "obj": b} for a, b in edges])
    got = hits(triples, iters=3).to_pandas()
    want_hub, want_auth = _seq_hits(edges, iters=3)
    assert dict(zip(got["entity"], got["hub_micro"])) == want_hub
    assert dict(zip(got["entity"], got["auth_micro"])) == want_auth
    assert got["hub_micro"].dtype == np.int64
    # hubs and authorities separate: the sink (no out-edges) has zero
    # hubness and the pure source (no in-edges) zero authority, while the
    # most-linked page dominates the directory on authority
    hub = dict(zip(got["entity"], got["hub_micro"]))
    auth = dict(zip(got["entity"], got["auth_micro"]))
    assert hub["sink"] == 0 and auth["s0"] == 0
    assert hub["dir"] > 0 and auth["p1"] > auth["dir"]


def test_triangle_count_planted(ray_session):
    """K4 has 4 wedges under sorted-edge orientation and all 4 close to
    triangles; adding a dangling path contributes wedges but no new
    triangles."""
    import ray.data as rd

    from opennre_ray.functions.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = triangle_count(rd.from_items(
        [{"a": a, "b": b} for a, b in k4]).repartition(3))
    assert got["n_wedges"].tolist() == [4]
    assert got["n_triangles"].tolist() == [4]

    path = k4 + [(4, 5), (5, 6)]        # 4-5-6 path: wedge, no closure
    got2 = triangle_count(rd.from_items(
        [{"a": a, "b": b} for a, b in path]).repartition(3))
    assert got2["n_triangles"].tolist() == [4]
    # middles: b=2 -> 2, b=3 -> 2, b=4 -> {1,2,3}x{5} = 3, b=5 -> 1
    assert got2["n_wedges"].tolist() == [8]


def test_adamic_adar_hand_computed(ray_session):
    """5-vertex graph, every score hand-derived: w(v) = round(1e6/ln d).
    deg-2 middles weigh 1442695, the deg-3 middle weighs 910239; only
    non-adjacent pairs rank, ordered (score desc, a, b)."""
    import ray.data as rd

    from opennre_ray.functions.graph import adamic_adar

    # N(1)={2,5} N(2)={1,3} N(3)={2,4,5} N(4)={3} N(5)={1,3}
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (3, 5)]
    got = adamic_adar(rd.from_items(
        [{"a": a, "b": b} for a, b in edges]).repartition(3),
        k=10).to_pandas()
    want = pd.DataFrame({
        "a": [1, 2, 2, 4],
        "b": [3, 5, 4, 5],
        # (1,3): middles {2,5} both deg 2 -> 2*1442695
        # (2,5): middles {1,3} -> 1442695 + 910239
        # (2,4), (4,5): middle {3} -> 910239
        "aa_fp": [2885390, 2352934, 910239, 910239],
        "common_neighbors": [2, 2, 1, 1],
    }).astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_copurchase_edges(ray_session):
    """Orders explode to sorted distinct pairs; a pair shared by two
    orders appears once."""
    import ray.data as rd

    from opennre_ray.functions.graph import build_copurchase_edges

    rows = [
        {"l_orderkey": 1, "l_partkey": 30},
        {"l_orderkey": 1, "l_partkey": 10},
        {"l_orderkey": 1, "l_partkey": 20},
        {"l_orderkey": 2, "l_partkey": 10},
        {"l_orderkey": 2, "l_partkey": 30},
        {"l_orderkey": 2, "l_partkey": 30},   # dup lineitem collapses
    ]
    got = (build_copurchase_edges(rd.from_items(rows).repartition(2))
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert list(map(tuple, got[["a", "b"]].to_numpy())) == [
        (10, 20), (10, 30), (20, 30)]


def test_negative_samples_drop_true_collisions(ray_session):
    """Every emitted negative differs from ALL true tails of its (subj,
    pred); draws are deterministic md5 indexes into the sorted entity
    vocabulary; k draws minus collisions rows per edge."""
    import hashlib

    import ray.data as rd

    from opennre_ray.functions.graph import negative_samples

    edges = [
        {"subj": "A", "pred": "r", "obj": "X"},
        {"subj": "A", "pred": "r", "obj": "Y"},
        {"subj": "B", "pred": "r", "obj": "X"},
    ]
    got = (negative_samples(rd.from_items(edges).repartition(2), k=4)
           .to_pandas())
    ents = ["X", "Y"]
    truth = {(e["subj"], e["pred"], e["obj"]) for e in edges}
    # replay sequentially
    exp = []
    for e in edges:
        for i in range(4):
            h = int.from_bytes(hashlib.md5(
                f"{e['subj']}|{e['pred']}|{i}".encode()).digest()[:8],
                "big")
            cand = ents[h % 2]
            if (e["subj"], e["pred"], cand) not in truth:
                exp.append((e["subj"], e["pred"], cand, i))
    got_t = sorted(map(tuple, got[["subj", "pred", "neg_obj",
                                   "draw_idx"]].to_numpy()))
    # A has both X and Y as true tails -> every A draw collides
    assert not any(r[0] == "A" for r in exp)
    # duplicate (A,r) edges each generate their own draws; dedupe replay
    assert sorted(set(got_t)) == sorted(set(exp))
    for s, p, n, i in got_t:
        assert (s, p, n) not in truth


def test_negative_samples_distributed_path_matches_broadcast(ray_session):
    """Forcing broadcast_limit below the vocabulary size swaps to the
    fully distributed path (global_rank vocab join + Bloom-gated exact
    anti-join); its output must be row-identical to the broadcast path."""
    import ray.data as rd

    from opennre_ray.functions.graph import negative_samples

    triples = sorted({(f"S{i % 7}", f"r{i % 2}", f"O{i % 11}")
                      for i in range(60)})
    rows = [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
    cols = ["subj", "pred", "neg_obj", "draw_idx"]

    broad = (negative_samples(rd.from_items(rows).repartition(3), k=3)
             .to_pandas())
    dist = (negative_samples(rd.from_items(rows).repartition(3), k=3,
                             broadcast_limit=1).to_pandas())

    assert sorted(dist.columns) == sorted(cols)
    assert dist["draw_idx"].dtype == "int64"
    assert sorted(map(tuple, broad[cols].to_numpy())) \
        == sorted(map(tuple, dist[cols].to_numpy()))
    truth = set(triples)
    for s, p, n, _ in dist[cols].to_numpy():
        assert (s, p, n) not in truth


def _peel(edges, k):
    """Sequential reference peeler."""
    from collections import defaultdict
    E = set(edges)
    while True:
        deg = defaultdict(int)
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        bad = {v for v, c in deg.items() if c < k}
        if not bad:
            return sorted(deg.items())
        E = {(a, b) for a, b in E if a not in bad and b not in bad}


def test_k_core_matches_sequential_peeler(ray_session):
    import numpy as np
    import ray.data as rd

    from opennre_ray.functions.graph import k_core

    # deterministic pseudo-random sparse graph + a planted dense clique
    rng = np.random.RandomState(7)
    edges = {(int(a), int(b)) if a < b else (int(b), int(a))
             for a, b in rng.randint(0, 60, size=(160, 2)) if a != b}
    edges |= {(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)}
    df = pd.DataFrame(sorted(edges), columns=["a", "b"])

    for k in (2, 3, 5, 7):
        got = k_core(rd.from_pandas(df).repartition(4), k).to_pandas()
        want = _peel(edges, k)
        assert sorted(zip(got["v"], got["core_deg"])) == want, k


def test_k_core_empty_core_is_typed_empty(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import k_core

    # path graph: 2-core is empty
    df = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]})
    core = k_core(rd.from_pandas(df), 2)
    assert core.count() == 0
    assert sorted(core.schema().names) == ["core_deg", "v"]


def _slow_lp(edges: set, seeds: dict, iters: int) -> dict:
    """Sequential synchronous clamped label propagation."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = dict(seeds)
    for _ in range(iters):
        nxt = dict(seeds)
        for v, nbrs in adj.items():
            if v in seeds:
                continue
            votes = {}
            for u in nbrs:
                if u in labels:
                    votes[labels[u]] = votes.get(labels[u], 0) + 1
            if votes:
                nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    return labels


def test_label_propagation_hand(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import label_propagation

    # triangle 1-2-3 seeded 'x' at 1; chain 3-4-5; isolated seed 9
    edges = pd.DataFrame({"a": [1, 2, 1, 3, 4],
                          "b": [2, 3, 3, 4, 5]})
    seeds = pd.DataFrame({"entity": [1, 5, 9],
                          "label": ["x", "y", "z"]})
    out = label_propagation(rd.from_pandas(edges).repartition(3),
                            rd.from_pandas(seeds), iters=3).to_pandas()
    got = dict(zip(out["entity"], out["label"]))
    assert got == _slow_lp({(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)},
                           {1: "x", 5: "y", 9: "z"}, 3)
    # round 1: 2,3 <- x (from 1), 4 <- y (from 5); round 2: ties at 4
    # (x from 3, y from 5) -> 'x' by lexicographic tie-break
    assert got[2] == "x" and got[3] == "x" and got[4] == "x"
    assert got[9] == "z"          # isolated seed survives (clamped)


@pytest.mark.parametrize("seed", [1, 11])
def test_label_propagation_random_parity(ray_session, seed):
    import ray.data as rd

    from opennre_ray.functions.graph import label_propagation

    rng = np.random.RandomState(seed)
    edges = {(int(a), int(b)) if a < b else (int(b), int(a))
             for a, b in rng.randint(0, 40, size=(120, 2)) if a != b}
    seeds = {int(v): "L%d" % (v % 3) for v in rng.choice(40, 8,
                                                         replace=False)}
    df = pd.DataFrame(sorted(edges), columns=["a", "b"])
    sdf = pd.DataFrame(sorted(seeds.items()), columns=["entity", "label"])
    out = label_propagation(rd.from_pandas(df).repartition(4),
                            rd.from_pandas(sdf).repartition(2),
                            iters=3).to_pandas()
    got = dict(zip(out["entity"], out["label"]))
    assert got == _slow_lp(edges, seeds, 3)


def _slow_sssp(wedges: dict, seeds: set, iters: int) -> dict:
    """Sequential round-limited Bellman-Ford on undirected weighted edges."""
    adj = {}
    for (a, b), w in wedges.items():
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {s: 0 for s in seeds}
    for _ in range(iters):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if v not in nxt or d + w < nxt[v]:
                    nxt[v] = d + w
        dist = nxt
    return dist


def test_sssp_hand(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import sssp

    # 1 -5- 2 -1- 3 and 1 -10- 3: two-hop (6) beats direct (10)
    edges = pd.DataFrame({"a": [1, 2, 1, 4], "b": [2, 3, 3, 5],
                          "w": [5, 1, 10, 2]})
    out = sssp(rd.from_pandas(edges).repartition(2), [1, 4],
               iters=3).to_pandas()
    got = dict(zip(out["entity"], out["dist"]))
    assert got == {1: 0, 2: 5, 3: 6, 4: 0, 5: 2}


def test_sssp_round_limit_is_hop_limit(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import sssp

    # path 1-2-3-4-5: with 2 rounds only nodes within 2 hops are reached
    edges = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 5],
                          "w": [1, 1, 1, 1]})
    out = sssp(rd.from_pandas(edges), [1], iters=2).to_pandas()
    got = dict(zip(out["entity"], out["dist"]))
    assert got == {1: 0, 2: 1, 3: 2}


@pytest.mark.parametrize("seed", [3, 13])
def test_sssp_random_parity(ray_session, seed):
    import ray.data as rd

    from opennre_ray.functions.graph import sssp

    rng = np.random.RandomState(seed)
    wedges = {}
    for a, b in rng.randint(0, 30, size=(90, 2)):
        if a == b:
            continue
        k = (int(min(a, b)), int(max(a, b)))
        wedges.setdefault(k, int(rng.randint(1, 9)))
    seeds = {int(v) for v in rng.choice(30, 4, replace=False)}
    df = pd.DataFrame([(a, b, w) for (a, b), w in sorted(wedges.items())],
                      columns=["a", "b", "w"])
    out = sssp(rd.from_pandas(df).repartition(4), sorted(seeds),
               iters=4).to_pandas()
    got = dict(zip(out["entity"], out["dist"]))
    assert got == _slow_sssp(wedges, seeds, 4)


def test_assortativity_star(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import assortativity

    # star K_{1,5}: every edge joins the hub (deg 5) to a leaf (deg 1)
    # -> perfectly disassortative, r = -1
    edges = pd.DataFrame({"a": [0, 0, 0, 0, 0], "b": [1, 2, 3, 4, 5]})
    out = assortativity(rd.from_pandas(edges))
    assert out["n_vertices"][0] == 6
    assert out["n_edges"][0] == 5
    assert out["assortativity"][0] == -1.0


def test_assortativity_random_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import assortativity
    from opennre_ray.functions.sqlcompat import sql_round

    rng = np.random.RandomState(7)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 40, size=(150, 2)) if a != b}
    df = pd.DataFrame(sorted(es), columns=["a", "b"])
    out = assortativity(rd.from_pandas(df).repartition(4))

    deg: dict = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n = sx = sxx = sxy = 0
    for a, b in es:
        for u, v in ((a, b), (b, a)):
            n += 1
            sx += deg[u]
            sxx += deg[u] ** 2
            sxy += deg[u] * deg[v]
    want = float(sql_round(float(n * sxy - sx * sx)
                           / float(n * sxx - sx * sx), 12))
    assert out["assortativity"][0] == want
    assert out["n_vertices"][0] == len(deg)
    assert out["n_edges"][0] == len(es)


def test_local_clustering_triangle_plus_tail(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import local_clustering

    # triangle {1,2,3} plus a tail 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3
    # (deg 3, one triangle), lcc(4)=0 (deg 1)
    edges = pd.DataFrame({"a": [1, 1, 2, 3], "b": [2, 3, 3, 4]})
    out = local_clustering(rd.from_pandas(edges)).to_pandas()
    got = {int(r.entity): (int(r.degree), int(r.triangles), r.lcc)
           for r in out.itertuples()}
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0),
                   3: (3, 1, round(1 / 3, 12)), 4: (1, 0, 0.0)}


def test_local_clustering_random_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import local_clustering
    from opennre_ray.functions.sqlcompat import sql_round

    rng = np.random.RandomState(11)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 30, size=(120, 2)) if a != b}
    df = pd.DataFrame(sorted(es), columns=["a", "b"])
    out = local_clustering(rd.from_pandas(df).repartition(4)).to_pandas()

    nbrs: dict = {}
    for a, b in es:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in out.itertuples():
        v = int(r.entity)
        nb = sorted(nbrs[v])
        assert r.degree == len(nb)
        tri = sum(1 for i, x in enumerate(nb) for y in nb[i + 1:]
                  if y in nbrs[x])
        assert r.triangles == tri, v
        want = (float(sql_round(2.0 * tri / (len(nb) * (len(nb) - 1)), 12))
                if len(nb) >= 2 else 0.0)
        assert r.lcc == want, v
    assert len(out) == len(nbrs)


def test_pagerank_local_gate_bit_parity(ray_session):
    """The driver-local size-gated path and the distributed rounds run
    the SAME int64 arithmetic — outputs must be bit-identical, seeded
    and unseeded, on a random graph."""
    import ray.data as rd

    from opennre_ray.functions.graph import pagerank

    rng = np.random.RandomState(3)
    edges = pd.DataFrame({
        "subj": [f"n{x}" for x in rng.randint(0, 25, 120)],
        "obj": [f"n{x}" for x in rng.randint(0, 25, 120)]})
    ds = rd.from_pandas(edges).repartition(4)

    for seeds in (None, frozenset({"n1", "n2", "n3"})):
        loc = pagerank(ds, iters=4, seeds=seeds).to_pandas()
        dist = pagerank(ds, iters=4, seeds=seeds,
                        local_edges_gate=0).to_pandas()
        lm = dict(zip(loc["entity"], loc["rank_micro"]))
        dm = dict(zip(dist["entity"], dist["rank_micro"]))
        assert lm == dm, seeds


def test_hits_local_gate_bit_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import hits

    rng = np.random.RandomState(5)
    edges = pd.DataFrame({
        "subj": [f"p{x}" for x in rng.randint(0, 20, 90)],
        "obj": [f"p{x}" for x in rng.randint(0, 20, 90)]})
    ds = rd.from_pandas(edges).repartition(3)
    loc = hits(ds, iters=3).to_pandas()
    dist = hits(ds, iters=3, local_edges_gate=0).to_pandas()
    lm = {r.entity: (r.hub_micro, r.auth_micro) for r in loc.itertuples()}
    dm = {r.entity: (r.hub_micro, r.auth_micro) for r in dist.itertuples()}
    assert lm == dm


def test_sssp_local_gate_bit_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import sssp

    rng = np.random.RandomState(9)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 25, size=(80, 2)) if a != b}
    df = pd.DataFrame(sorted(es), columns=["a", "b"])
    df["w"] = (rng.randint(1, 9, size=len(df))).astype("int64")
    ds = rd.from_pandas(df).repartition(3)
    seeds = [0, 7]
    loc = sssp(ds, seeds, iters=4).to_pandas()
    dist = sssp(ds, seeds, iters=4, local_edges_gate=0).to_pandas()
    assert dict(zip(loc["entity"], loc["dist"])) == \
        dict(zip(dist["entity"], dist["dist"]))


def test_label_propagation_local_gate_bit_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import label_propagation

    rng = np.random.RandomState(13)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 30, size=(100, 2)) if a != b}
    edges = rd.from_pandas(pd.DataFrame(sorted(es), columns=["a", "b"]))
    seeds = rd.from_pandas(pd.DataFrame(
        {"entity": [0, 5, 11], "label": ["x", "y", "z"]}))
    loc = label_propagation(edges, seeds, iters=3).to_pandas()
    dist = label_propagation(edges, seeds, iters=3,
                             local_edges_gate=0).to_pandas()
    assert dict(zip(loc["entity"], loc["label"])) == \
        dict(zip(dist["entity"], dist["label"]))


def test_wl_refinement_local_gate_bit_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import wl_refinement

    rng = np.random.RandomState(17)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 30, size=(100, 2)) if a != b}
    edges = rd.from_pandas(pd.DataFrame(sorted(es), columns=["a", "b"]))
    loc = wl_refinement(edges, rounds=3).to_pandas()
    dist = wl_refinement(edges, rounds=3, local_edges_gate=0).to_pandas()
    assert dict(zip(loc["node"], loc["color"])) == \
        dict(zip(dist["node"], dist["color"]))


def test_wl_refinement_distinguishes_roles(ray_session):
    import hashlib

    import ray.data as rd

    from opennre_ray.functions.graph import wl_refinement

    # path graph 0-1-2-3-4: ends {0,4}, next-to-ends {1,3}, center {2}
    edges = rd.from_pandas(pd.DataFrame(
        {"a": [0, 1, 2, 3], "b": [1, 2, 3, 4]}))
    out = wl_refinement(edges, rounds=2).to_pandas()
    c = dict(zip(out["node"], out["color"]))
    assert c[0] == c[4] and c[1] == c[3]
    assert len({c[0], c[1], c[2]}) == 3
    # round-1 label of an end node, by hand: own deg '1', neighbor '2'
    h1_end = hashlib.md5(b"1|2").hexdigest()[:16]
    h1_mid = hashlib.md5(b"2|1,2").hexdigest()[:16]  # node 1: nbrs 0,2
    h2_end = hashlib.md5(
        (h1_end + "|" + h1_mid).encode()).hexdigest()[:16]
    assert c[0] == h2_end


def test_k_truss_local_vs_distributed_bit_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import k_truss

    rng = np.random.RandomState(23)
    es = {(int(min(a, b)), int(max(a, b)))
          for a, b in rng.randint(0, 40, size=(300, 2)) if a != b}
    edges = rd.from_pandas(pd.DataFrame(sorted(es), columns=["a", "b"]))
    loc = k_truss(edges, 4).to_pandas().sort_values(["a", "b"])
    dist = k_truss(edges, 4, local_edges_gate=0).to_pandas() \
        .sort_values(["a", "b"])
    assert loc.reset_index(drop=True).equals(dist.reset_index(drop=True))


def test_k_truss_known_graph(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import k_truss

    # K4 on {0,1,2,3} plus a pendant triangle {3,4,5}: in the 4-truss
    # every K4 edge has support 2; the {3,4,5} triangle edges only 1.
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tri = [(3, 4), (3, 5), (4, 5)]
    edges = rd.from_pandas(pd.DataFrame(k4 + tri, columns=["a", "b"]))
    out = k_truss(edges, 4).to_pandas()
    assert sorted(zip(out["a"], out["b"])) == k4
    assert set(out["support"]) == {2}
    # k=3 keeps everything (every edge closes >= 1 triangle)
    out3 = k_truss(edges, 3).to_pandas()
    assert len(out3) == 9
    # k=6 peels to nothing: empty Dataset, schema intact (Ray's
    # to_pandas drops columns from all-empty blocks — callers branch on
    # count(), as graph_ktruss_parts does)
    ds6 = k_truss(edges, 6)
    assert ds6.count() == 0
    assert ds6.schema().names == ["a", "b", "support"]


def test_multi_source_distances_hand(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import multi_source_distances

    # path 1-2-3-4 plus spur 2-5: per-source frontiers stay separate
    edges = pd.DataFrame({"a": [1, 2, 3, 2], "b": [2, 3, 4, 5],
                          "w": [1, 1, 1, 1]})
    out = multi_source_distances(rd.from_pandas(edges), [1, 4],
                                 iters=3).to_pandas()
    got = {(int(r.src), int(r.entity)): int(r.dist)
           for r in out.itertuples(index=False)}
    assert got == {(1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3,
                   (1, 5): 2, (4, 4): 0, (4, 3): 1, (4, 2): 2,
                   (4, 1): 3, (4, 5): 3}


def test_multi_source_distances_distributed_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import multi_source_distances

    rng = np.random.RandomState(7)
    seen = {}
    for a, b in rng.randint(0, 25, size=(70, 2)):
        if a == b:
            continue
        seen.setdefault((int(min(a, b)), int(max(a, b))),
                        int(rng.randint(1, 5)))
    df = pd.DataFrame([(a, b, w) for (a, b), w in sorted(seen.items())],
                      columns=["a", "b", "w"])
    seeds = [0, 7, 19]
    kw = dict(iters=4, rows_hint=len(df) * 4)
    local = multi_source_distances(
        rd.from_pandas(df), seeds, **kw).to_pandas()
    dist = multi_source_distances(
        rd.from_pandas(df).repartition(4), seeds,
        local_edges_gate=0, **kw).to_pandas()
    key = ["src", "entity"]
    lo = local.sort_values(key, ignore_index=True)
    hi = dist.sort_values(key, ignore_index=True)[lo.columns]
    pd.testing.assert_frame_equal(lo, hi)


def test_multi_source_distances_bitset_parity(ray_session):
    # unit weights + small seed set hit the packed-bitmask BFS path;
    # it must agree pair-for-pair with the local pandas replay
    import ray.data as rd

    from opennre_ray.functions.graph import multi_source_distances

    rng = np.random.RandomState(11)
    seen = set()
    for a, b in rng.randint(0, 140, size=(400, 2)):
        if a != b:
            seen.add((int(min(a, b)), int(max(a, b))))
    df = pd.DataFrame(sorted(seen), columns=["a", "b"])
    df["w"] = 1
    seeds = [0, 7, 19, 64, 65, 66, 130]   # straddles one 64-bit word
    kw = dict(iters=4, rows_hint=len(df) * 4)
    local = multi_source_distances(
        rd.from_pandas(df), seeds, **kw).to_pandas()
    dist = multi_source_distances(
        rd.from_pandas(df).repartition(4), seeds,
        local_edges_gate=0, **kw).to_pandas()
    key = ["src", "entity"]
    lo = local.sort_values(key, ignore_index=True)
    hi = dist.sort_values(key, ignore_index=True)[lo.columns]
    pd.testing.assert_frame_equal(lo, hi)


def test_multi_source_distances_bitset_many_seeds(ray_session):
    # >64 seeds exercises the multi-word mask plumbing end to end
    import ray.data as rd

    from opennre_ray.functions.graph import multi_source_distances

    n = 90
    df = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    df["w"] = 1                               # a path graph 0-1-...-89
    seeds = list(range(0, n, 1))[:70]          # 70 seeds -> 2 words
    out = multi_source_distances(
        rd.from_pandas(df).repartition(3), seeds, iters=3,
        local_edges_gate=0).to_pandas()
    got = {(int(r.src), int(r.entity)): int(r.dist)
           for r in out.itertuples(index=False)}
    for s in seeds:
        for e in range(max(0, s - 3), min(n, s + 4)):
            assert got[(s, e)] == abs(s - e)
    assert all(d <= 3 for d in got.values())


def test_betweenness_hand(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import (BETWEENNESS_SCALE,
                                             betweenness_landmarks)

    # path graph 1-2-3-4-5, sources {1, 5}: the middle node 3 carries
    # the most shortest paths
    edges = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]})
    out = betweenness_landmarks(rd.from_pandas(edges), [1, 5],
                                iters=4).to_pandas()
    got = dict(zip(out["entity"], out["bc_micro"]))
    s = BETWEENNESS_SCALE
    # from src 1: delta(2)=3s, delta(3)=2s, delta(4)=s (targets beyond
    # each node); mirrored from src 5 -> every interior node totals 4s,
    # endpoints are never intermediate (delta 0)
    assert got[2] == got[3] == got[4] == 4 * s
    assert got[1] == got[5] == 0


def test_betweenness_distributed_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import betweenness_landmarks

    rng = np.random.RandomState(11)
    seen = set()
    for a, b in rng.randint(0, 22, size=(60, 2)):
        if a != b:
            seen.add((int(min(a, b)), int(max(a, b))))
    df = pd.DataFrame(sorted(seen), columns=["a", "b"])
    seeds = [0, 5, 13]
    kw = dict(iters=4, rows_hint=len(df) * 4)
    local = betweenness_landmarks(
        rd.from_pandas(df), seeds, **kw).to_pandas()
    dist = betweenness_landmarks(
        rd.from_pandas(df).repartition(4), seeds,
        local_edges_gate=0, **kw).to_pandas()
    lo = local.sort_values("entity", ignore_index=True)
    hi = dist.sort_values("entity", ignore_index=True)[lo.columns]
    pd.testing.assert_frame_equal(lo, hi)


def test_multi_source_ppr_hand(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import (PPR_DEN, PPR_NUM, PPR_SCALE,
                                             multi_source_ppr)

    # star: 1-2, 1-3 (deg 1=2, deg 2=deg 3=1)
    edges = pd.DataFrame({"a": [1, 1], "b": [2, 3]})
    out = multi_source_ppr(rd.from_pandas(edges), [1],
                           iters=1).to_pandas()
    got = {(int(r.src), int(r.entity)): int(r.pi)
           for r in out.itertuples(index=False)}
    base = PPR_SCALE * (PPR_DEN - PPR_NUM) // PPR_DEN
    contrib = PPR_SCALE * PPR_NUM // (PPR_DEN * 2)
    assert got[(1, 1)] == base
    assert got[(1, 2)] == contrib and got[(1, 3)] == contrib


def test_multi_source_ppr_distributed_parity(ray_session):
    import ray.data as rd

    from opennre_ray.functions.graph import multi_source_ppr

    rng = np.random.RandomState(23)
    seen = set()
    for a, b in rng.randint(0, 120, size=(380, 2)):
        if a != b:
            seen.add((int(min(a, b)), int(max(a, b))))
    df = pd.DataFrame(sorted(seen), columns=["a", "b"])
    seeds = [0, 5, 64, 70, 119]
    kw = dict(iters=3, rows_hint=len(df) * 4)
    local = multi_source_ppr(rd.from_pandas(df), seeds, **kw).to_pandas()
    dist = multi_source_ppr(rd.from_pandas(df).repartition(4), seeds,
                            local_edges_gate=0, **kw).to_pandas()
    key = ["src", "entity"]
    lo = local.sort_values(key, ignore_index=True)
    hi = dist.sort_values(key, ignore_index=True)[lo.columns]
    pd.testing.assert_frame_equal(lo, hi)
