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

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import hash_bucket_aggregate


def degree_stats(triples_ds, subj_col="subj", obj_col="obj",
                 rows_hint: int | None = None):
    """Per-entity out-degree, in-degree, and distinct predicate count.

    ``rows_hint``: approximate TRIPLE count (each triple explodes into two
    edge rows; the doubling is applied here) so bucket count scales with
    input size instead of a fixed 32 putting rows/32 in one worker's heap
    at 100× scale.
    """
    def explode(batch: pa.Table) -> pa.Table:
        def arr(name):
            c = batch.column(name)
            return (c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c).cast(pa.string())

        subj, obj, pred = arr(subj_col), arr(obj_col), arr("pred")
        n = batch.num_rows
        return pa.table({
            "entity": pa.concat_arrays([subj, obj]),
            "direction": pa.array(["out"] * n + ["in"] * n, pa.string()),
            "pred": pa.concat_arrays([pred, pred]),
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

    return hash_bucket_aggregate(
        edges, ["entity"], per_bucket,
        rows_hint=None if rows_hint is None else 2 * rows_hint)


#: edge count below which k-hop holds the frontier on the driver (broadcast
#: membership filter per hop — fastest for gazetteer-sized graphs). Above
#: it, a hub vertex (country page) can make hop-2 frontiers corpus-sized,
#: so the frontier becomes a Dataset and every hop is a distributed
#: semi-join + distinct + anti-join. Same gate philosophy as
#: COMPONENTS_LOCAL_LIMIT below.
KHOP_LOCAL_LIMIT = 2_000_000


def predicate_stats(triples_ds, *, subj_col="subj", pred_col="pred",
                    obj_col="obj", rows_hint: int | None = None):
    """Per-predicate functionality statistics — the KG-quality signal
    from PARIS (Suchanek et al. 2011): functionality(p) =
    #distinct subjects / #edges (1.0 ⇔ each subject has one p-edge),
    inverse functionality likewise over objects. Used to pick join keys
    for entity alignment and to flag noisy extracted relations.

    Scale shape: edge counts are map-side ``value_counts`` partials +
    one tiny groupby; distinct subj/obj counts dedupe (pred, endpoint)
    pairs through the bucketed aggregate (the shuffle moves per-batch
    DISTINCT pairs), then a second partial count per pred. Ratios are
    integer fixed-point (``10⁶·distinct // edges``), SQL-replayable.
    Output rows = #predicates (tiny); computed driver-side at the end.
    """
    from ray.data.aggregate import Sum

    from .relational import hash_bucket_aggregate

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[pred_col].value_counts()
        return pd.DataFrame({pred_col: vc.index, "c": vc.to_numpy()})

    n_edges = (triples_ds.map_batches(edge_partial, batch_format="pandas")
               .groupby(pred_col).aggregate(Sum("c", alias_name="n_edges"))
               .to_pandas())

    def distinct_count(col: str, out: str) -> pd.DataFrame:
        def uniq(df: pd.DataFrame) -> pd.DataFrame:
            return df[[pred_col, col]].drop_duplicates()

        deduped = hash_bucket_aggregate(
            triples_ds.map_batches(uniq, batch_format="pandas"),
            [pred_col, col],
            lambda g: g.drop_duplicates([pred_col, col]),
            rows_hint=rows_hint)

        def cnt(df: pd.DataFrame) -> pd.DataFrame:
            vc = df[pred_col].value_counts()
            return pd.DataFrame({pred_col: vc.index, "c": vc.to_numpy()})

        return (deduped.map_batches(cnt, batch_format="pandas")
                .groupby(pred_col).aggregate(Sum("c", alias_name=out))
                .to_pandas())

    out = (n_edges.merge(distinct_count(subj_col, "n_subj"), on=pred_col)
           .merge(distinct_count(obj_col, "n_obj"), on=pred_col))
    out = out.astype({"n_edges": "int64", "n_subj": "int64",
                      "n_obj": "int64"})
    out["functionality_fp"] = (10 ** 6 * out["n_subj"]) // out["n_edges"]
    out["inv_functionality_fp"] = ((10 ** 6 * out["n_obj"])
                                   // out["n_edges"])
    return out.sort_values(pred_col).reset_index(drop=True)


def k_hop_dataset(triples_ds, seeds, k: int = 2,
                  subj_col="subj", obj_col="obj",
                  rows_hint: int | None = None):
    """Entities reachable from ``seeds`` within k directed hops — frontier
    held as a DATASET end to end (the 100 TB formulation: nothing here is
    proportional to frontier or vertex count on any single process).

    Per hop: bucketed semi-join of edges against the frontier, distributed
    distinct over the reached objs, bucketed anti-join against everything
    already reached. Returns a Dataset (entity, hop) with hop = first hop
    at which the entity was reached (seeds at hop 0).
    """
    import ray.data as rd

    from .relational import hash_bucket_aggregate, shuffle_join

    reached = rd.from_pandas(pd.DataFrame(
        {"entity": pd.Series(sorted(seeds), dtype="object"),
         "hop": np.int64(0)}))
    frontier = reached.select_columns(["entity"])
    for hop in range(1, k + 1):
        hits = shuffle_join(triples_ds, frontier, subj_col, "entity",
                            [obj_col], [], how="left_semi",
                            rows_hint=rows_hint)

        def as_entity(t: pa.Table) -> pa.Table:
            return pa.table({"entity": t.column(obj_col).cast(pa.string())})

        objs = hits.map_batches(as_entity, batch_format="pyarrow")
        distinct = hash_bucket_aggregate(
            objs, ["entity"], lambda g: g.drop_duplicates("entity"),
            rows_hint=rows_hint)
        new = shuffle_join(distinct, reached, "entity", "entity", [], [],
                           how="left_anti", rows_hint=rows_hint)

        def with_hop(df: pd.DataFrame, _h=hop) -> pd.DataFrame:
            return pd.DataFrame({"entity": df["entity"],
                                 "hop": np.int64(_h)})

        new = new.map_batches(with_hop, batch_format="pandas").materialize()
        if new.count() == 0:
            break
        reached = reached.union(new).materialize()
        frontier = new.select_columns(["entity"])
    return reached


def k_hop_neighbors(triples_ds, seeds, k: int = 2,
                    subj_col="subj", obj_col="obj",
                    local_limit: int = KHOP_LOCAL_LIMIT) -> dict[str, int]:
    """Entities reachable from ``seeds`` within k directed hops, as a dict
    {entity: first_hop_reached} (a driver-sized answer by contract — use
    :func:`k_hop_dataset` directly when the reachable set itself may not
    fit the driver).

    Size-gated: small edge tables keep the measured-fast driver-held
    frontier (broadcast membership filter per hop); larger graphs run the
    fully distributed :func:`k_hop_dataset` and only the final (entity,
    hop) result is collected.
    """
    import pyarrow.compute as pc
    import ray

    n_edges = triples_ds.count()
    if n_edges > local_limit:
        out = k_hop_dataset(triples_ds, seeds, k,
                            subj_col=subj_col, obj_col=obj_col,
                            rows_hint=n_edges).to_pandas()
        return dict(zip(out["entity"], out["hop"].astype(int)))

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


#: edge count below which components finish with a driver-local union-find
#: (same size-gate pattern as relational.ANTI_JOIN_BROADCAST_LIMIT): the
#: distributed rounds cost ~1 s of fixed barrier each, which dominates on
#: small graphs, while 2M edges of short ids is comfortably driver-sized.
COMPONENTS_LOCAL_LIMIT = 2_000_000


def _local_components(edges_ds) -> "pd.DataFrame":
    """Union-find with min-id roots over a collected edge list (exact same
    output as the distributed rounds: component = min entity id)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        for a, c in zip(b.column("a").to_pylist(), b.column("b").to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(c, c)
            ra, rc = find(a), find(c)
            if ra != rc:                      # min id becomes the root
                hi, lo = (ra, rc) if ra > rc else (rc, ra)
                parent[hi] = lo
    return pd.DataFrame(
        sorted((v, find(v)) for v in parent),
        columns=["entity", "component"])


def connected_components(triples_ds, max_iters: int = 30,
                         subj_col="subj", obj_col="obj",
                         local_limit: int = COMPONENTS_LOCAL_LIMIT):
    """Undirected connected components — fully distributed min-label
    propagation with pointer jumping.

    The label table is itself a Dataset: no driver-side dict of all
    vertices, so the vertex set can exceed driver memory (the 100 TB
    formulation). Each round is:

    1. neighbor-min: hash-join labels onto edges (``Dataset.join`` on the
       source endpoint), then a bucketed per-entity min over the proposals
       plus the current labels — change detection rides along in the same
       bucket pass (old label and candidates co-located by entity).
    2. pointer jump: ``label(v) ← label(label(v))`` via a label-onto-label
       self-join. Min labels are always real vertex ids, so the inner join
       is total. Jumping halves the label-chain depth each round —
       O(log diameter) rounds on paths instead of O(diameter).

    Converges when the neighbor-min pass changes nothing (local min-
    stability implies per-component constant labels). Returns a Dataset
    (entity, component) where component = min entity id in the component.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .relational import compute_n_buckets

    label_schema = pa.schema([("entity", pa.string()),
                              ("label", pa.string())])

    def conform(ds, schema=label_schema):
        """Normalize every block to ``schema`` — empty blocks out of the
        bucketed aggregate carry NO columns, which breaks the per-partition
        pyarrow hash join ('no match for key field')."""
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return schema.empty_table()
            return t.select(schema.names).cast(schema)
        return ds.map_batches(fix, batch_format="pyarrow")

    def edge_frame(batch: pa.Table) -> pa.Table:
        s = batch.column(subj_col).combine_chunks() \
            if isinstance(batch.column(subj_col), pa.ChunkedArray) \
            else batch.column(subj_col)
        o = batch.column(obj_col).combine_chunks() \
            if isinstance(batch.column(obj_col), pa.ChunkedArray) \
            else batch.column(obj_col)
        return pa.table({
            "a": pa.concat_arrays([s.cast(pa.string()), o.cast(pa.string())]),
            "b": pa.concat_arrays([o.cast(pa.string()), s.cast(pa.string())]),
        })

    edge_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    edges = conform(triples_ds.map_batches(edge_frame,
                                           batch_format="pyarrow"),
                    edge_schema).materialize()
    n_edges = edges.count()
    if n_edges <= local_limit:
        # size-gated local finish: at this size the per-round distributed
        # barriers dominate; beyond the limit the rounds below never hold
        # the vertex set in any single process
        import ray.data as rd
        return rd.from_pandas(_local_components(edges))
    n_parts = max(2, compute_n_buckets(n_edges))

    def compact(ds):
        """Materialize with bounded block count: every round unions/joins
        datasets, and Ray ops preserve (or multiply) input block counts —
        unbounded, the plan grows ~6× blocks per round (measured: 3000+
        tasks by round 5 on a 59-edge graph). The repartition barrier
        (~1 s fixed cost locally) is paid only when actually over budget."""
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    edges = compact(edges)

    # init: label(v) = min(v, min neighbor) — the first neighbor-min round,
    # done with one vectorized elementwise min + a native (vectorized)
    # groupby aggregate
    def init_cand(batch: pa.Table) -> pa.Table:
        return pa.table({
            "entity": batch.column("a"),
            "cand": pc.min_element_wise(batch.column("a"),
                                        batch.column("b")),
        })

    labels = compact(conform(
        edges.map_batches(init_cand, batch_format="pyarrow")
        .groupby("entity").aggregate(Min("cand", alias_name="label"))))

    def min_and_diff(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("entity", as_index=False)["cand"].min()
        old = g[g["is_old"] == 1].set_index("entity")["cand"]
        new = new.rename(columns={"cand": "label"})
        new["changed"] = (
            new["label"] < old.reindex(new["entity"]).to_numpy()
        ).astype("int64")
        return new

    from .relational import shuffle_join

    prop_schema = pa.schema([("entity", pa.string()),
                             ("cand", pa.string()),
                             ("is_old", pa.int64())])

    def as_prop(src, dst, is_old):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return prop_schema.empty_table()
            return pa.table({
                "entity": t.column(src).cast(pa.string()),
                "cand": t.column(dst).cast(pa.string()),
                "is_old": pa.array(
                    np.full(t.num_rows, is_old, dtype=np.int64)),
            })
        return fn

    for _ in range(max_iters):
        # 1. neighbor-min proposals: label of each source endpoint flows to
        # its neighbor (distributed bucketed hash join; the label table is
        # never broadcast or collected)
        joined = shuffle_join(edges, labels, "a", "entity",
                              ["b"], ["label"], n_buckets=n_parts)
        prop = joined.map_batches(as_prop("b", "label", 0),
                                  batch_format="pyarrow")
        old = labels.map_batches(as_prop("entity", "label", 1),
                                 batch_format="pyarrow")
        merged = compact(hash_bucket_aggregate(prop.union(old), ["entity"],
                                               min_and_diff,
                                               n_buckets=n_parts))
        n_changed = merged.sum("changed")
        labels = conform(merged.select_columns(["entity", "label"]))
        if not n_changed:
            break
        # 2. pointer jump: label(v) ← label(label(v)) — a label-onto-label
        # self-join, halving label-chain depth each round
        right = labels.map_batches(
            lambda t: pa.table({"entity": t.column("entity"),
                                "label2": t.column("label")})
            if t.num_rows else pa.schema(
                [("entity", pa.string()),
                 ("label2", pa.string())]).empty_table(),
            batch_format="pyarrow")
        jumped = shuffle_join(labels, right, "label", "entity",
                              ["entity"], ["label2"], n_buckets=n_parts)
        labels = compact(conform(jumped.map_batches(
            lambda t: pa.table({"entity": t.column("entity"),
                                "label": t.column("label2")})
            if t.num_rows else label_schema.empty_table(),
            batch_format="pyarrow")))
    else:
        # fail loudly rather than return silently-unconverged labels that
        # look valid — pointer jumping makes this practically unreachable
        # at max_iters=30, so the check costs nothing in the normal path
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(last round still changed {n_changed} labels)")

    return labels.map_batches(
        lambda t: t.rename_columns(["entity", "component"]),
        batch_format="pyarrow")


PAGERANK_SCALE = 10 ** 12
#: size gate: below this many edges the graph replays locally with the
#: IDENTICAL int64 fixed-point iteration (bit-equal by construction) —
#: the distributed rounds' fixed barrier cost dominates tiny graphs.
#: ~200k string edges is a few MB on the driver.
PAGERANK_LOCAL_EDGES = 200_000


def pagerank(triples_ds, iters: int = 5, scale: int = PAGERANK_SCALE,
             damping_num: int = 85, damping_den: int = 100,
             subj_col="subj", obj_col="obj",
             seeds: "frozenset[str] | set[str] | None" = None,
             rows_hint: int | None = None,
             local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Distributed PageRank in integer fixed-point arithmetic.

    Floating-point PageRank is not reproducible across distributions: the
    per-node contribution sum arrives in nondeterministic order, and float
    addition is not associative. Ranks here are int64 micro-units
    (``scale`` = 1e12) and every step is integer arithmetic — addition is
    order-independent and floor division is exact — so the distributed
    result is bit-identical to a sequential or SQL (DuckDB ``//`` on
    BIGINT) replay, which makes the query hash-oracle-able.

    Update rule (fixed ``iters`` power iterations; dangling nodes leak
    mass — the standard no-renormalize formulation):

        contrib(u -> v) = (rank_t(u) * damping_num)
                          // (damping_den * outdeg(u))
        rank_{t+1}(v)   = (scale * (damping_den - damping_num))
                          // (damping_den * N)  +  sum_in contrib

    Scale shape: out-degrees and the static (src, dst, outdeg) edge table
    are built once (one bucketed shuffle each); each iteration is one
    bucketed hash join (ranks onto edges by source) plus one bucketed sum
    (contributions by destination, with the teleport base riding along as
    one union row per node) — the rank table is never collected to the
    driver. Block counts are bounded per round the same way
    ``connected_components`` bounds them.

    ``seeds``: personalization — teleport mass lands ONLY on the given
    node set (TrustRank, Gyöngyi et al. 2004: trust flows out from a
    vetted seed list, spam sits far from it). Both the init vector and
    the per-round base term use N = |seeds ∩ nodes| over the seed set
    instead of uniform-over-all-nodes; non-seed nodes still ride the rank
    table with an explicit 0 base so the output covers every node. The
    seed set is broadcast-sized by assumption (a curated trust list).

    Reference scope note: thunlp/OpenNRE stops at the triple table; graph
    analytics over the extracted KG (degree/components/k-hop/PageRank) are
    the downstream extension set this engine adds.
    """
    from .relational import compute_n_buckets, shuffle_join

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def edge_frame(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return edge_schema.empty_table()
        def arr(name):
            c = batch.column(name)
            return (c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c).cast(pa.string())
        return pa.table({"src": arr(subj_col), "dst": arr(obj_col)})

    edges = triples_ds.map_batches(edge_frame,
                                   batch_format="pyarrow").materialize()
    n_edges = edges.count()

    # size gate (same policy as connected_components): each distributed
    # round costs 2 bucketed shuffles of FIXED barrier latency (~1.6 s/
    # round measured) regardless of size — a graph whose edge list fits
    # on the driver replays the SAME int64 arithmetic locally (addition
    # order-independent, floor division exact -> bit-identical output)
    if n_edges <= local_edges_gate:
        import ray.data as rd
        epd = edges.to_pandas()
        if not len(epd):
            return rd.from_pandas(pd.DataFrame(
                {"entity": pd.Series([], dtype=str),
                 "rank_micro": pd.Series([], dtype="int64")}))
        src = epd["src"].to_numpy()
        dst = epd["dst"].to_numpy()
        ents, inv = np.unique(np.concatenate([src, dst]),
                              return_inverse=True)
        si, di = inv[:len(src)], inv[len(src):]
        outdeg = np.bincount(si, minlength=len(ents)).astype(np.int64)
        if seeds is None:
            r = np.full(len(ents), scale // len(ents), np.int64)
            basev = np.full(len(ents),
                            (scale * (damping_den - damping_num))
                            // (damping_den * len(ents)), np.int64)
        else:
            smask = np.isin(ents, list(frozenset(seeds)))
            ns = int(smask.sum())
            if ns == 0:
                raise ValueError(
                    "pagerank: no seed intersects the node set")
            r = np.where(smask, scale // ns, 0).astype(np.int64)
            basev = np.where(
                smask, (scale * (damping_den - damping_num))
                // (damping_den * ns), 0).astype(np.int64)
        for _ in range(iters):
            contrib = (r[si] * damping_num) // (damping_den * outdeg[si])
            nxt = basev.copy()
            np.add.at(nxt, di, contrib)
            r = nxt
        return rd.from_pandas(pd.DataFrame(
            {"entity": ents.astype(str),
             "rank_micro": r.astype(np.int64)}))

    n_parts = max(2, compute_n_buckets(rows_hint or n_edges))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    edges = compact(edges)

    # node set: distinct endpoints (one bucketed distinct; never collected)
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"entity": pa.concat_arrays(
            [t.column("src").combine_chunks(),
             t.column("dst").combine_chunks()])})

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("entity")

    nodes = compact(hash_bucket_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["entity"], distinct_bucket, n_buckets=n_parts))
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=str),
             "rank_micro": pd.Series([], dtype="int64")}))

    if seeds is None:
        base = (scale * (damping_den - damping_num)) \
            // (damping_den * n_nodes)
        r0 = scale // n_nodes

        def init_vec(ent: pa.Array) -> np.ndarray:
            return np.full(len(ent), r0, dtype=np.int64)

        def base_vec(ent: pa.Array) -> np.ndarray:
            return np.full(len(ent), base, dtype=np.int64)
    else:
        seed_set = frozenset(seeds)

        def count_seeds(t: pa.Table) -> pa.Table:
            hit = sum(1 for v in t.column("entity").to_pylist()
                      if v in seed_set)
            return pa.table({"n": pa.array([hit], pa.int64())})

        n_seeds = sum(
            sum(b.column("n").to_pylist())
            for b in nodes.map_batches(count_seeds, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if b.num_rows)
        if n_seeds == 0:
            raise ValueError("pagerank: no seed intersects the node set")
        base = (scale * (damping_den - damping_num)) \
            // (damping_den * n_seeds)
        r0 = scale // n_seeds

        def init_vec(ent: pa.Array) -> np.ndarray:
            return np.array([r0 if v in seed_set else 0
                             for v in ent.to_pylist()], dtype=np.int64)

        def base_vec(ent: pa.Array) -> np.ndarray:
            return np.array([base if v in seed_set else 0
                             for v in ent.to_pylist()], dtype=np.int64)

    # static out-degree-annotated edge table (built once, reused per iter)
    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("src", as_index=False).size()
        out = out.rename(columns={"size": "outdeg"})
        out["outdeg"] = out["outdeg"].astype("int64")
        return out

    deg = hash_bucket_aggregate(edges, ["src"], deg_bucket,
                                n_buckets=n_parts)
    edges_deg = compact(shuffle_join(edges, deg, "src", "src",
                                     ["dst"], ["outdeg"],
                                     n_buckets=n_parts))

    rank_schema = pa.schema([("entity", pa.string()),
                             ("rank_micro", pa.int64())])

    def conform(ds):
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return rank_schema.empty_table()
            return t.select(rank_schema.names).cast(rank_schema)
        return ds.map_batches(fix, batch_format="pyarrow")

    ranks = conform(nodes.map_batches(
        lambda t: pa.table({
            "entity": t.column("entity"),
            "rank_micro": pa.array(
                init_vec(t.column("entity").combine_chunks()))})
        if t.num_rows else rank_schema.empty_table(),
        batch_format="pyarrow"))

    def mk_contrib(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"entity": pd.Series([], dtype=str),
                                 "rank_micro": pd.Series([], dtype="int64")})
        # int64 throughout: rank*num <= 1e12*85 << 2^63, exact
        r = df["rank_micro"].to_numpy(dtype=np.int64)
        d = df["outdeg"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "entity": df["dst"].astype(str).to_numpy(),
            "rank_micro": (r * damping_num) // (damping_den * d)})

    base_rows = conform(nodes.map_batches(
        lambda t: pa.table({
            "entity": t.column("entity"),
            "rank_micro": pa.array(
                base_vec(t.column("entity").combine_chunks()))})
        if t.num_rows else rank_schema.empty_table(),
        batch_format="pyarrow"))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity", as_index=False)["rank_micro"].sum()
        out["rank_micro"] = out["rank_micro"].astype("int64")
        return out

    for _ in range(iters):
        joined = shuffle_join(edges_deg, ranks, "src", "entity",
                              ["dst", "outdeg"], ["rank_micro"],
                              n_buckets=n_parts)
        contrib = joined.map_batches(mk_contrib, batch_format="pandas")
        ranks = compact(conform(hash_bucket_aggregate(
            contrib.union(base_rows), ["entity"], sum_bucket,
            n_buckets=n_parts)))

    return ranks


def label_propagation(edges_ds, seeds_ds, iters: int = 3,
                      rows_hint: int | None = None,
                      local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Seeded (clamped) synchronous label propagation over an undirected
    graph — semi-supervised node classification (Zhu & Ghahramani 2002
    label spreading with hard-clamped seeds; LPA, Raghavan et al. 2007):

        label_0(v) = seed(v) if v seeded, else unlabeled
        label_t(v) = seed(v) if v seeded, else
                     argmax_l |{u ∈ N(v) : label_{t-1}(u) = l}|
                     (ties → lexicographically smallest label; no
                      labeled neighbor → unlabeled this round)

    Fully deterministic — exact integer votes plus a total tie order —
    so the distributed result is value-identical to a chained-CTE SQL
    replay (every non-seed label is recomputed fresh each round from
    the previous round's labels, the synchronous formulation the SQL
    mirrors one CTE per round).

    Inputs: ``edges_ds`` = distinct undirected (a, b) int64 edges (the
    ``build_copurchase_edges`` shape); ``seeds_ds`` = (entity int64,
    label str), at most one row per entity. Seeds that touch no edge
    still appear in the output (clamped), exactly like the SQL's
    UNION ALL. Returns a Dataset (entity, label) of every labeled node
    after ``iters`` rounds.

    Scale shape: per round ONE bucketed hash join (labels onto the
    symmetrized adjacency, keyed by the voting neighbor) + ONE bucketed
    clamp/majority keyed by the receiving node, with the seed table
    riding the same exchange as tagged rows — the label table never
    reaches the driver, and block counts re-compact per round like
    ``pagerank``.
    """
    from .relational import compute_n_buckets, shuffle_join

    lab_schema = pa.schema([("entity", pa.int64()), ("label", pa.string())])

    def conform(ds):
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return lab_schema.empty_table()
            return t.select(lab_schema.names).cast(lab_schema)
        return ds.map_batches(fix, batch_format="pyarrow")

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("u", pa.int64()),
                              ("v", pa.int64())]).empty_table()
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    adj = edges_ds.map_batches(symmetrize,
                               batch_format="pyarrow").materialize()
    n_adj = adj.count()

    # size gate (pagerank's policy): votes are exact integer counts with
    # a total (count desc, label asc) tie order — the local pandas replay
    # below runs the SAME synchronous update, value-identical
    if n_adj <= local_edges_gate:
        import ray.data as rd
        apd = adj.to_pandas()
        seed_df = (conform(seeds_ds).to_pandas()
                   .drop_duplicates("entity")
                   .astype({"entity": np.int64, "label": str}))
        seed_ids = set(seed_df["entity"])
        cur = seed_df
        for _ in range(iters):
            j = apd.merge(cur, left_on="u", right_on="entity")
            votes = j[~j["v"].isin(seed_ids)]
            c = (votes.groupby(["v", "label"], sort=False).size()
                 .reset_index(name="c")
                 .sort_values(["v", "c", "label"],
                              ascending=[True, False, True])
                 .drop_duplicates("v"))
            won = pd.DataFrame({
                "entity": c["v"].to_numpy(np.int64),
                "label": c["label"].astype(str).to_numpy()})
            cur = pd.concat([won, seed_df], ignore_index=True)
        return rd.from_pandas(cur.reset_index(drop=True))

    n_parts = max(2, compute_n_buckets(rows_hint or n_adj))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    adj = compact(adj)
    seeds = compact(conform(seeds_ds))

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "entity": pd.Series([], dtype="int64"),
                    "label": pd.Series([], dtype="object"),
                    "side": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "entity": df["entity"].astype(np.int64).to_numpy(),
                "label": df["label"].astype(str).to_numpy(),
                "side": np.full(len(df), side, np.int64)})
        return f

    seed_rows = seeds.map_batches(tag(1), batch_format="pandas") \
        .materialize()

    def vote_rows(df: pd.DataFrame) -> pd.DataFrame:
        # shuffle_join output: (u, v, label); the vote lands on v
        if not len(df):
            return pd.DataFrame({
                "entity": pd.Series([], dtype="int64"),
                "label": pd.Series([], dtype="object"),
                "side": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "entity": df["v"].astype(np.int64).to_numpy(),
            "label": df["label"].astype(str).to_numpy(),
            "side": np.zeros(len(df), np.int64)})

    def clamp_majority(g: pd.DataFrame) -> pd.DataFrame:
        seed = g[g["side"] == 1]
        votes = g[g["side"] == 0]
        if len(seed):
            votes = votes[~votes["entity"].isin(seed["entity"])]
        outs = []
        if len(votes):
            c = (votes.groupby(["entity", "label"], sort=False).size()
                 .reset_index(name="c")
                 .sort_values(["entity", "c", "label"],
                              ascending=[True, False, True]))
            outs.append(c.drop_duplicates("entity")[["entity", "label"]])
        if len(seed):
            outs.append(seed[["entity", "label"]]
                        .drop_duplicates("entity"))
        if not outs:
            return pd.DataFrame({
                "entity": pd.Series([], dtype="int64"),
                "label": pd.Series([], dtype="object")})
        return pd.concat(outs, ignore_index=True)

    labels = seeds
    for _ in range(iters):
        joined = shuffle_join(adj, labels, "u", "entity",
                              ["v"], ["label"], n_buckets=n_parts)
        votes = joined.map_batches(vote_rows, batch_format="pandas")
        labels = compact(conform(hash_bucket_aggregate(
            votes.union(seed_rows), ["entity"], clamp_majority,
            n_buckets=n_parts)))

    return labels


def _conform_ds(ds, schema):
    """Project/cast every block to ``schema`` (empty blocks included) —
    the empty-block guard every iterative Dataset helper needs: Ray
    emits schema-less empty blocks from unions/aggregates, and a later
    select/cast/filter on one would throw."""

    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow")


def _delta_bf_rounds(adj, seed_df, key_cols, iters, n_parts, compact):
    """Frontier-delta synchronous Bellman-Ford over a symmetrized
    (u, v, w) adjacency Dataset: each round joins ONLY the labels that
    improved in the previous round against the adjacency, then one
    bucketed merge of the relaxed candidates with the settled table
    computes both the new per-key minima and the improved flag. This is
    the classic delta optimization — a label whose value did not change
    was already relaxed in the round after it last improved, so its
    re-relaxation is dominated (induction over rounds) and the settled
    table after ``iters`` rounds is value-identical to re-relaxing the
    full table every round. Join + aggregate volume drops from
    rounds × |settled| × deg to Σ_r |frontier_r| × deg, which is what
    makes k-landmark BFS linear-ish in total traffic at scale (the
    frontier empties once the reachable set saturates, and the loop
    exits early).

    ``key_cols`` is ["entity"] (sssp) or ["src", "entity"]
    (multi_source_distances); ``seed_df`` holds the distance-0 labels.
    Returns a Dataset with key_cols + dist (int64).
    """
    import ray.data as rd

    from .relational import shuffle_join

    carry = [c for c in key_cols if c != "entity"]
    out_schema = pa.schema([(c, pa.int64()) for c in key_cols]
                           + [("dist", pa.int64())])
    st_schema = pa.schema([(c, pa.int64()) for c in key_cols]
                          + [("dist", pa.int64()), ("imp", pa.int64())])

    conform = _conform_ds

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        # shuffle_join output: (u, v, w, dist[, carry]) — candidate
        # label at v via edge (u, v), flagged fresh for the merge
        cols: dict = {}
        if not len(df):
            for c in key_cols:
                cols[c] = np.array([], np.int64)
            cols["dist"] = np.array([], np.int64)
            cols["fresh"] = np.array([], np.int64)
            return pd.DataFrame(cols)
        for c in carry:
            cols[c] = df[c].astype(np.int64).to_numpy()
        cols["entity"] = df["v"].astype(np.int64).to_numpy()
        cols["dist"] = (df["dist"].astype(np.int64).to_numpy()
                        + df["w"].astype(np.int64).to_numpy())
        cols["fresh"] = np.ones(len(df), np.int64)
        return pd.DataFrame(cols)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby(key_cols, as_index=False)["dist"].min()
        oldb = (g[g["fresh"] == 0]
                .groupby(key_cols)["dist"].min().rename("old"))
        m = new.join(oldb, on=key_cols)
        imp = m["old"].isna() | (m["dist"] < m["old"])
        out = m[key_cols + ["dist"]].copy()
        out["dist"] = out["dist"].astype("int64")
        out["imp"] = imp.to_numpy().astype(np.int64)
        return out

    def as_old(t: pa.Table) -> pa.Table:
        # settled rows re-enter the merge flagged not-fresh
        t = t.drop_columns(["imp"])
        return t.append_column(
            "fresh", pa.array(np.zeros(t.num_rows, np.int64)))

    def keep_imp(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("imp"), 1))

    seed_df = seed_df.copy()
    seed_df["imp"] = np.int64(1)
    settled = compact(conform(rd.from_pandas(seed_df), st_schema))
    frontier = settled

    for _ in range(iters):
        if frontier.count() == 0:
            break
        joined = shuffle_join(adj, frontier, "u", "entity",
                              ["v", "w"], ["dist"] + carry,
                              n_buckets=n_parts)
        relaxed = joined.map_batches(relax, batch_format="pandas")
        old = settled.map_batches(as_old, batch_format="pyarrow")
        settled = compact(conform(hash_bucket_aggregate(
            relaxed.union(old), key_cols, merge_bucket,
            n_buckets=n_parts), st_schema))
        frontier = settled.map_batches(keep_imp, batch_format="pyarrow")

    return conform(settled, out_schema)


def sssp(edges_ds, seeds, iters: int = 4,
         rows_hint: int | None = None,
         local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Multi-source weighted shortest paths by synchronous Bellman-Ford
    rounds over an undirected integer-weighted graph:

        d_0(v) = 0 if v ∈ seeds, else ∞ (absent)
        d_t(v) = min(d_{t-1}(v), min_{(u,v) ∈ E} d_{t-1}(u) + w(u, v))

    After ``iters`` rounds the result is exact for every node within
    ``iters`` hops of a seed (classic round-limited Bellman-Ford);
    unreached nodes are absent from the output. Integer weights + min
    (order-independent, exactly associative) make the distributed result
    value-identical to an unrolled-CTE SQL replay.

    Inputs: ``edges_ds`` = (a, b, w) int64 rows, one per undirected
    edge; ``seeds`` = iterable of int node ids (distance-0 sources —
    broadcast-sized by assumption: a hub/POI list). Returns a Dataset
    (entity, dist).

    Scale shape: per round ONE bucketed hash join (current distances
    onto the symmetrized adjacency by source) + ONE bucketed min keyed
    by destination, with the carry-over distances riding the same
    exchange — the distance table never reaches the driver; block
    counts re-compact per round like ``pagerank``.
    """
    from .relational import compute_n_buckets, shuffle_join

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("u", pa.int64()), ("v", pa.int64()),
                              ("w", pa.int64())]).empty_table()
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        w = t.column("w").combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a]),
                         "w": pa.concat_arrays([w, w])})

    adj = edges_ds.map_batches(symmetrize,
                               batch_format="pyarrow").materialize()
    n_adj = adj.count()

    # size gate (pagerank's policy): min over ints is exactly
    # associative in any order — local replay is value-identical
    if n_adj <= local_edges_gate:
        import ray.data as rd
        apd = adj.to_pandas()
        cur = pd.DataFrame({
            "entity": pd.Series(sorted(set(int(s) for s in seeds)),
                                dtype="int64")})
        cur["dist"] = np.int64(0)
        for _ in range(iters):
            j = apd.merge(cur, left_on="u", right_on="entity")
            cand = pd.DataFrame({
                "entity": j["v"].to_numpy(np.int64),
                "dist": (j["dist"].to_numpy(np.int64)
                         + j["w"].to_numpy(np.int64))})
            cur = (pd.concat([cand, cur], ignore_index=True)
                   .groupby("entity", as_index=False)["dist"].min()
                   .astype({"entity": np.int64, "dist": np.int64}))
        return rd.from_pandas(cur)

    n_parts = max(2, compute_n_buckets(rows_hint or n_adj))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    adj = compact(adj)

    seed0 = pd.DataFrame({
        "entity": pd.Series(sorted(set(int(s) for s in seeds)),
                            dtype="int64"),
        "dist": pd.Series(0, index=range(len(set(seeds))),
                          dtype="int64")})
    return _delta_bf_rounds(adj, seed0, ["entity"], iters, n_parts,
                            compact)


#: seed-count ceiling for the packed-bitmask BFS fast path (64 words
#: of mask per row — beyond this the row payload stops being "small")
MSD_BITSET_MAX_SEEDS = 4096


def _bitset_bfs(adj, seed_list, iters, n_parts, compact):
    """Packed-bitmask multi-source BFS for unit-weight graphs with a
    broadcast-sized seed set (the landmark case): instead of shuffling
    (src, entity, dist) label rows — whose join volume is
    |reached pairs| × degree per round once the reach saturates — keep
    ONE row per entity holding a ⌈|seeds|/64⌉-word bitmask of the seeds
    that have reached it, OR-aggregate neighbor masks per round
    (np.bitwise_or.reduceat per bucket — no per-group Python), and emit
    each (src, entity, dist=r) exactly once, the round its bit first
    turns on. Per-round shuffle volume is |incident edges of changed
    entities| × mask bytes (e.g. 500 seeds → 64 B) independent of how
    many seeds already reached a node, and the emitted pair table is
    written once, never re-shuffled — the HyperANF/Palmer-style
    reformulation of k-landmark BFS. Value-identical to round-limited
    Bellman-Ford with w=1: a bit set in round r ⇔ min-hop distance r.
    """
    import ray.data as rd

    from .relational import shuffle_join

    S = len(seed_list)
    words = (S + 63) // 64
    wcols = [f"m{i}" for i in range(words)]
    nbcols = [f"nb{i}" for i in range(words)]
    seeds_arr = np.asarray(seed_list, dtype=np.int64)

    out_schema = pa.schema([("src", pa.int64()), ("entity", pa.int64()),
                            ("dist", pa.int64())])
    st_schema = pa.schema([("entity", pa.int64())]
                          + [(c, pa.int64()) for c in wcols]
                          + [("chg", pa.int64())])

    conform = _conform_ds

    idx = np.arange(S)
    masks0 = np.zeros((S, words), dtype=np.uint64)
    masks0[idx, idx // 64] = np.uint64(1) << np.uint64(idx % 64)
    init = {"entity": seeds_arr}
    for wi, c in enumerate(wcols):
        init[c] = masks0[:, wi].view(np.int64)
    init["chg"] = np.ones(S, np.int64)
    state = compact(conform(rd.from_pandas(pd.DataFrame(init)),
                            st_schema))

    def keep_chg(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("chg"), 1))

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        # joined (v, m*) — the mask of u flows to its neighbor v
        cols = {"entity": (df["v"].astype(np.int64).to_numpy()
                           if len(df) else np.array([], np.int64))}
        for c in wcols:
            cols[c] = (df[c].astype(np.int64).to_numpy()
                       if len(df) else np.array([], np.int64))
        cols["fresh"] = np.ones(len(df), np.int64)
        return pd.DataFrame(cols)

    def as_old(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["chg"])
        return t.append_column(
            "fresh", pa.array(np.zeros(t.num_rows, np.int64)))

    def or_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out: dict = {"entity": np.array([], np.int64)}
        if not len(g):
            for c in wcols + nbcols:
                out[c] = np.array([], np.int64)
            out["chg"] = np.array([], np.int64)
            return pd.DataFrame(out)
        g = g.sort_values("entity", kind="mergesort")
        ent = g["entity"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
        uents = ent[starts]
        newm = np.empty((len(uents), words), np.uint64)
        for wi, c in enumerate(wcols):
            vals = np.ascontiguousarray(
                g[c].to_numpy(np.int64)).view(np.uint64)
            newm[:, wi] = np.bitwise_or.reduceat(vals, starts)
        oldg = g[g["fresh"] == 0]
        oldm = np.zeros((len(uents), words), np.uint64)
        if len(oldg):
            pos = np.searchsorted(uents,
                                  oldg["entity"].to_numpy(np.int64))
            for wi, c in enumerate(wcols):
                oldm[pos, wi] = np.ascontiguousarray(
                    oldg[c].to_numpy(np.int64)).view(np.uint64)
        nb = newm & ~oldm
        out["entity"] = uents
        for wi, c in enumerate(wcols):
            out[c] = newm[:, wi].view(np.int64)
        for wi, c in enumerate(nbcols):
            out[c] = nb[:, wi].view(np.int64)
        out["chg"] = nb.any(axis=1).astype(np.int64)
        return pd.DataFrame(out)

    def expand_factory(r: int):
        def expand(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            ent = t.column("entity").to_numpy(
                zero_copy_only=False).astype(np.int64)
            nb = np.empty((t.num_rows, words), np.uint64)
            for wi, c in enumerate(nbcols):
                nb[:, wi] = np.ascontiguousarray(t.column(c).to_numpy(
                    zero_copy_only=False).astype(np.int64)).view(
                        np.uint64)
            # little-endian x86: word i's uint8 view is bits 64i..64i+63
            bits = np.unpackbits(nb.view(np.uint8).reshape(
                t.num_rows, words * 8), axis=1, bitorder="little")[:, :S]
            rows, bidx = np.nonzero(bits)
            return pa.table({"src": pa.array(seeds_arr[bidx]),
                             "entity": pa.array(ent[rows]),
                             "dist": pa.array(
                                 np.full(len(rows), r, np.int64))})
        return expand

    emits = [conform(rd.from_pandas(pd.DataFrame({
        "src": seeds_arr, "entity": seeds_arr,
        "dist": np.zeros(S, np.int64)})), out_schema)]

    for r in range(1, iters + 1):
        front = state.map_batches(keep_chg, batch_format="pyarrow")
        if front.count() == 0:
            break
        joined = shuffle_join(adj, front, "u", "entity", ["v"], wcols,
                              n_buckets=n_parts)
        fresh = joined.map_batches(contrib, batch_format="pandas")
        old = state.map_batches(as_old, batch_format="pyarrow")
        merged = compact(hash_bucket_aggregate(
            fresh.union(old), ["entity"], or_bucket,
            n_buckets=n_parts))
        emits.append(compact(conform(merged.map_batches(
            expand_factory(r), batch_format="pyarrow"), out_schema)))
        state = conform(merged, st_schema)

    acc = emits[0]
    for e in emits[1:]:
        acc = acc.union(e)
    return compact(conform(acc, out_schema))


def _bitset_bfs_local(apd: pd.DataFrame, seed_list: list[int],
                      iters: int) -> list[pd.DataFrame]:
    """Single-process companion of :func:`_bitset_bfs`: the same
    packed-bitmask BFS over the symmetrized (u, v) edge frame, one
    numpy OR-scatter per round. The per-round (src, entity, dist)
    frames come back as a list so the caller can feed Ray one block per
    round instead of one monolithic frame. Value-identical to the
    pandas merge/groupby-min replay (a bit turns on in round r ⇔
    min-hop distance r), but |pairs| × degree work becomes
    |edges| × mask-words."""
    S = len(seed_list)
    words = (S + 63) // 64
    seeds_arr = np.asarray(seed_list, dtype=np.int64)
    u = apd["u"].to_numpy(np.int64) if len(apd) else np.array([], np.int64)
    v = apd["v"].to_numpy(np.int64) if len(apd) else np.array([], np.int64)
    ents = np.unique(np.concatenate([u, v, seeds_arr]))
    ui = np.searchsorted(ents, u)
    vi = np.searchsorted(ents, v)
    si = np.searchsorted(ents, seeds_arr)
    masks = np.zeros((len(ents), words), np.uint64)
    bit = np.arange(S)
    masks[si, bit // 64] |= np.uint64(1) << np.uint64(bit % 64)
    frames = [pd.DataFrame({"src": seeds_arr, "entity": seeds_arr,
                            "dist": np.zeros(S, np.int64)})]
    for r in range(1, iters + 1):
        new = masks.copy()
        np.bitwise_or.at(new, vi, masks[ui])
        nb = new & ~masks
        if not nb.any():
            break
        rows, bidx = np.nonzero(np.unpackbits(
            nb.view(np.uint8).reshape(len(ents), words * 8),
            axis=1, bitorder="little")[:, :S])
        frames.append(pd.DataFrame({
            "src": seeds_arr[bidx], "entity": ents[rows],
            "dist": np.full(len(rows), r, np.int64)}))
        masks = new
    return frames


def multi_source_distances(edges_ds, seeds, iters: int = 4,
                           rows_hint: int | None = None,
                           local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Per-source round-limited BFS/Bellman-Ford distances: like
    :func:`sssp` but each seed keeps its OWN distance frontier, so the
    result is the (src, entity, dist) table the Eppstein-Wang closeness
    estimator and landmark-distance features need. Same determinism
    argument as ``sssp`` (integer weights + min are exactly associative)
    and the same scale shape — per round one bucketed join of the
    frontier onto the symmetrized adjacency plus one bucketed min, now
    keyed by (src, entity); state size is |seeds| x reach, which is why
    the caller samples seeds (k landmarks, not all vertices).

    Inputs: ``edges_ds`` = (a, b, w) int64 undirected edges; ``seeds`` =
    broadcast-sized iterable of int node ids. Returns a Dataset
    (src, entity, dist) with dist exact within ``iters`` hops.
    """
    from .relational import compute_n_buckets, shuffle_join

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("u", pa.int64()), ("v", pa.int64()),
                              ("w", pa.int64())]).empty_table()
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        w = t.column("w").combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a]),
                         "w": pa.concat_arrays([w, w])})

    adj = edges_ds.map_batches(symmetrize,
                               batch_format="pyarrow").materialize()
    n_adj = adj.count()
    seed_list = sorted(set(int(s) for s in seeds))
    seed0 = pd.DataFrame({
        "src": pd.Series(seed_list, dtype="int64"),
        "entity": pd.Series(seed_list, dtype="int64"),
        "dist": pd.Series(0, index=range(len(seed_list)),
                          dtype="int64")})

    if n_adj <= local_edges_gate:
        import ray.data as rd
        apd = adj.to_pandas()
        if (0 < len(seed_list) <= MSD_BITSET_MAX_SEEDS
                and (n_adj == 0
                     or (apd["w"].to_numpy(np.int64) == 1).all())):
            return rd.from_pandas(
                _bitset_bfs_local(apd, seed_list, iters))
        cur = seed0
        for _ in range(iters):
            j = apd.merge(cur, left_on="u", right_on="entity")
            cand = pd.DataFrame({
                "src": j["src"].to_numpy(np.int64),
                "entity": j["v"].to_numpy(np.int64),
                "dist": (j["dist"].to_numpy(np.int64)
                         + j["w"].to_numpy(np.int64))})
            cur = (pd.concat([cand, cur], ignore_index=True)
                   .groupby(["src", "entity"], as_index=False)["dist"]
                   .min().astype({"src": np.int64, "entity": np.int64,
                                  "dist": np.int64}))
        return rd.from_pandas(cur)

    n_parts = max(2, compute_n_buckets(rows_hint or n_adj))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    adj = compact(adj)

    # unit-weight + broadcast-sized seed set → packed-bitmask BFS (the
    # landmark case both production callers hit); anything else keeps
    # the general weighted frontier-delta Bellman-Ford
    if 0 < len(seed_list) <= MSD_BITSET_MAX_SEEDS and n_adj > 0:
        from ray.data.aggregate import Max, Min
        mm = adj.aggregate(Min("w"), Max("w"))
        if mm and mm.get("min(w)") == 1 and mm.get("max(w)") == 1:
            return _bitset_bfs(adj, seed_list, iters, n_parts, compact)

    return _delta_bf_rounds(adj, seed0, ["src", "entity"], iters,
                            n_parts, compact)


#: Brandes dependency fixed-point scale (delta in micro units)
BETWEENNESS_SCALE = 10 ** 6


def _bits_of(words: np.ndarray, width: int) -> np.ndarray:
    # (n,) uint64 -> (n, width) bool, bit i = source i of the chunk
    return np.unpackbits(words[:, None].view(np.uint8), axis=1,
                         bitorder="little")[:, :width].astype(bool)


def _brandes_chunk(sh: dict, c0: int) -> tuple[np.ndarray, np.ndarray]:
    """One 64-source Brandes chunk over the shared dense-id edge
    arrays; returns (bc partial, visit-count partial), both (nV,)
    int64. Pure numpy — runs serially or as a Ray task."""
    ui, vi = sh["ui"], sh["vi"]
    ui_s, vi_s = sh["ui_s"], sh["vi_s"]
    ui_t, vi_t = sh["ui_t"], sh["vi_t"]
    si, nV = sh["si"], sh["nV"]
    iters, scale = sh["iters"], sh["scale"]

    chunk = np.arange(c0, min(c0 + 64, sh["n_seeds"]))
    width = len(chunk)
    sic = si[chunk]
    # BFS level masks: nb[r][v] bit i set iff source chunk[i] first
    # reaches v in round r
    mask = np.zeros(nV, np.uint64)
    mask[sic] = np.uint64(1) << np.uint64(np.arange(width))
    nb = [mask.copy()]
    for _ in range(iters):
        new = mask.copy()
        np.bitwise_or.at(new, vi, mask[ui])
        fresh = new & ~mask
        if not fresh.any():
            break
        nb.append(fresh)
        mask = new
    R = len(nb) - 1

    sigma = np.zeros((nV, width), np.int64)
    sigma[sic, np.arange(width)] = 1
    for r in range(1, R + 1):
        if sigma.dtype != object and int(sigma.max()) >= 2 ** 56:
            sigma = sigma.astype(object)     # path counts near wrap
        aw = nb[r - 1][ui_s] & nb[r][vi_s]
        sel = np.flatnonzero(aw)
        if not len(sel):
            continue
        act = _bits_of(aw[sel], width)
        contrib = sigma[ui_s[sel]] * act
        vsel = vi_s[sel]
        starts = np.flatnonzero(np.r_[True, vsel[1:] != vsel[:-1]])
        sums = np.add.reduceat(contrib, starts, axis=0)
        sigma[vsel[starts]] += sums

    delta = np.zeros((nV, width), np.int64)
    for l in range(R - 1, -1, -1):
        # int64 headroom guard: sigma·(scale+delta) is exact in the SQL
        # HUGEINT replay but would WRAP silently in numpy — on a graph
        # dense enough to threaten 2^62, switch the matrices to Python
        # ints (object dtype: elementwise ops and reduceat still work,
        # just slower) for the remaining levels
        if (sigma.dtype != object
                and int(sigma.max()) * (scale + int(delta.max()))
                >= 2 ** 62):
            sigma = sigma.astype(object)
            delta = delta.astype(object)
        aw = nb[l][ui_t] & nb[l + 1][vi_t]
        sel = np.flatnonzero(aw)
        if not len(sel):
            continue
        act = _bits_of(aw[sel], width)
        div = np.where(act, sigma[vi_t[sel]], 1)
        contrib = (sigma[ui_t[sel]] * (scale + delta[vi_t[sel]])
                   // div) * act
        usel = ui_t[sel]
        starts = np.flatnonzero(np.r_[True, usel[1:] != usel[:-1]])
        sums = np.add.reduceat(contrib, starts, axis=0)
        urows = usel[starts]
        at_l = _bits_of(nb[l][urows], width)
        delta[urows] = np.where(at_l, sums, delta[urows])

    bc = delta.sum(axis=1)
    bc[sic] -= delta[sic, np.arange(width)]   # own-source excluded
    if bc.dtype == object:
        # back to int64 for the caller's accumulator — OverflowError
        # (loud) if a per-chunk total genuinely exceeds BIGINT, which
        # the SQL replay's final ::BIGINT cast would also refuse
        bc = bc.astype(np.int64)
    nvis = _bits_of(mask, width).sum(axis=1)
    return bc, nvis


def _brandes_local_vec(apd: pd.DataFrame, seed_list: list[int],
                       iters: int, scale: int) -> pd.DataFrame:
    """Single-node Brandes over sampled sources, vectorized across
    sources in 64-wide bitmask chunks: BFS levels come from the packed
    OR-scatter (one uint64 word per chunk), sigma and delta are
    edge-sorted ``np.add.reduceat`` accumulations over (edge, source)
    matrices, and independent chunks fan out as Ray tasks (the shared
    edge arrays ship once via ray.put). Bit-for-bit the same integer
    semantics as the per-source dict replay it replaced (per-edge floor
    division BEFORE the sum; sigma only accumulates along
    dist[u]+1 == dist[v] DAG edges; each source's own delta excluded
    from its bc) — the distributed-parity pytest pins that. Cost is
    O(rounds × |E| × chunks/64) numpy ops spread over the chunk tasks
    instead of Python dict loops per source."""
    u = (apd["u"].to_numpy(np.int64) if len(apd)
         else np.array([], np.int64))
    v = (apd["dst"].to_numpy(np.int64) if len(apd)
         else np.array([], np.int64))
    seeds_arr = np.asarray(sorted(set(seed_list)), dtype=np.int64)
    ents = np.unique(np.concatenate([u, v, seeds_arr]))
    nV = len(ents)
    ui = np.searchsorted(ents, u)
    vi = np.searchsorted(ents, v)
    si = np.searchsorted(ents, seeds_arr)

    # edges sorted by destination (sigma gather) and by source (delta)
    pv = np.argsort(vi, kind="stable")
    pu = np.argsort(ui, kind="stable")
    sh = {"ui": ui, "vi": vi, "ui_s": ui[pv], "vi_s": vi[pv],
          "ui_t": ui[pu], "vi_t": vi[pu], "si": si, "nV": nV,
          "n_seeds": len(seeds_arr), "iters": iters, "scale": scale}

    starts = list(range(0, len(seeds_arr), 64))
    import ray
    if len(starts) > 1 and ray.is_initialized():
        shref = ray.put(sh)
        fn = ray.remote(num_cpus=1)(_brandes_chunk)
        outs = ray.get([fn.remote(shref, c0) for c0 in starts])
    else:
        outs = [_brandes_chunk(sh, c0) for c0 in starts]

    bc = np.zeros(nV, np.int64)
    nvis = np.zeros(nV, np.int64)
    for bc_c, nvis_c in outs:
        bc += bc_c
        nvis += nvis_c
    is_seed = np.zeros(nV, np.int64)
    is_seed[si] = 1
    keep = (nvis - is_seed) > 0
    return pd.DataFrame({"entity": ents[keep],
                         "bc_micro": bc[keep]}).astype(
                             {"entity": np.int64, "bc_micro": np.int64})


def betweenness_landmarks(edges_ds, seeds, iters: int = 4,
                          rows_hint: int | None = None,
                          local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Approximate betweenness centrality from sampled landmark sources
    (Brandes 2001 dependency accumulation; Brandes-Pich 2007 source
    sampling — exact betweenness is an all-sources O(V·E) and off the
    table at web scale). Unweighted, round-limited to ``iters`` hops.

    Exact integer semantics shared by the local replay, the distributed
    path and the SQL oracle (every division a floor, every sum
    order-independent):

        sigma(s, v at level r) = sum over preds u at level r-1 of
                                 sigma(s, u)            (sigma(s,s)=1)
        delta(s, v at level l) = sum over succs w at level l+1 of
            sigma(s,v) * (SCALE + delta(s,w)) // sigma(s,w)   (0 at the
                                            deepest level / no succs)
        bc_micro(v) = sum over s != v of delta(s, v)

    Scale shape (distributed path): per-source BFS levels come from
    :func:`multi_source_distances`; each forward round is one
    node-keyed join + one packed-(src,node)-keyed membership join + one
    bucketed sum, each backward round the mirror image — the frontier
    state is |seeds| x reach and never touches the driver. Below
    ``local_edges_gate`` symmetrized edges the identical math runs in
    one pandas process (value-identical; the gate is the same policy as
    ``pagerank``). Returns a Dataset (entity, bc_micro) over visited
    non-source nodes, zeros included.
    """
    import ray.data as rd

    from .relational import compute_n_buckets, shuffle_join

    scale = BETWEENNESS_SCALE
    seed_list = sorted(set(int(s) for s in seeds))

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("u", pa.int64()),
                              ("dst", pa.int64())]).empty_table()
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    adj = edges_ds.map_batches(symmetrize,
                               batch_format="pyarrow").materialize()
    n_adj = adj.count()

    if n_adj <= local_edges_gate:
        apd = adj.to_pandas()
        return rd.from_pandas(
            _brandes_local_vec(apd, seed_list, iters, scale))

    n_parts = max(2, compute_n_buckets(rows_hint or n_adj))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    adj = compact(adj)

    dists = multi_source_distances(
        edges_ds.map_batches(
            lambda t: t.append_column(
                "w", pa.array(np.ones(t.num_rows, np.int64)))
            if "w" not in t.schema.names else t,
            batch_format="pyarrow"),
        seed_list, iters=iters, rows_hint=rows_hint,
        local_edges_gate=0).materialize()

    def pack(df: pd.DataFrame, src: str, node: str) -> pd.Series:
        return (df[src].astype(np.int64).astype(str) + ":"
                + df[node].astype(np.int64).astype(str))

    def lvl_table(r: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["dist"] == r]
            return pd.DataFrame({"pk": pack(df, "src", "entity")})
        return compact(dists.map_batches(fn, batch_format="pandas"))

    def sum_sigma(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["src", "v"], as_index=False)["sigma"].sum()
        return out.astype({"src": np.int64, "v": np.int64,
                           "sigma": np.int64})

    # forward: per-level sigma tables sg[r] = (src, v, sigma)
    sg = [compact(rd.from_pandas(pd.DataFrame({
        "src": pd.Series(seed_list, dtype="int64"),
        "v": pd.Series(seed_list, dtype="int64"),
        "sigma": pd.Series(1, index=range(len(seed_list)),
                           dtype="int64")})))]
    for r in range(1, iters + 1):
        cand = shuffle_join(adj, sg[r - 1], "u", "v",
                            ["dst"], ["sigma", "src"],
                            n_buckets=n_parts)

        def pack_cand(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "pk": pd.Series([], dtype=object),
                    "src": pd.Series([], dtype="int64"),
                    "v": pd.Series([], dtype="int64"),
                    "sigma": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "pk": pack(df, "src", "dst"),
                "src": df["src"].astype(np.int64),
                "v": df["dst"].astype(np.int64),
                "sigma": df["sigma"].astype(np.int64)})

        members = shuffle_join(
            cand.map_batches(pack_cand, batch_format="pandas"),
            lvl_table(r), "pk", "pk", ["src", "v", "sigma"], [],
            how="left_semi", n_buckets=n_parts)
        sg.append(compact(hash_bucket_aggregate(
            members, ["src", "v"], sum_sigma, n_buckets=n_parts)))

    # backward: per-level delta tables dl[l] = (src, v, sigma, delta)
    def with_delta0(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["delta"] = np.int64(0)
        return out

    dl = sg[iters].map_batches(with_delta0, batch_format="pandas")
    acc = []  # (src, v, delta) per level, v != src

    def keep_nonsource(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["v"] != df["src"]]
        return pd.DataFrame({
            "src": df["src"].astype(np.int64),
            "v": df["v"].astype(np.int64),
            "delta": df["delta"].astype(np.int64)})

    acc.append(dl.map_batches(keep_nonsource, batch_format="pandas"))
    for l in range(iters - 1, -1, -1):
        # succs at level l+1 joined onto adjacency by the succ node
        contrib = shuffle_join(adj, dl, "dst", "v", ["u"],
                               ["sigma", "delta", "src"],
                               n_buckets=n_parts)

        def pack_contrib(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "pk": pd.Series([], dtype=object),
                    "sigma_w": pd.Series([], dtype="int64"),
                    "delta_w": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "pk": pack(df, "src", "u"),
                "sigma_w": df["sigma"].astype(np.int64),
                "delta_w": df["delta"].astype(np.int64)})

        def pack_sg(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "pk": pd.Series([], dtype=object),
                    "src": pd.Series([], dtype="int64"),
                    "v": pd.Series([], dtype="int64"),
                    "sigma": pd.Series([], dtype="int64")})
            out = pd.DataFrame({
                "pk": pack(df, "src", "v"),
                "src": df["src"].astype(np.int64),
                "v": df["v"].astype(np.int64),
                "sigma": df["sigma"].astype(np.int64)})
            return out

        sgl_packed = sg[l].map_batches(pack_sg, batch_format="pandas")
        terms = shuffle_join(
            contrib.map_batches(pack_contrib, batch_format="pandas"),
            sgl_packed, "pk", "pk", ["sigma_w", "delta_w"], ["sigma"],
            n_buckets=n_parts)

        def term_val(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "pk": pd.Series([], dtype=object),
                    "delta": pd.Series([], dtype="int64")})
            su = df["sigma"].astype(np.int64).to_numpy()
            sw = df["sigma_w"].astype(np.int64).to_numpy()
            dw = df["delta_w"].astype(np.int64).to_numpy()
            return pd.DataFrame({
                "pk": df["pk"],
                "delta": su * (scale + dw) // sw})

        def sum_delta(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("pk", as_index=False)["delta"].sum()
            out["delta"] = out["delta"].astype(np.int64)
            return out

        sums = hash_bucket_aggregate(
            terms.map_batches(term_val, batch_format="pandas"),
            ["pk"], sum_delta, n_buckets=n_parts)
        merged = shuffle_join(sgl_packed, sums, "pk", "pk",
                              ["src", "v", "sigma"], ["delta"],
                              how="left", n_buckets=n_parts)

        def fill0(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": df["src"].astype(np.int64),
                "v": df["v"].astype(np.int64),
                "sigma": df["sigma"].astype(np.int64),
                "delta": df["delta"].fillna(0).astype(np.int64)})

        dl = compact(merged.map_batches(fill0, batch_format="pandas"))
        acc.append(dl.map_batches(keep_nonsource,
                                  batch_format="pandas"))

    all_deltas = acc[0]
    for d in acc[1:]:
        all_deltas = all_deltas.union(d)

    def sum_bc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["delta"].sum()
        return pd.DataFrame({"entity": out["v"].astype(np.int64),
                             "bc_micro": out["delta"].astype(np.int64)})

    return hash_bucket_aggregate(all_deltas, ["v"], sum_bc,
                                 n_buckets=n_parts)


HITS_SCALE = 10 ** 6


def hits(triples_ds, iters: int = 3, scale: int = HITS_SCALE,
         subj_col="subj", obj_col="obj", rows_hint: int | None = None,
         local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Distributed HITS (hubs & authorities) in integer fixed-point.

    Kleinberg's mutual-reinforcement iteration, L1-normalized each
    half-step with floor division so the distributed result is
    bit-identical to a sequential or SQL (DuckDB ``//`` on HUGEINT)
    replay — the same determinism argument as :func:`pagerank`:

        a_raw(v) = sum_{u->v} h(u)          (edge multiplicity kept)
        a(v)     = (a_raw(v) * scale) // sum_v a_raw(v)
        h_raw(u) = sum_{u->v} a(v)
        h(u)     = (h_raw(u) * scale) // sum_u h_raw(u)

    with h_0(v) = ``scale`` for every node. Overflow bound: after each
    normalize every score is <= ``scale`` (1e6), so a raw score is
    <= indeg * scale and the normalize numerator <= indeg * scale^2 =
    indeg * 1e12 — int64-exact up to in-degree ~9e6 per page; beyond
    that, lower ``scale``. The L1 totals themselves are driver scalars
    (Python ints / DuckDB HUGEINT), never a precision risk.

    Scale shape: the edge table is built once; each half-step is one
    bucketed hash join (scores onto edges by endpoint) + one bucketed
    sum + one O(1) global-sum scalar + one row-local normalize map —
    score tables are never collected to the driver, and block counts
    are compacted per round like :func:`connected_components`.

    Reference scope note: thunlp/OpenNRE stops at the triple table;
    hub/authority structure over the extracted link graph is part of
    this engine's downstream web-graph extension set.
    """
    from .relational import compute_n_buckets, shuffle_join

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def edge_frame(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return edge_schema.empty_table()

        def arr(name):
            c = batch.column(name)
            return (c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c).cast(pa.string())
        return pa.table({"src": arr(subj_col), "dst": arr(obj_col)})

    edges = triples_ds.map_batches(edge_frame,
                                   batch_format="pyarrow").materialize()
    n_edges = edges.count()

    # size gate (same policy + bit-parity argument as pagerank's): the
    # L1 totals are exact scalars in both paths, every other step is
    # order-independent int64 adds + exact floor division
    if n_edges <= local_edges_gate:
        import ray.data as rd
        epd = edges.to_pandas()
        if not len(epd):
            return rd.from_pandas(pd.DataFrame(
                {"entity": pd.Series([], dtype=str),
                 "hub_micro": pd.Series([], dtype="int64"),
                 "auth_micro": pd.Series([], dtype="int64")}))
        src = epd["src"].to_numpy()
        dst = epd["dst"].to_numpy()
        ents, inv = np.unique(np.concatenate([src, dst]),
                              return_inverse=True)
        si, di = inv[:len(src)], inv[len(src):]
        h = np.full(len(ents), scale, dtype=np.int64)
        a = np.zeros(len(ents), dtype=np.int64)

        def local_half(scores, from_i, to_i):
            raw = np.zeros(len(ents), dtype=np.int64)
            np.add.at(raw, to_i, scores[from_i])
            total = int(raw.sum())
            return (raw * scale) // total if total else raw

        for _ in range(iters):
            a = local_half(h, si, di)
            h = local_half(a, di, si)
        return rd.from_pandas(pd.DataFrame(
            {"entity": ents.astype(str),
             "hub_micro": h.astype(np.int64),
             "auth_micro": a.astype(np.int64)}))

    n_parts = max(2, compute_n_buckets(rows_hint or n_edges))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    edges = compact(edges)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"entity": pa.concat_arrays(
            [t.column("src").combine_chunks(),
             t.column("dst").combine_chunks()])})

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("entity")

    nodes = compact(hash_bucket_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["entity"], distinct_bucket, n_buckets=n_parts))
    empty_out = pd.DataFrame({"entity": pd.Series([], dtype=str),
                              "hub_micro": pd.Series([], dtype="int64"),
                              "auth_micro": pd.Series([], dtype="int64")})
    if nodes.count() == 0:
        import ray.data as rd
        return rd.from_pandas(empty_out)

    score_schema = pa.schema([("entity", pa.string()),
                              ("score", pa.int64())])

    def conform(ds):
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return score_schema.empty_table()
            return t.select(score_schema.names).cast(score_schema)
        return ds.map_batches(fix, batch_format="pyarrow")

    def const_scores(value: int):
        return conform(nodes.map_batches(
            lambda t, v=value: pa.table({
                "entity": t.column("entity"),
                "score": pa.array(np.full(t.num_rows, v, dtype=np.int64))})
            if t.num_rows else score_schema.empty_table(),
            batch_format="pyarrow"))

    zero_rows = const_scores(0)

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity", as_index=False)["score"].sum()
        out["score"] = out["score"].astype("int64")
        return out

    def half_step(scores, join_key: str, emit_key: str):
        """One mutual-reinforcement half-step: push scores across edges
        (joined on ``join_key``), sum at ``emit_key``, L1-normalize."""
        joined = shuffle_join(edges, scores, join_key, "entity",
                              [emit_key], ["score"], n_buckets=n_parts)

        def emit(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"entity": pd.Series([], dtype=str),
                     "score": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "entity": df[emit_key].astype(str).to_numpy(),
                "score": df["score"].to_numpy(dtype=np.int64)})

        raw = compact(conform(hash_bucket_aggregate(
            joined.map_batches(emit, batch_format="pandas").union(zero_rows),
            ["entity"], sum_bucket, n_buckets=n_parts)))
        total = int(raw.sum("score") or 0)
        if total == 0:
            return raw  # isolated graph half: all-zero scores stay zero

        def normalize(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return score_schema.empty_table()
            s = t.column("score").to_numpy(zero_copy_only=False)
            return pa.table({"entity": t.column("entity"),
                             "score": pa.array(
                                 (s * scale) // total, type=pa.int64())})

        return conform(raw.map_batches(normalize, batch_format="pyarrow"))

    hubs = const_scores(scale)
    auths = zero_rows
    for _ in range(iters):
        auths = half_step(hubs, "src", "dst")      # a(v) <- sum h over in
        hubs = half_step(auths, "dst", "src")      # h(u) <- sum a over out

    def rename(ds, col):
        return ds.map_batches(
            lambda t, c=col: t.rename_columns(["entity", c]),
            batch_format="pyarrow")

    out = shuffle_join(rename(hubs, "hub_micro"), rename(auths, "auth_micro"),
                       "entity", "entity", ["hub_micro"], ["auth_micro"],
                       n_buckets=n_parts)
    out_schema = pa.schema([("entity", pa.string()),
                            ("hub_micro", pa.int64()),
                            ("auth_micro", pa.int64())])
    return out.map_batches(
        lambda t: (t.select(out_schema.names).cast(out_schema)
                   if t.num_rows else out_schema.empty_table()),
        batch_format="pyarrow")



def build_copurchase_edges(lineitem_ds, *, order_col: str = "l_orderkey",
                           part_col: str = "l_partkey",
                           rows_hint: int | None = None,
                           distinct: bool = True):
    """Distinct undirected co-purchase edges (a < b): parts appearing in
    the same order. Per-order pair expansion runs inside the order's
    hash bucket (an order with k parts emits k(k-1)/2 pairs — TPC-H
    orders hold <= 7 lineitems; a pathological mega-key would need the
    same salt/cap treatment as skew_join's hot keys), then one bucketed
    distinct on (a, b). ``distinct=False`` skips that second shuffle and
    returns the raw pair stream (one row per sharing order) for
    consumers that dedupe in their own keyed pass (``adamic_adar``)."""
    from .relational import hash_bucket_aggregate

    def op_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # block-local distinct, vectorized (the Python set(zip(...)) form
        # measured ~4 s alone at sf0.1; drop_duplicates is C-speed)
        out = df.drop_duplicates().rename(
            columns={order_col: "o", part_col: "p"})
        return out.astype({"o": np.int64, "p": np.int64})

    def expand_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-order pair expansion: self-merge on the order
        # key with a<b orientation (baskets are tiny; a mega-basket
        # would need the salt/cap treatment noted above)
        gd = g.drop_duplicates(["o", "p"])
        m = gd.merge(gd, on="o")
        m = m[m["p_x"] < m["p_y"]]
        return pd.DataFrame({"a": m["p_x"].to_numpy(np.int64),
                             "b": m["p_y"].to_numpy(np.int64)})

    pairs = hash_bucket_aggregate(
        lineitem_ds.map_batches(op_pairs, batch_format="pandas"),
        ["o"], expand_bucket, rows_hint=rows_hint)
    if not distinct:
        return pairs

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    return hash_bucket_aggregate(pairs, ["a", "b"], distinct_bucket,
                                 rows_hint=rows_hint)


def triangle_count(edges_ds, *, rows_hint: int | None = None):
    """Exact global triangle count over a distinct a<b edge Dataset.

    Plan (the fused-marker shape shared with ``adamic_adar``, which
    measured ~2x faster than the two-join wedge-close formulation at
    49M wedges): symmetrize to (middle, neighbor) adjacency, bucket by
    middle, and per middle v emit the ORIENTED wedge pairs
    lo x hi (lo < v < hi) — each triangle is generated exactly once via
    its middle-valued vertex — map-side combined per bucket; then the
    edge set rides the SAME (a, b) exchange as marker rows and each
    bucket reports two scalar partials (wedges seen, wedges closed by an
    edge). Nothing reaches the driver but bucket-count rows. Returns one
    row: (n_wedges, n_triangles).

    Partitioning assumption: emission volume is sum over middles of
    |lo|*|hi| <= C(deg, 2); a power-law hub needs hub-salting upstream
    (documented, same story as skew_join / adamic_adar).
    """
    import pyarrow as pa

    from .relational import hash_bucket_aggregate

    edges = edges_ds.materialize()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch.column("a"), batch.column("b")
        return pa.concat_tables([pa.table({"v": a, "n": b}),
                                 pa.table({"v": b, "n": a})])

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")

    def expand_middle(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for v, grp in g.groupby("v", sort=False):
            nb = np.unique(grp["n"].to_numpy(dtype=np.int64))
            lo = nb[nb < v]
            hi = nb[nb > v]
            if not len(lo) or not len(hi):
                continue
            frames.append(pd.DataFrame({
                "a": np.repeat(lo, len(hi)),
                "b": np.tile(hi, len(lo)),
                "cn": np.int64(1)}))
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "cn")})
        return (pd.concat(frames, ignore_index=True)
                .groupby(["a", "b"], as_index=False, sort=False)
                .agg(cn=("cn", "sum")))

    wedges = hash_bucket_aggregate(adj, ["v"], expand_middle,
                                   rows_hint=rows_hint)

    def mark_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64),
                             "cn": np.int64(0), "is_edge": np.int64(1)})

    def with_flag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["is_edge"] = np.int64(0)
        return batch

    tagged = (wedges.map_batches(with_flag, batch_format="pandas")
              .union(edges.map_batches(mark_edges, batch_format="pandas")))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["a", "b"], as_index=False, sort=False).agg(
            cn=("cn", "sum"), is_edge=("is_edge", "max"))
        return pd.DataFrame({
            "n_wedges": [np.int64(per["cn"].sum())],
            "n_triangles": [np.int64(per.loc[per["is_edge"] == 1,
                                             "cn"].sum())]})

    parts = hash_bucket_aggregate(tagged, ["a", "b"], count_bucket,
                                  rows_hint=rows_hint).to_pandas()
    return pd.DataFrame({
        "n_wedges": pd.Series([parts["n_wedges"].sum()], dtype=np.int64),
        "n_triangles": pd.Series([parts["n_triangles"].sum()],
                                 dtype=np.int64)})


#: fixed-point scale for Adamic-Adar middle-vertex weights (1/ln(deg))
AA_SCALE = 1_000_000


def adamic_adar(edges_ds, k: int = 50, *, rows_hint: int | None = None):
    """Adamic-Adar link prediction over an a<b pair Dataset (parallel
    duplicate pairs are ALLOWED and collapse in-bucket — degrees count
    DISTINCT neighbors — so callers can skip a whole distinct shuffle
    upstream; see ``build_copurchase_edges(distinct=False)``):
    score(u, w) = sum over common neighbors b of 1/ln(deg(b)), ranked for
    NON-adjacent pairs only (KG-completion companion to the TransE path —
    the classic structural baseline, Adamic & Adar 2003).

    Plan: symmetrize edges to (middle, neighbor) adjacency and bucket by
    the middle vertex — the bucket holds each middle's FULL neighbor set,
    so its degree, its fixed-point weight floor(AA_SCALE/ln(deg) + 0.5),
    and all C(deg, 2) neighbor-pair emissions happen in one co-located
    pass (degree-1 middles generate no wedge and are skipped; ln(1)=0
    never divides). One more bucketed aggregate sums integer weights per
    candidate pair (exact — no float-order drift), an anti-join drops
    pairs that are already edges, and a global sort takes the top k with
    a deterministic (score desc, a, b) tiebreak.

    Partitioning assumption: emission volume is sum(deg²), the same
    wedge-join bound as ``triangle_count`` — pair emissions are
    numpy-vectorized (cached triu index templates) and map-side combined
    per middle bucket before the pair exchange, but the bound itself is
    quadratic in degree: dense graphs need a deterministic vertex sample
    or a degree cap UPSTREAM (see ``graph_link_prediction_parts``), and
    a power-law hub needs hub-salting (split the hub's neighbor list,
    merge partial pair weights) before this pass.
    """
    import pyarrow as pa

    from .relational import hash_bucket_aggregate

    edges = edges_ds.materialize()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch.column("a"), batch.column("b")
        return pa.concat_tables([pa.table({"v": a, "n": b}),
                                 pa.table({"v": b, "n": a})])

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")

    triu_cache: dict = {}

    def expand_middle(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in g.groupby("v", sort=False):
            # unique = sorted + dedup: degree counts DISTINCT neighbors
            nb = np.unique(grp["n"].to_numpy(dtype=np.int64))
            d = nb.size
            if d < 2:
                continue
            wt = np.int64(math.floor(AA_SCALE / math.log(d) + 0.5))
            if d not in triu_cache:
                triu_cache[d] = np.triu_indices(d, 1)
            iu, ju = triu_cache[d]
            frames.append(pd.DataFrame({"a": nb[iu], "b": nb[ju],
                                        "wt": wt, "cn": np.int64(1)}))
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "wt", "cn")})
        # map-side combine: pairs sharing two middles in this bucket merge
        # before the pair exchange
        return (pd.concat(frames, ignore_index=True)
                .groupby(["a", "b"], as_index=False, sort=False)
                .agg(wt=("wt", "sum"), cn=("cn", "sum")))

    wedges = hash_bucket_aggregate(adj, ["v"], expand_middle,
                                   rows_hint=rows_hint)

    # the pair aggregation and the adjacent-pair drop share the (a, b)
    # key, so they fuse into ONE bucketed pass: edge rows ride the same
    # exchange as zero-weight markers and kill their pair in-bucket
    def mark_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64),
                             "wt": np.int64(0), "cn": np.int64(0),
                             "is_edge": np.int64(1)})

    def with_flag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["is_edge"] = np.int64(0)
        return batch

    tagged = (wedges.map_batches(with_flag, batch_format="pandas")
              .union(edges.map_batches(mark_edges, batch_format="pandas")))

    def sum_and_drop(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], sort=False)
               .agg(aa_fp=("wt", "sum"), common_neighbors=("cn", "sum"),
                    is_edge=("is_edge", "max"))
               .reset_index())
        out = out[out["is_edge"] == 0].drop(columns="is_edge")
        return out.astype({"aa_fp": np.int64,
                           "common_neighbors": np.int64})

    scored = hash_bucket_aggregate(tagged, ["a", "b"], sum_and_drop,
                                   rows_hint=rows_hint)

    # the global top-k is a subset of the union of per-block top-ks, so
    # prune before the sort barrier: the exchange moves k rows per block
    # instead of every scored pair
    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["aa_fp", "a", "b"],
                             ascending=[False, True, True]).head(k)

    return (scored.map_batches(local_topk, batch_format="pandas")
            .sort(["aa_fp", "a", "b"], descending=[True, False, False])
            .limit(k))


def square_census(edges_ds, k: int = 50, *, rows_hint: int | None = None):
    """Per-vertex 4-cycle (square) participation over an a<b edge
    Dataset — the bipartite-ish cohesion signal triangles miss (two
    parts never bought together but sharing two co-purchase partners
    close a square). Every 4-cycle u-v-w-x has exactly one diagonal
    through each vertex, so squares(u) = Σ_w C(cn(u, w), 2) where cn
    counts DISTINCT common neighbors of the (ordered-free) diagonal
    pair — each square counted once per diagonal endpoint, i.e. once
    per vertex, and the global total is Σ_pairs C(cn, 2) / 2.

    Plan (the adamic_adar wedge shape): symmetrize to (middle,
    neighbor) adjacency, bucket by middle, emit each middle's oriented
    neighbor pairs with cn = 1 map-side combined; one bucketed (a, b)
    aggregate folds cn, converts to C(cn, 2) and explodes the pair to
    its two diagonal-endpoint partials IN-BUCKET; a final bucketed
    vertex sum + per-block top-k prune feeds the k-row global sort.
    All counts are exact integers. Parallel duplicate pairs are
    allowed upstream (neighbor sets are uniqued per middle bucket), so
    callers can skip the distinct exchange.

    Partitioning assumption: wedge emission is sum(deg²) — same bound
    and same upstream vertex-sample / hub-salt contract as
    ``adamic_adar`` / ``triangle_count``.
    """
    import pyarrow as pa

    from .relational import hash_bucket_aggregate

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch.column("a"), batch.column("b")
        return pa.concat_tables([pa.table({"v": a, "n": b}),
                                 pa.table({"v": b, "n": a})])

    adj = edges_ds.map_batches(symmetrize, batch_format="pyarrow")

    triu_cache: dict = {}

    def expand_middle(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in g.groupby("v", sort=False):
            nb = np.unique(grp["n"].to_numpy(dtype=np.int64))
            d = nb.size
            if d < 2:
                continue
            if d not in triu_cache:
                triu_cache[d] = np.triu_indices(d, 1)
            iu, ju = triu_cache[d]
            frames.append(pd.DataFrame({"a": nb[iu], "b": nb[ju],
                                        "cn": np.int64(1)}))
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "cn")})
        return (pd.concat(frames, ignore_index=True)
                .groupby(["a", "b"], as_index=False, sort=False)
                .agg(cn=("cn", "sum")))

    wedges = hash_bucket_aggregate(adj, ["v"], expand_middle,
                                   rows_hint=rows_hint)

    def diag_partials(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["a", "b"], as_index=False, sort=False) \
            .agg(cn=("cn", "sum"))
        cn = per["cn"].to_numpy(np.int64)
        sq = cn * (cn - 1) // 2
        keep = sq > 0
        out = pd.DataFrame({
            "entity": np.concatenate([per["a"].to_numpy(np.int64)[keep],
                                      per["b"].to_numpy(np.int64)[keep]]),
            "squares": np.concatenate([sq[keep], sq[keep]])})
        # map-side combine before the vertex exchange
        return out.groupby("entity", as_index=False, sort=False) \
            .agg(squares=("squares", "sum"))

    node_parts = hash_bucket_aggregate(wedges, ["a", "b"], diag_partials,
                                       rows_hint=rows_hint)

    def sum_vertex(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity", as_index=False, sort=False) \
            .agg(squares=("squares", "sum"))
        return out.astype({"entity": np.int64, "squares": np.int64})

    summed = hash_bucket_aggregate(node_parts, ["entity"], sum_vertex,
                                   rows_hint=rows_hint)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["squares", "entity"],
                             ascending=[False, True]).head(k)

    return (summed.map_batches(local_topk, batch_format="pandas")
            .sort(["squares", "entity"], descending=[True, False])
            .limit(k))


def negative_samples(edges_ds, k: int = 2, *, salt: str = "",
                     broadcast_limit: int = 2_000_000,
                     rows_hint: int | None = None):
    """Distant-supervision negative sampling: for each true triple
    (subj, pred, obj), deterministically corrupt the tail ``k`` times —
    candidate i is ``entities[md5(salt|subj|pred|i) % n_entities]`` over
    the SORTED distinct-object vocabulary — and drop corruptions that
    collide with ANY true (subj, pred, obj) triple. The standard
    closed-world negative generator for KG/RE training (Mintz et al.
    2009 distant supervision; reference contrast:
    /root/reference/opennre/framework/data_loader.py consumes
    pre-labelled NA pairs — generating them at scale is the pipeline's
    job).

    Scale shape: the vocabulary is a DISTRIBUTED distinct (map-side
    unique partials + one bucketed pass) on both paths — raw edge rows
    never reach the driver. While vocabulary and triple counts fit
    ``broadcast_limit``, the sorted vocabulary and exact truth set
    broadcast once (``ray.put``) and generation is a stateless flat-map
    with zero shuffle. Beyond the limit the SAME draws run fully
    distributed and stay EXACT: ``global_rank`` numbers the sorted
    vocabulary, each edge expands to k (subj, pred, rank) draws, one
    bucketed ``shuffle_join`` resolves rank → entity, and the
    truth-collision drop is the Bloom-prefiltered exact ``anti_join``
    (the decontaminate-style filter gates the shuffle; a residual exact
    pass resolves Bloom false positives, so both paths emit identical
    rows).

    Deterministic and SQL-replayable: the md5 draw is the shared hash
    family, the modulo indexes a DuckDB ``list(DISTINCT obj ORDER BY
    obj)`` literal identically. Returns (subj, pred, neg_obj, draw_idx).
    """
    import hashlib

    import pyarrow.compute as pc

    import ray

    from .relational import (anti_join, global_rank, hash_bucket_aggregate,
                             shuffle_join)

    edges_mat = edges_ds.materialize()

    def obj_partial(b: pa.Table) -> pa.Table:
        return pa.table({"obj": pc.unique(b.column("obj"))})

    vocab = hash_bucket_aggregate(
        edges_mat.map_batches(obj_partial, batch_format="pyarrow"),
        ["obj"], lambda g: g.drop_duplicates(["obj"]),
        rows_hint=rows_hint).materialize()
    n_ent = vocab.count()
    n_true = edges_mat.count()

    def md5_idx(s: str, p: str, i: int) -> int:
        h = int.from_bytes(hashlib.md5(
            f"{salt}{s}|{p}|{i}".encode()).digest()[:8], "big")
        return h % n_ent

    if n_ent <= broadcast_limit and n_true <= broadcast_limit:
        # broadcast path: sorted vocab + exact truth set ship once,
        # generation is a zero-shuffle flat-map
        ents = sorted(v for b in vocab.iter_batches(batch_format="pyarrow")
                      for v in b.column("obj").to_pylist())
        true_keys = set()
        for b in edges_mat.iter_batches(batch_format="pyarrow"):
            true_keys.update(zip(b.column("subj").to_pylist(),
                                 b.column("pred").to_pylist(),
                                 b.column("obj").to_pylist()))
        ref = ray.put((ents, true_keys))
        ref_key = ref.hex()

        def gen(batch: pa.Table) -> pa.Table:
            from ..stages.score import cached

            ents_l, truth = cached(("negsamp", ref_key),
                                   lambda: ray.get(ref))
            subj, pred, neg, idx = [], [], [], []
            for s, p in zip(batch.column("subj").to_pylist(),
                            batch.column("pred").to_pylist()):
                for i in range(k):
                    cand = ents_l[md5_idx(s, p, i)]
                    if (s, p, cand) in truth:
                        continue
                    subj.append(s)
                    pred.append(p)
                    neg.append(cand)
                    idx.append(i)
            return pa.table({"subj": pa.array(subj, pa.string()),
                             "pred": pa.array(pred, pa.string()),
                             "neg_obj": pa.array(neg, pa.string()),
                             "draw_idx": pa.array(idx, pa.int64())})

        return edges_mat.map_batches(gen, batch_format="pyarrow")

    # distributed path: rank the vocabulary, join draws to it, and drop
    # truth collisions with the exact Bloom-gated anti-join — no
    # entity/triple set ever materializes on the driver
    ranked = global_rank(vocab, ["obj"], out_col="_vrank")

    def draws(batch: pa.Table) -> pa.Table:
        subj, pred, di, rk = [], [], [], []
        for s, p in zip(batch.column("subj").to_pylist(),
                        batch.column("pred").to_pylist()):
            for i in range(k):
                subj.append(s)
                pred.append(p)
                di.append(i)
                rk.append(md5_idx(s, p, i) + 1)   # global_rank is 1-based
        return pa.table({"subj": pa.array(subj, pa.string()),
                         "pred": pa.array(pred, pa.string()),
                         "draw_idx": pa.array(di, pa.int64()),
                         "_vrank": pa.array(rk, pa.int64())})

    cand = shuffle_join(
        edges_mat.map_batches(draws, batch_format="pyarrow"),
        ranked, "_vrank", "_vrank", ["subj", "pred", "draw_idx"], ["obj"],
        rows_hint=rows_hint)

    def add_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("subj"), pa.string()),
            pc.cast(batch.column("pred"), pa.string()),
            pc.cast(batch.column("obj"), pa.string()), "\x1f")
        return batch.append_column("_key", key)

    truth_keys = edges_mat.map_batches(
        lambda b: add_key(b).select(["_key"]), batch_format="pyarrow")
    kept = anti_join(
        cand.map_batches(add_key, batch_format="pyarrow"), truth_keys,
        "_key", ["subj", "pred", "obj", "draw_idx"],
        broadcast_limit=broadcast_limit, rows_hint=rows_hint)

    def finalize(batch: pa.Table) -> pa.Table:
        # the tagged-union join may widen draw_idx to float — cast back
        return pa.table({
            "subj": pc.cast(batch.column("subj"), pa.string()),
            "pred": pc.cast(batch.column("pred"), pa.string()),
            "neg_obj": pc.cast(batch.column("obj"), pa.string()),
            "draw_idx": pc.cast(batch.column("draw_idx"), pa.int64())})

    return kept.map_batches(finalize, batch_format="pyarrow")


def k_core(edges_ds, k: int, *, max_iters: int = 64,
           rows_hint: int | None = None):
    """k-core decomposition by iterative peeling: repeatedly delete every
    vertex of degree < k until none remains; the survivors form the
    (unique, order-independent) maximal subgraph with min degree >= k.

    Input: distinct undirected ``(a, b)`` edges. Output: one row per
    core vertex, ``(v, core_deg)``.

    Scale shape — each round costs two linear passes, never all-pairs:
    (1) one bucketed degree aggregate over the exploded endpoints
    (``hash_bucket_aggregate``), (2) victim vertices (deg < k) removed
    from the edge list via the size-gated ``anti_join`` on each endpoint
    — after the first round the victim set is typically tiny, so the
    broadcast/Bloom path applies; an adversarial round falls back to the
    bucketed shuffle automatically. Block counts are compacted per round
    (same measured 6x-blocks-per-round story as connected_components).
    Round count is the peeling depth (O(degeneracy) in the worst case);
    bounded by ``max_iters`` — raises if not converged so the capped SQL
    oracle can unroll the SAME bound and stay exact.
    """
    from .relational import (ANTI_JOIN_BROADCAST_LIMIT, anti_join,
                             compute_n_buckets)

    n_parts = max(2, compute_n_buckets(rows_hint))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([
            t.column("a").combine_chunks().cast(pa.int64()),
            t.column("b").combine_chunks().cast(pa.int64())])
        return pa.table({"v": v})

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False).size()
        return out.rename(columns={"size": "core_deg"})

    def conform(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or "v" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "core_deg": pa.array([], pa.int64())})
        return pa.table({"v": pc.cast(t.column("v"), pa.int64()),
                         "core_deg": pc.cast(t.column("core_deg"),
                                             pa.int64())})

    edges = compact(edges_ds)
    for _ in range(max_iters):
        deg = hash_bucket_aggregate(
            edges.map_batches(endpoints, batch_format="pyarrow"),
            ["v"], deg_bucket, rows_hint=rows_hint)
        deg = compact(deg.map_batches(conform, batch_format="pyarrow"))
        bad = compact(deg.map_batches(
            lambda t: t.filter(pa.compute.less(t.column("core_deg"), k)),
            batch_format="pyarrow"))
        n_bad = bad.count()
        if n_bad == 0:
            if deg.count() == 0:    # peeled to nothing: typed empty core
                import ray as _ray
                return _ray.data.from_arrow(pa.table({
                    "v": pa.array([], pa.int64()),
                    "core_deg": pa.array([], pa.int64())}))
            return deg
        if n_bad <= ANTI_JOIN_BROADCAST_LIMIT:
            # the victim set is ALREADY distinct (one row per vertex from
            # the degree aggregate): broadcast it once and drop edges on
            # BOTH endpoints in a single fused pass — the two generic
            # anti_joins would each pay a redundant dedup shuffle
            import ray as _ray
            import pyarrow.compute as pc
            ref = _ray.put(bad.to_pandas()["v"].to_numpy(np.int64))

            def drop_bad(t: pa.Table, _ref=ref) -> pa.Table:
                vs = pa.array(_ray.get(_ref))
                keep = pc.and_(
                    pc.invert(pc.is_in(t.column("a"), value_set=vs)),
                    pc.invert(pc.is_in(t.column("b"), value_set=vs)))
                return t.filter(keep)

            edges = edges.map_batches(drop_bad, batch_format="pyarrow")
        else:
            edges = anti_join(
                edges, bad.select_columns(["v"]).rename_columns(
                    {"v": "a"}), "a", ["b"], rows_hint=rows_hint)
            edges = anti_join(
                edges, bad.select_columns(["v"]).rename_columns(
                    {"v": "b"}), "b", ["a"], rows_hint=rows_hint)
        edges = compact(edges.map_batches(
            lambda t: (pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
                       if t.num_rows == 0 or "a" not in t.column_names
                       else pa.table({
                           "a": t.column("a").cast(pa.int64()),
                           "b": t.column("b").cast(pa.int64())})),
            batch_format="pyarrow"))
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def assortativity(edges_ds, *, rows_hint: int | None = None):
    """Degree assortativity coefficient (Newman 2002, Phys. Rev. Lett.
    89:208701): the Pearson correlation of endpoint degrees over every
    directed adjacency row. r > 0 means hubs attach to hubs (social
    graphs); r < 0 means hubs attach to leaves (web / biological
    graphs) — the one-number structural fingerprint a KG build reports
    next to degree_stats.

    Every moment except the cross term is VERTEX-LOCAL in the degree
    table: over directed rows, sum(d_u) = sum_v d_v^2 and
    sum(d_u^2) = sum_v d_v^3, so the only joined quantity is
    sum(d_u * d_v) = sum_v d_v * s_v with s_v = sum of v's neighbor
    degrees. Plan: one bucketed degree aggregate, one bucketed
    deg-onto-adjacency join + neighbor-sum aggregate, one bucketed
    (d, s) join, then scalar partials fold on the driver. r is one
    float division of two exact integers (numerator / denominator of
    the symmetric Pearson form), rounded half-away-from-zero to 12
    decimals — bit-identical to the SQL oracle's HUGEINT replay.

    Integer-exactness bound: the int64 partials hold while hub degree
    stays under ~2M (d^3 < 2^63); beyond that the moments need the
    same fixed-point widening as pagerank's accumulators.

    Input: distinct undirected ``(a, b)`` edges. Output: one row
    ``(n_vertices, n_edges, assortativity)``.
    """
    from .relational import shuffle_join
    from .sqlcompat import sql_round

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})

    adj = edges_ds.map_batches(symmetrize, batch_format="pyarrow")

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("u", as_index=False).size()
        return pd.DataFrame({"v": out["u"].to_numpy(np.int64),
                             "d": out["size"].to_numpy(np.int64)})

    # d_v = count of v's adjacency rows keyed by the FIRST slot; both
    # orientations are present, so this is the full undirected degree
    deg = hash_bucket_aggregate(adj, ["u"], deg_bucket,
                                rows_hint=rows_hint).materialize()

    # s_v = sum of neighbor degrees: ship d_u onto each (u, v) row,
    # then one bucketed sum keyed by v
    joined = shuffle_join(adj, deg, "u", "v", ["v"], ["d"],
                          rows_hint=rows_hint)

    def nsum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["d"].sum()
        return pd.DataFrame({"v": out["v"].to_numpy(np.int64),
                             "s": out["d"].to_numpy(np.int64)})

    nsum = hash_bucket_aggregate(joined, ["v"], nsum_bucket,
                                 rows_hint=rows_hint)
    both = shuffle_join(deg, nsum, "v", "v", ["d"], ["s"],
                        rows_hint=rows_hint)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g["d"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_vertices": [np.int64(len(g))],
            "n": [int((d).sum())],
            "sx": [int((d * d).sum())],
            "sxx": [int((d * d * d).sum())],
            "sxy": [int((d * s).sum())]})

    parts = both.map_batches(partial, batch_format="pandas").to_pandas()
    n_vertices = int(parts["n_vertices"].sum())
    n = int(parts["n"].sum())            # directed rows = 2|E|
    sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sxy = int(parts["sxy"].sum())
    num = n * sxy - sx * sx              # exact Python ints
    den = n * sxx - sx * sx
    r = float(sql_round(float(num) / float(den), 12)) if den else 0.0
    return pd.DataFrame({"n_vertices": pd.Series([n_vertices], dtype="int64"),
                         "n_edges": pd.Series([n // 2], dtype="int64"),
                         "assortativity": pd.Series([r], dtype="float64")})


def local_clustering(edges_ds, *, rows_hint: int | None = None):
    """Per-vertex local clustering coefficient (Watts-Strogatz 1998):
    lcc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1)) — the per-entity
    "how clique-like is this neighborhood" profile a KG build reports
    next to degree_stats; the global triangle census
    (``triangle_count``) says nothing about WHICH hubs sit in dense
    neighborhoods vs star centers.

    Plan (same middle-oriented wedge exchange as ``triangle_count``):
    symmetrize to (v, n) adjacency; per middle bucket emit wedge rows
    (lo, hi, v) with lo < v < hi — each triangle is generated exactly
    once, via its median-valued vertex; ride the edge set down the SAME
    (a, b) exchange as marker rows; in each (a, b) bucket, every wedge
    whose endpoints are an edge is a triangle crediting all THREE
    corners (+1 to lo, hi, and the carried middle) — credits partial-sum
    per bucket; one more bucketed sum per vertex, then a left join onto
    the degree table (vertices in no triangle keep tri = 0). lcc is one
    division of exact integers, 12-dp rounded, bit-matching the SQL
    replay.

    Partitioning assumption: wedge volume is sum over middles of
    |lo|x|hi| <= C(deg, 2) — the triangle_count bound; unlike there,
    wedge rows carry the middle so they cannot map-side combine, making
    this ~1 row per wedge on the wire (a power-law hub needs the same
    upstream degree cap / vertex sample as ``adamic_adar``).

    Input: distinct undirected ``(a, b)`` edges. Output one row per
    vertex: ``(entity, degree, triangles, lcc)``.
    """
    from .relational import shuffle_join
    from .sqlcompat import sql_round

    edges = edges_ds.materialize()

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch.column("a"), batch.column("b")
        return pa.concat_tables([pa.table({"v": a, "n": b}),
                                 pa.table({"v": b, "n": a})])

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["n"].nunique()
        return pd.DataFrame({"entity": out["v"].to_numpy(np.int64),
                             "degree": out["n"].to_numpy(np.int64)})

    deg = hash_bucket_aggregate(adj, ["v"], deg_bucket,
                                rows_hint=rows_hint)

    def expand_middle(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for v, grp in g.groupby("v", sort=False):
            nb = np.unique(grp["n"].to_numpy(dtype=np.int64))
            lo = nb[nb < v]
            hi = nb[nb > v]
            if not len(lo) or not len(hi):
                continue
            frames.append(pd.DataFrame({
                "a": np.repeat(lo, len(hi)),
                "b": np.tile(hi, len(lo)),
                "v": np.int64(v)}))
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "v")})
        return pd.concat(frames, ignore_index=True)

    wedges = hash_bucket_aggregate(adj, ["v"], expand_middle,
                                   rows_hint=rows_hint)

    def mark_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64),
                             "v": np.int64(-1)})

    tagged = wedges.union(edges.map_batches(mark_edges,
                                            batch_format="pandas"))

    def credit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["v"].to_numpy(np.int64) == -1
        epairs = g.loc[is_edge, ["a", "b"]]
        w = g[~is_edge].merge(epairs, on=["a", "b"])
        if not len(w):
            return pd.DataFrame({"entity": pd.Series(dtype=np.int64),
                                 "tri": pd.Series(dtype=np.int64)})
        vtx = np.concatenate([w["a"].to_numpy(np.int64),
                              w["b"].to_numpy(np.int64),
                              w["v"].to_numpy(np.int64)])
        u, c = np.unique(vtx, return_counts=True)
        return pd.DataFrame({"entity": u, "tri": c.astype(np.int64)})

    credits = hash_bucket_aggregate(tagged, ["a", "b"], credit_bucket,
                                    rows_hint=rows_hint)

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity", as_index=False)["tri"].sum()
        return out.astype({"entity": np.int64, "tri": np.int64})

    tri = hash_bucket_aggregate(credits, ["entity"], sum_bucket,
                                rows_hint=rows_hint)
    joined = shuffle_join(deg, tri, "entity", "entity",
                          ["degree"], ["tri"], how="left",
                          rows_hint=rows_hint)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["degree"].to_numpy(np.float64).astype(np.int64)
        t = np.nan_to_num(df["tri"].to_numpy(np.float64)).astype(np.int64)
        denom = d * (d - 1)
        lcc = np.where(denom > 0,
                       sql_round(2.0 * t / np.maximum(denom, 1), 12), 0.0)
        return pd.DataFrame({"entity": df["entity"].to_numpy(np.int64),
                             "degree": d, "triangles": t,
                             "lcc": lcc.astype(np.float64)})

    return joined.map_batches(finish, batch_format="pandas")


WL_LOCAL_EDGES = 200_000


def wl_refinement(edges_ds, rounds: int = 3, *,
                  a_col: str = "a", b_col: str = "b",
                  rows_hint: int | None = None,
                  local_edges_gate: int = WL_LOCAL_EDGES):
    """Weisfeiler-Lehman color refinement (1-WL) over an undirected
    edge list — per-node structural-role signatures: two nodes share a
    final color iff 1-WL cannot distinguish their neighborhoods, the
    canonical cheap test for structurally equivalent entities (role
    discovery, graph-isomorphism screening, WL-kernel features).

        lab_0(v) = degree(v) (as a string)
        lab_r(v) = md5_16(lab_{r-1}(v) || '|' ||
                          join(sorted multiset of neighbor labels, ','))

    md5_16 = first 16 hex chars, so any md5-capable engine replays the
    colors exactly (labels are ASCII strings; the neighbor sort is
    byte-wise in both engines). Returns (node, color) after ``rounds``.

    Scale shape: each round is ONE bucketed hash join (labels onto the
    symmetrized edges by source) + ONE node-bucketed aggregate (sorted
    string_agg + hash) with per-round block compaction — the same
    round structure as :func:`pagerank`. Below ``local_edges_gate``
    edges the whole refinement replays locally (string concatenation
    per node is exact and order-fixed, so both paths are
    value-identical by construction).
    """
    import hashlib

    import ray.data as rd

    from .relational import compute_n_buckets, shuffle_join

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        a = t.column(a_col).combine_chunks().cast(pa.int64())
        b = t.column(b_col).combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    edges = edges_ds.map_batches(sym, batch_format="pyarrow") \
        .materialize()
    n_edges = edges.count()
    empty_out = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "color": pd.Series([], dtype=str)})
    if n_edges == 0:
        return rd.from_pandas(empty_out)

    def h16(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()[:16]

    if n_edges <= local_edges_gate:
        epd = edges.to_pandas()
        u = epd["u"].to_numpy(np.int64)
        v = epd["v"].to_numpy(np.int64)
        nodes, ui = np.unique(u, return_inverse=True)
        deg = np.bincount(ui)
        lab = {int(n): str(int(d)) for n, d in zip(nodes, deg)}
        nb: dict[int, list[int]] = {}
        for x, y in zip(u, v):
            nb.setdefault(int(x), []).append(int(y))
        for _ in range(rounds):
            lab = {n: h16(lab[n] + "|"
                          + ",".join(sorted(lab[m] for m in nbs)))
                   for n, nbs in ((n, nb[n]) for n in lab)}
        out = pd.DataFrame({"node": np.asarray(sorted(lab), np.int64)})
        out["color"] = [lab[int(n)] for n in out["node"]]
        return rd.from_pandas(out)

    n_parts = max(2, compute_n_buckets(rows_hint or n_edges))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    edges = compact(edges)

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("u", as_index=False).size()
        return pd.DataFrame({"node": out["u"].to_numpy(np.int64),
                             "lab": out["size"].astype("int64")
                             .astype(str)})

    labels = compact(hash_bucket_aggregate(edges, ["u"], deg_bucket,
                                           n_buckets=n_parts))

    def as_msgs(df: pd.DataFrame) -> pd.DataFrame:
        # label of u arrives at node v; is_self=0
        return pd.DataFrame({
            "node": df["v"].astype("int64"),
            "lab": df["lab"].astype(str),
            "is_self": np.zeros(len(df), np.int64)})

    def as_self(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["node"].astype("int64"),
            "lab": df["lab"].astype(str),
            "is_self": np.ones(len(df), np.int64)})

    def relabel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for node, grp in g.groupby("node", sort=False):
            own = grp.loc[grp["is_self"] == 1, "lab"].iloc[0]
            nbs = sorted(grp.loc[grp["is_self"] == 0, "lab"])
            rows.append((int(node), h16(own + "|" + ",".join(nbs))))
        return pd.DataFrame(rows, columns=["node", "lab"]).astype(
            {"node": np.int64})

    for _ in range(rounds):
        j = shuffle_join(edges, labels, "u", "node", ["v"], ["lab"],
                         rows_hint=rows_hint)
        msgs = j.map_batches(as_msgs, batch_format="pandas")
        union = msgs.union(labels.map_batches(as_self,
                                              batch_format="pandas"))
        labels = compact(hash_bucket_aggregate(
            union, ["node"], relabel_bucket, n_buckets=n_parts))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"].astype("int64"),
                             "color": df["lab"].astype(str)})

    return labels.map_batches(finish, batch_format="pandas")


TRUSS_LOCAL_EDGES = 200_000


def k_truss(edges_ds, k: int, rounds: int = 8, *,
            rows_hint: int | None = None,
            local_edges_gate: int = TRUSS_LOCAL_EDGES):
    """k-truss of a distinct undirected ``(a, b)`` edge list (Cohen
    2008): the maximal subgraph in which every edge participates in
    >= k-2 triangles — one step stronger than k-core (every k-truss is
    a (k-1)-core), the standard refinement for keeping only
    well-supported relations when densifying a KG.

    Peel semantics are FIXED-UNROLL so a SQL oracle can replay them:
    both this function and the oracle run at most ``rounds``
    support->filter rounds (support = exact per-edge triangle count);
    this function stops early on convergence (idempotent — re-running
    support on a converged set drops nothing) and RAISES if still
    peeling after ``rounds`` so a divergence can never ship silently.

    Output: one row per surviving edge, ``(a, b, support)`` with
    support counted within the converged truss.

    Scale shape per round: support(a, b) = |N(a) ∩ N(b)| via the wedge
    exchange — per middle vertex emit every neighbor pair (x < y) as a
    map-side-combinable counter row (each triangle yields 3 wedges, one
    per middle, each crediting a different edge), union edge-marker
    rows, and one (a, b)-bucketed aggregate turns closed wedges into
    per-edge support — two bucketed shuffles per round, never
    all-pairs; block counts compacted per round. Below
    ``local_edges_gate`` edges the whole peel replays locally (exact
    integer counts, value-identical by construction).

    Partitioning assumption: wedge volume <= sum_v C(deg(v), 2); a
    power-law hub needs the same upstream degree cap / vertex sample as
    ``adamic_adar`` (documented there).
    """
    import ray.data as rd

    from .relational import compute_n_buckets

    thr = k - 2
    if thr < 1:
        raise ValueError("k_truss requires k >= 3")
    empty_out = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "support": pa.array([], pa.int64())})

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(empty_out)

    if n_edges <= local_edges_gate:
        e = (edges.to_pandas()[["a", "b"]]
             .astype(np.int64).drop_duplicates())
        for r in range(rounds + 1):
            adj = pd.concat([e, e.rename(columns={"a": "b", "b": "a"})],
                            ignore_index=True)
            m = (e.merge(adj.rename(columns={"a": "u", "b": "w"}),
                         left_on="a", right_on="u")
                 .merge(adj.rename(columns={"a": "u2", "b": "w2"}),
                        left_on=["b", "w"], right_on=["u2", "w2"]))
            sup = (m.groupby(["a", "b"], as_index=False).size()
                   .rename(columns={"size": "support"}))
            keep = sup[sup["support"] >= thr]
            if len(keep) == len(e):
                out = (keep.sort_values(["a", "b"])
                       .reset_index(drop=True)
                       .astype({c: np.int64 for c in keep.columns}))
                return (rd.from_pandas(out) if len(out)
                        else rd.from_arrow(empty_out))
            if r == rounds:
                break
            if not len(keep):
                return rd.from_arrow(empty_out)
            e = keep[["a", "b"]].reset_index(drop=True)
        raise RuntimeError(f"k_truss did not converge in {rounds} rounds")

    n_parts = max(2, compute_n_buckets(rows_hint or n_edges))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    def symmetrize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"v": pa.concat_arrays([a, b]),
                         "n": pa.concat_arrays([b, a])})

    def expand_all_pairs(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for v, grp in g.groupby("v", sort=False):
            nb = np.unique(grp["n"].to_numpy(dtype=np.int64))
            if len(nb) < 2:
                continue
            ix, iy = np.triu_indices(len(nb), 1)
            frames.append(pd.DataFrame({"a": nb[ix], "b": nb[iy],
                                        "cn": np.int64(1)}))
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "cn")})
        return (pd.concat(frames, ignore_index=True)
                .groupby(["a", "b"], as_index=False, sort=False)
                .agg(cn=("cn", "sum")))

    def mark_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64),
                             "cn": np.int64(0), "is_edge": np.int64(1)})

    def with_flag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["is_edge"] = np.int64(0)
        return batch

    def support_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["a", "b"], as_index=False, sort=False).agg(
            support=("cn", "sum"), is_edge=("is_edge", "max"))
        per = per[per["is_edge"] == 1]
        return per[["a", "b", "support"]].astype(
            {c: np.int64 for c in ("a", "b", "support")})

    def conform_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": t.column("a").cast(pa.int64()),
                         "b": t.column("b").cast(pa.int64())})

    for r in range(rounds + 1):
        adj = edges.map_batches(symmetrize, batch_format="pyarrow")
        wedges = hash_bucket_aggregate(adj, ["v"], expand_all_pairs,
                                       rows_hint=rows_hint)
        tagged = (wedges.map_batches(with_flag, batch_format="pandas")
                  .union(edges.map_batches(mark_edges,
                                           batch_format="pandas")))
        sup = compact(hash_bucket_aggregate(tagged, ["a", "b"],
                                            support_bucket,
                                            rows_hint=rows_hint))
        keep = compact(sup.map_batches(
            lambda t: (t.filter(pa.compute.greater_equal(
                t.column("support"), thr))
                if t.num_rows and "support" in t.column_names
                else pa.table({"a": pa.array([], pa.int64()),
                               "b": pa.array([], pa.int64()),
                               "support": pa.array([], pa.int64())})),
            batch_format="pyarrow"))
        n_keep = keep.count()
        if n_keep == n_edges:
            return keep
        if r == rounds:
            break
        if n_keep == 0:
            return rd.from_arrow(empty_out)
        edges = compact(keep.map_batches(conform_edges,
                                         batch_format="pyarrow"))
        n_edges = n_keep
    raise RuntimeError(f"k_truss did not converge in {rounds} rounds")


#: rich-club degree thresholds reported (powers of two)
RICH_CLUB_KS = (1, 2, 4, 8, 16, 32)


def _sym_adj(edges_ds):
    """Symmetrize distinct undirected (a, b) edges to (u, v) adjacency
    rows (both orientations)."""

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = t.column("b").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})

    return edges_ds.map_batches(symmetrize, batch_format="pyarrow")


def _degree_table(adj, rows_hint=None):
    """(v, d) undirected degrees from the symmetrized adjacency — one
    bucketed aggregate (assortativity's shape)."""

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("u", as_index=False).size()
        return pd.DataFrame({"v": out["u"].to_numpy(np.int64),
                             "d": out["size"].to_numpy(np.int64)})

    return hash_bucket_aggregate(adj, ["u"], deg_bucket,
                                 rows_hint=rows_hint).materialize()


def avg_neighbor_degree(edges_ds, *, rows_hint: int | None = None):
    """Average-neighbor-degree curve knn(d) (Pastor-Satorras et al.
    2001): for each degree class d, the mean over degree-d vertices of
    their neighbors' mean degree — the functional view of degree
    mixing that the single assortativity number summarizes (falling
    knn(d) = disassortative). Plan: the assortativity head (degree
    table, deg-onto-adjacency join, per-vertex neighbor-degree sum
    s_v), then map-side (d, count, sum s) partials fold on the driver
    (distinct degrees are few). Since mean_nbr(v) = s_v / d for every
    degree-d vertex, the class average is sum(s_v) / (d * count) — one
    exact integer floor to the 1e-6 grid, bit-matching the SQL replay.
    Output: one row per degree class."""
    from .relational import shuffle_join

    adj = _sym_adj(edges_ds)
    deg = _degree_table(adj, rows_hint=rows_hint)
    joined = shuffle_join(adj, deg, "u", "v", ["v"], ["d"],
                          rows_hint=rows_hint)

    def nsum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["d"].sum()
        return pd.DataFrame({"v": out["v"].to_numpy(np.int64),
                             "s": out["d"].to_numpy(np.int64)})

    nsum = hash_bucket_aggregate(joined, ["v"], nsum_bucket,
                                 rows_hint=rows_hint)
    both = shuffle_join(deg, nsum, "v", "v", ["d"], ["s"],
                        rows_hint=rows_hint)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "d" not in g.columns:
            return pd.DataFrame({
                "d": pd.Series([], dtype="int64"),
                "n_vertices": pd.Series([], dtype="int64"),
                "sum_nbr_deg": pd.Series([], dtype="int64")})
        g2 = pd.DataFrame({"d": g["d"].to_numpy(np.int64),
                           "s": g["s"].to_numpy(np.int64)})
        out = g2.groupby("d", as_index=False).agg(
            n_vertices=("s", "size"), sum_nbr_deg=("s", "sum"))
        return out

    agg = (both.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("d", as_index=False).sum().sort_values("d"))
    d = agg["d"].to_numpy(np.int64)
    cnt = agg["n_vertices"].to_numpy(np.int64)
    ssum = agg["sum_nbr_deg"].to_numpy(np.int64)
    micro = np.array([1_000_000 * int(s) // (int(dd) * int(c))
                      for dd, c, s in zip(d, cnt, ssum)],
                     dtype=np.int64)
    return pd.DataFrame({
        "d": d, "n_vertices": cnt.astype(np.int64),
        "sum_nbr_deg": ssum.astype(np.int64),
        "avg_nbr_deg_micro": micro})


def rich_club(edges_ds, ks=RICH_CLUB_KS, *,
              rows_hint: int | None = None):
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) over degree
    thresholds: do high-degree vertices form a denser-than-random core?
    (Colizza et al. 2006 — the hub-collusion screen a KG build runs on
    its entity graph.) Plan: degree table; two bucketed joins attach
    endpoint degrees to each undirected edge; the per-edge
    min(d_a, d_b) histogram and the degree histogram reduce map-side,
    so every phi(k) folds from two driver-sized histograms (E_k =
    edges with min endpoint degree > k; N_k = vertices with d > k).
    phi is the exact integer micro-ratio."""
    from .relational import shuffle_join

    adj = _sym_adj(edges_ds)
    deg = _degree_table(adj, rows_hint=rows_hint)

    def as_ab(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t.column("a").cast(pa.int64()),
            "b": t.column("b").cast(pa.int64())})

    e = edges_ds.map_batches(as_ab, batch_format="pyarrow")
    ja = shuffle_join(e, deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]),
        batch_format="pyarrow"), "a", "a", ["b"], ["da"],
        rows_hint=rows_hint)

    def recast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": df["b"].to_numpy(np.int64),
                             "da": df["da"].to_numpy(np.int64)})

    jb = shuffle_join(ja.map_batches(recast, batch_format="pandas"),
                      deg.map_batches(
                          lambda t: t.rename_columns(["b", "db"]),
                          batch_format="pyarrow"),
                      "b", "b", ["da"], ["db"], rows_hint=rows_hint)

    def md_hist(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "da" not in df.columns:
            return pd.DataFrame({"md": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        md = np.minimum(df["da"].to_numpy(np.int64),
                        df["db"].to_numpy(np.int64))
        out = pd.DataFrame({"md": md})
        out["n"] = np.int64(1)
        return out.groupby("md", as_index=False).sum()

    mdh = (jb.map_batches(md_hist, batch_format="pandas").to_pandas()
           .groupby("md", as_index=False)["n"].sum())

    def deg_hist(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("d").to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    dh = (deg.map_batches(deg_hist, batch_format="pyarrow").to_pandas()
          .groupby("d", as_index=False)["n"].sum())

    rows = []
    for k in ks:
        n_k = int(dh.loc[dh["d"] > k, "n"].sum())
        e_k = int(mdh.loc[mdh["md"] > k, "n"].sum())
        phi = (2_000_000 * e_k // (n_k * (n_k - 1))
               if n_k >= 2 else 0)
        rows.append({"k": np.int64(k), "n_k": np.int64(n_k),
                     "e_k": np.int64(e_k),
                     "phi_micro": np.int64(phi)})
    return pd.DataFrame(rows)


#: personalized-PageRank fixed-point scale and damping (85/100)
PPR_SCALE = 10 ** 12
PPR_NUM, PPR_DEN = 85, 100


def multi_source_ppr(edges_ds, seeds, iters: int = 3,
                     rows_hint: int | None = None,
                     local_edges_gate: int = PAGERANK_LOCAL_EDGES):
    """Personalized PageRank from each landmark seed — one rank VECTOR
    per source (random walk with restart; Jeh-Widom 2003 / Tong et al.
    RWR), the similarity kernel behind KG entity-relatedness and
    local-community queries. Distinct from :func:`pagerank`'s seed-SET
    teleport (TrustRank): here every seed keeps its own diffusion.

    Integer contract (bit-identical across the local replay, the
    distributed path and an unrolled-CTE SQL replay — same argument as
    ``pagerank``):

        pi_0(s, v)   = SCALE if v == s else 0
        contrib(u→v) = pi_t(s, u) * NUM // (DEN * deg(u))
        pi_{t+1}(s,v)= (v == s ? SCALE*(DEN-NUM)//DEN : 0) + Σ contrib

    over the symmetrized adjacency (deg = undirected degree). State is
    |seeds| × reach rows keyed (src, entity); per round ONE bucketed
    join of the rank table onto the adjacency plus one bucketed sum —
    the landmark-sampled shape that stays linear at scale. Below the
    edge gate the identical arithmetic runs as 64-source numpy chunks
    (edge-sorted reduceat, the ``_brandes_chunk`` pattern).

    Returns a Dataset (src, entity, pi) with pi in SCALE units,
    zero rows omitted.
    """
    import ray.data as rd

    from .relational import compute_n_buckets, shuffle_join

    seed_list = sorted(set(int(s) for s in seeds))
    adj = _sym_adj(edges_ds).materialize()
    n_adj = adj.count()

    if n_adj <= local_edges_gate or not seed_list:
        apd = adj.to_pandas()
        return rd.from_pandas(
            _ppr_local_vec(apd, seed_list, iters))

    n_parts = max(2, compute_n_buckets(rows_hint or n_adj))

    def compact(ds):
        ds = ds.materialize()
        if ds.num_blocks() > n_parts:
            ds = ds.repartition(n_parts).materialize()
        return ds

    adj = compact(adj)
    deg = _degree_table(adj, rows_hint=rows_hint)
    adj_deg = compact(shuffle_join(adj, deg, "u", "v", ["v"], ["d"],
                                   n_buckets=n_parts))
    # adj_deg: (u, v, d) with d = deg(u)

    seeds_arr = np.asarray(seed_list, np.int64)
    base = np.int64(PPR_SCALE * (PPR_DEN - PPR_NUM) // PPR_DEN)
    tele = pd.DataFrame({"src": seeds_arr, "entity": seeds_arr,
                         "pi": np.full(len(seeds_arr), base, np.int64)})
    pi_schema = pa.schema([("src", pa.int64()), ("entity", pa.int64()),
                           ("pi", pa.int64())])

    def conform(ds):
        def fix(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pi_schema.empty_table()
            return t.select(pi_schema.names).cast(pi_schema)
        return ds.map_batches(fix, batch_format="pyarrow")

    state = compact(conform(rd.from_pandas(pd.DataFrame({
        "src": seeds_arr, "entity": seeds_arr,
        "pi": np.full(len(seeds_arr), np.int64(PPR_SCALE))}))))

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "src": pd.Series([], dtype="int64"),
                "entity": pd.Series([], dtype="int64"),
                "pi": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "src": df["src"].astype(np.int64).to_numpy(),
            "entity": df["v"].astype(np.int64).to_numpy(),
            "pi": (df["pi"].astype(np.int64).to_numpy() * PPR_NUM
                   // (PPR_DEN * df["d"].astype(np.int64).to_numpy()))})

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["src", "entity"], as_index=False)["pi"].sum()
        return out.astype({"src": np.int64, "entity": np.int64,
                           "pi": np.int64})

    tele_ds = conform(rd.from_pandas(tele))
    for _ in range(iters):
        joined = shuffle_join(adj_deg, state, "u", "entity",
                              ["v", "d"], ["pi", "src"],
                              n_buckets=n_parts)
        contrib = joined.map_batches(relax, batch_format="pandas")
        state = compact(conform(hash_bucket_aggregate(
            contrib.union(tele_ds), ["src", "entity"], sum_bucket,
            n_buckets=n_parts)))

    def drop_zero(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("pi"), 0))

    return state.map_batches(drop_zero, batch_format="pyarrow")


def _ppr_local_vec(apd: pd.DataFrame, seed_list: list[int],
                   iters: int) -> pd.DataFrame:
    """Single-node PPR replay: 64-source chunks, edge-sorted reduceat
    accumulation — identical int64 arithmetic to the distributed path
    (sum order-independent, floor division exact)."""
    if not seed_list:
        return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                             "entity": pd.Series([], dtype="int64"),
                             "pi": pd.Series([], dtype="int64")})
    u = (apd["u"].to_numpy(np.int64) if len(apd)
         else np.array([], np.int64))
    v = (apd["v"].to_numpy(np.int64) if len(apd)
         else np.array([], np.int64))
    seeds_arr = np.asarray(seed_list, np.int64)
    ents = np.unique(np.concatenate([u, v, seeds_arr]))
    nV = len(ents)
    ui = np.searchsorted(ents, u)
    vi = np.searchsorted(ents, v)
    si = np.searchsorted(ents, seeds_arr)
    deg = np.bincount(ui, minlength=nV).astype(np.int64)
    degc = np.maximum(deg, 1)          # isolated seeds never divide
    pv = np.argsort(vi, kind="stable")
    ui_s, vi_s = ui[pv], vi[pv]
    starts = (np.flatnonzero(np.r_[True, vi_s[1:] != vi_s[:-1]])
              if len(vi_s) else np.array([], np.int64))
    vrows = vi_s[starts] if len(vi_s) else np.array([], np.int64)
    base = np.int64(PPR_SCALE * (PPR_DEN - PPR_NUM) // PPR_DEN)

    frames = []
    for c0 in range(0, len(seeds_arr), 64):
        chunk = np.arange(c0, min(c0 + 64, len(seeds_arr)))
        width = len(chunk)
        sic = si[chunk]
        pi = np.zeros((nV, width), np.int64)
        pi[sic, np.arange(width)] = PPR_SCALE
        for _ in range(iters):
            nxt = np.zeros((nV, width), np.int64)
            nxt[sic, np.arange(width)] = base
            if len(starts):
                contrib = (pi[ui_s] * PPR_NUM
                           // (PPR_DEN * degc[ui_s][:, None]))
                sums = np.add.reduceat(contrib, starts, axis=0)
                nxt[vrows] += sums
            pi = nxt
        rows, cols = np.nonzero(pi > 0)
        frames.append(pd.DataFrame({
            "src": seeds_arr[chunk[cols]],
            "entity": ents[rows],
            "pi": pi[rows, cols]}))
    out = pd.concat(frames, ignore_index=True)
    return out.astype({"src": np.int64, "entity": np.int64,
                       "pi": np.int64})
