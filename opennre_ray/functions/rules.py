"""KG schema/rule mining over a triple Dataset — the quality-assurance
pass a knowledge-graph construction pipeline (the engine's flagship,
pipelines/kg.py) runs AFTER extraction: which relations are inverses of
each other, which 2-hop compositions imply a direct relation (AMIE-style
horn rules, Galarraga et al. WWW'13), and per-relation cardinality /
functionality profiles (the AMIE pruning signal and the classic KB
schema-statistics report).

Every operator takes a Dataset of DISTINCT (subj, pred, obj) string
triples and is shaped for an unbounded triple table:

- joins are tagged-union bucketed passes (one shuffle each) through
  ``hash_bucket_aggregate`` — equal keys co-locate, the per-bucket work
  is one vectorized pandas merge/groupby;
- everything that reaches the driver is bounded by the RELATION
  vocabulary (|R|² / |R|³ rows), never by the entity or triple count;
- per-relation supports fold from map-side partial counts.

Skew note (100 TB): a hub entity y with in-degree a and out-degree b
grounds a·b paths in ``path_rules``; production AMIE bounds this with
functionality-based pruning — ``max_fanout`` caps the per-bucket join
fan per join-key deterministically (keep-lowest by (pred, counterpart)
sort) and is OFF by default so small-scale runs stay exact.

No counterpart exists in the reference (it stops at triple extraction);
this extends the engine's KG-construction tier the way kg_truth_discovery
/ kg_type_violations do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import compute_n_buckets, hash_bucket_aggregate

__all__ = ["distinct_triples", "inverse_relations", "path_rules",
           "relation_implications", "relation_profile", "rule_inference"]

_TRIPLE_COLS = ["subj", "pred", "obj"]


def compact(ds, n_parts: int | None = None, rows_hint: int | None = None):
    """Materialize with bounded block count (same rationale as
    graph.compact): Ray's sort shuffle emits one output partition per
    INPUT block, and the miners' tagged unions double block counts, so
    an uncompacted triple table fans a 428-row dataset into 150+ blocks
    whose per-block fixed sort cost dominates (measured: path_rules
    8.9 s → the compacted run below). The repartition barrier is paid
    only when actually over budget."""
    if n_parts is None:
        n_parts = compute_n_buckets(rows_hint)
    ds = ds.materialize()
    if ds.num_blocks() > n_parts:
        ds = ds.repartition(n_parts).materialize()
    return ds


def distinct_triples(ds, rows_hint: int | None = None):
    """Dedup an instance-level (subj, pred, obj) stream to distinct
    triples — one bucketed pass keyed by the full triple."""
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(_TRIPLE_COLS)[_TRIPLE_COLS]

    return hash_bucket_aggregate(
        ds.select_columns(_TRIPLE_COLS), _TRIPLE_COLS, per_bucket,
        rows_hint=rows_hint)


def _pred_counts(triples, rows_hint: int | None = None) -> pd.DataFrame:
    """Triple count per relation: map-side partials, tiny driver fold."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"pred": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return df.groupby("pred", sort=False).size().reset_index(name="n")

    parts = triples.map_batches(partial, batch_format="pandas").to_pandas()
    return parts.groupby("pred", as_index=False)["n"].sum()


def inverse_relations(triples, rows_hint: int | None = None) -> pd.DataFrame:
    """Inverse/symmetry detection: for every ordered relation pair
    (r1, r2), the number of entity pairs with r1(h, t) AND r2(t, h) both
    asserted, plus r1's support and the integer-micro confidence
    n_overlap / |r1| — r1 == r2 rows measure relation SYMMETRY. One
    tagged-union shuffle keyed by the (directed) entity pair; the fold
    that reaches the driver is |R|²-bounded. Only pairs with overlap > 0
    are reported (deterministic: exact integers, sorted output)."""
    def tag(swap: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "k1": pd.Series([], dtype="object"),
                    "k2": pd.Series([], dtype="object"),
                    "rel": pd.Series([], dtype="object"),
                    "side": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "k1": df["obj" if swap else "subj"].to_numpy(),
                "k2": df["subj" if swap else "obj"].to_numpy(),
                "rel": df["pred"].to_numpy(),
                "side": np.full(len(df), int(swap), np.int64)})
        return f

    union = triples.map_batches(tag(False), batch_format="pandas").union(
        triples.map_batches(tag(True), batch_format="pandas"))

    def bucket_overlap(g: pd.DataFrame) -> pd.DataFrame:
        fwd = g[g["side"] == 0]
        rev = g[g["side"] == 1]
        if not len(fwd) or not len(rev):
            return pd.DataFrame({"r1": pd.Series([], dtype="object"),
                                 "r2": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64")})
        m = fwd.merge(rev, on=["k1", "k2"], suffixes=("_f", "_r"))
        return (m.groupby(["rel_f", "rel_r"], sort=False).size()
                .reset_index(name="c")
                .rename(columns={"rel_f": "r1", "rel_r": "r2"}))

    parts = hash_bucket_aggregate(union, ["k1", "k2"], bucket_overlap,
                                  rows_hint=rows_hint).to_pandas()
    sup = _pred_counts(triples)
    if not len(parts):
        return pd.DataFrame({
            "r1": pd.Series([], dtype="object"),
            "r2": pd.Series([], dtype="object"),
            "n_overlap": pd.Series([], dtype="int64"),
            "n_r1": pd.Series([], dtype="int64"),
            "confidence_micro": pd.Series([], dtype="int64")})
    out = parts.groupby(["r1", "r2"], as_index=False)["c"].sum()
    out = out.merge(sup.rename(columns={"pred": "r1", "n": "n_r1"}),
                    on="r1")
    return pd.DataFrame({
        "r1": out["r1"].to_numpy(),
        "r2": out["r2"].to_numpy(),
        "n_overlap": out["c"].astype(np.int64).to_numpy(),
        "n_r1": out["n_r1"].astype(np.int64).to_numpy(),
        "confidence_micro": (10 ** 6 * out["c"] // out["n_r1"])
        .astype(np.int64).to_numpy(),
    }).sort_values(["r1", "r2"]).reset_index(drop=True)


def _ground_paths(triples, rows_hint: int | None = None,
                  max_fanout: int | None = None):
    """Body grounding shared by ``path_rules`` and ``rule_inference``:
    one shuffle keyed by the join entity y, per-bucket merge of incoming
    (side 0: r1(x, y)) against outgoing (side 1: r2(y, z)) edges →
    Dataset of per-bucket-distinct (x, r1, r2, z) rows with x ≠ z."""
    def tag_hop(second: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({
                    "y": pd.Series([], dtype="object"),
                    "rel": pd.Series([], dtype="object"),
                    "other": pd.Series([], dtype="object"),
                    "side": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "y": df["subj" if second else "obj"].to_numpy(),
                "rel": df["pred"].to_numpy(),
                "other": df["obj" if second else "subj"].to_numpy(),
                "side": np.full(len(df), int(second), np.int64)})
        return f

    hops = triples.map_batches(tag_hop(False), batch_format="pandas") \
        .union(triples.map_batches(tag_hop(True), batch_format="pandas"))

    def ground_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g[g["side"] == 0]
        second = g[g["side"] == 1]
        if max_fanout is not None:
            first = first.sort_values(["y", "rel", "other"]) \
                .groupby("y", sort=False).head(max_fanout)
            second = second.sort_values(["y", "rel", "other"]) \
                .groupby("y", sort=False).head(max_fanout)
        if not len(first) or not len(second):
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in ("x", "r1", "r2", "z")})
        m = first.merge(second, on="y", suffixes=("_1", "_2"))
        m = m[m["other_1"] != m["other_2"]]
        return pd.DataFrame({
            "x": m["other_1"].to_numpy(), "r1": m["rel_1"].to_numpy(),
            "r2": m["rel_2"].to_numpy(), "z": m["other_2"].to_numpy(),
        }).drop_duplicates()

    return compact(hash_bucket_aggregate(hops, ["y"], ground_bucket,
                                         rows_hint=rows_hint),
                   rows_hint=rows_hint)


def relation_implications(triples,
                          rows_hint: int | None = None) -> pd.DataFrame:
    """Same-direction implication mining (AMIE length-1 rules,
    r1(x, y) ⇒ r2(x, y)): for every ordered relation pair r1 ≠ r2, the
    number of entity pairs asserting BOTH on the same direction, r1's
    support, and the integer-micro confidence n_overlap / |r1| —
    confidence ≈ 1 both ways flags duplicate/equivalent relations, one
    way flags subsumption (r1 ⊑ r2), the classic ontology-alignment QA
    signal. One bucketed pass keyed by the directed entity pair (every
    relation asserted on a pair co-locates; the per-bucket pair-local
    self-merge is |R_pair|²-bounded); the driver fold is |R|²-bounded.
    Completes the rule family: implication (this), inversion
    (``inverse_relations``), composition (``path_rules``)."""
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "k1": pd.Series([], dtype="object"),
                "k2": pd.Series([], dtype="object"),
                "rel": pd.Series([], dtype="object")})
        return pd.DataFrame({"k1": df["subj"].to_numpy(),
                             "k2": df["obj"].to_numpy(),
                             "rel": df["pred"].to_numpy()})

    def bucket_overlap(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["k1", "k2", "rel"])
        m = d.merge(d, on=["k1", "k2"], suffixes=("_1", "_2"))
        m = m[m["rel_1"] != m["rel_2"]]
        if not len(m):
            return pd.DataFrame({"r1": pd.Series([], dtype="object"),
                                 "r2": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64")})
        return (m.groupby(["rel_1", "rel_2"], sort=False).size()
                .reset_index(name="c")
                .rename(columns={"rel_1": "r1", "rel_2": "r2"}))

    parts = hash_bucket_aggregate(
        triples.map_batches(tag, batch_format="pandas"), ["k1", "k2"],
        bucket_overlap, rows_hint=rows_hint).to_pandas()
    if not len(parts):
        return pd.DataFrame({
            "r1": pd.Series([], dtype="object"),
            "r2": pd.Series([], dtype="object"),
            "n_overlap": pd.Series([], dtype="int64"),
            "n_r1": pd.Series([], dtype="int64"),
            "confidence_micro": pd.Series([], dtype="int64")})
    sup = _pred_counts(triples)
    out = parts.groupby(["r1", "r2"], as_index=False)["c"].sum()
    out = out.merge(sup.rename(columns={"pred": "r1", "n": "n_r1"}),
                    on="r1")
    return pd.DataFrame({
        "r1": out["r1"].to_numpy(),
        "r2": out["r2"].to_numpy(),
        "n_overlap": out["c"].astype(np.int64).to_numpy(),
        "n_r1": out["n_r1"].astype(np.int64).to_numpy(),
        "confidence_micro": (10 ** 6 * out["c"] // out["n_r1"])
        .astype(np.int64).to_numpy(),
    }).sort_values(["r1", "r2"]).reset_index(drop=True)


def path_rules(triples, rows_hint: int | None = None,
               max_fanout: int | None = None,
               paths=None) -> pd.DataFrame:
    """AMIE-lite closed-path rule mining: for every rule
    r1(x, y) ∧ r2(y, z) ⇒ r3(x, z), report the body support (distinct
    (x, z) groundings with some witness y, x ≠ z), the closed count
    (groundings where r3(x, z) is also asserted), the head size |r3|,
    and the integer-micro standard confidence n_closed / n_paths and
    head coverage n_closed / |r3| (Galarraga et al., AMIE, WWW'13 §3).

    Two bucketed shuffles: (1) keyed by the JOIN entity y, the per-bucket
    merge grounds the body; (2) keyed by (x, z), body groundings dedup
    (all copies of a grounding share the key) and meet the head triples
    in a tagged union. Driver fold is |R|³-bounded partial counts. Rules
    with n_closed = 0 are dropped. ``max_fanout`` (optional) caps per-y
    in/out edges for hub-skew control — deterministic keep-lowest.
    ``paths`` (optional) takes a precomputed ``_ground_paths`` Dataset
    so rule_inference mines and re-grounds from ONE grounding pass."""
    if paths is None:
        paths = _ground_paths(triples, rows_hint, max_fanout)

    def tag_path(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _xz_empty()
        return pd.DataFrame({
            "k1": df["x"].to_numpy(), "k2": df["z"].to_numpy(),
            "r1": df["r1"].to_numpy(), "r2": df["r2"].to_numpy(),
            "side": np.zeros(len(df), np.int64)})

    def tag_head(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _xz_empty()
        return pd.DataFrame({
            "k1": df["subj"].to_numpy(), "k2": df["obj"].to_numpy(),
            "r1": df["pred"].to_numpy(),
            "r2": np.full(len(df), "", dtype=object),
            "side": np.ones(len(df), np.int64)})

    union = paths.map_batches(tag_path, batch_format="pandas").union(
        triples.map_batches(tag_head, batch_format="pandas"))

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        body = g[g["side"] == 0].drop_duplicates(["k1", "k2", "r1", "r2"])
        head = g[g["side"] == 1]
        outs = []
        if len(body):
            outs.append(body.groupby(["r1", "r2"], sort=False).size()
                        .reset_index(name="n")
                        .assign(r3="", kind=np.int64(0)))
            if len(head):
                closed = body.merge(
                    head[["k1", "k2", "r1"]].rename(columns={"r1": "r3"}),
                    on=["k1", "k2"])
                if len(closed):
                    outs.append(closed.groupby(["r1", "r2", "r3"],
                                               sort=False).size()
                                .reset_index(name="n")
                                .assign(kind=np.int64(1)))
        if not outs:
            return pd.DataFrame({
                "r1": pd.Series([], dtype="object"),
                "r2": pd.Series([], dtype="object"),
                "r3": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)[
            ["r1", "r2", "r3", "n", "kind"]]

    parts = hash_bucket_aggregate(union, ["k1", "k2"], fold_bucket,
                                  rows_hint=rows_hint).to_pandas()
    head_n = _pred_counts(triples)
    cols = {"r1": pd.Series([], dtype="object"),
            "r2": pd.Series([], dtype="object"),
            "r3": pd.Series([], dtype="object"),
            "n_paths": pd.Series([], dtype="int64"),
            "n_closed": pd.Series([], dtype="int64"),
            "n_head": pd.Series([], dtype="int64"),
            "confidence_micro": pd.Series([], dtype="int64"),
            "head_coverage_micro": pd.Series([], dtype="int64")}
    if not len(parts):
        return pd.DataFrame(cols)
    body = parts[parts["kind"] == 0].groupby(["r1", "r2"],
                                             as_index=False)["n"].sum() \
        .rename(columns={"n": "n_paths"})
    closed = parts[parts["kind"] == 1].groupby(["r1", "r2", "r3"],
                                               as_index=False)["n"].sum() \
        .rename(columns={"n": "n_closed"})
    if not len(closed):
        return pd.DataFrame(cols)
    out = closed.merge(body, on=["r1", "r2"]) \
        .merge(head_n.rename(columns={"pred": "r3", "n": "n_head"}),
               on="r3")
    return pd.DataFrame({
        "r1": out["r1"].to_numpy(),
        "r2": out["r2"].to_numpy(),
        "r3": out["r3"].to_numpy(),
        "n_paths": out["n_paths"].astype(np.int64).to_numpy(),
        "n_closed": out["n_closed"].astype(np.int64).to_numpy(),
        "n_head": out["n_head"].astype(np.int64).to_numpy(),
        "confidence_micro": (10 ** 6 * out["n_closed"] // out["n_paths"])
        .astype(np.int64).to_numpy(),
        "head_coverage_micro": (10 ** 6 * out["n_closed"] // out["n_head"])
        .astype(np.int64).to_numpy(),
    }).sort_values(["r1", "r2", "r3"]).reset_index(drop=True)


def _xz_empty() -> pd.DataFrame:
    return pd.DataFrame({
        "k1": pd.Series([], dtype="object"),
        "k2": pd.Series([], dtype="object"),
        "r1": pd.Series([], dtype="object"),
        "r2": pd.Series([], dtype="object"),
        "side": pd.Series([], dtype="int64")})


def relation_profile(triples, rows_hint: int | None = None) -> pd.DataFrame:
    """Per-relation cardinality profile: triple count, distinct subject
    and object counts, and the AMIE functionality / inverse-functionality
    scores (n_subj / n_triples, n_obj / n_triples, in integer micro) —
    the signal that labels a relation 1:1 / 1:N / N:1 / N:M for
    downstream rule pruning and truth discovery. Distinct counts go
    through bucketed (pred, entity) dedup so one giant relation never
    needs its entity set in a single heap; everything at the driver is
    |R|-bounded."""
    def side_count(col: str, name: str) -> pd.DataFrame:
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            d = g.drop_duplicates(["pred", col])
            return (d.groupby("pred", sort=False).size()
                    .reset_index(name=name))

        parts = hash_bucket_aggregate(
            triples.select_columns(["pred", col]), ["pred", col],
            per_bucket, rows_hint=rows_hint).to_pandas()
        return parts.groupby("pred", as_index=False)[name].sum()

    n_tri = _pred_counts(triples).rename(columns={"n": "n_triples"})
    out = n_tri.merge(side_count("subj", "n_subj"), on="pred") \
        .merge(side_count("obj", "n_obj"), on="pred")
    return pd.DataFrame({
        "pred": out["pred"].to_numpy(),
        "n_triples": out["n_triples"].astype(np.int64).to_numpy(),
        "n_subj": out["n_subj"].astype(np.int64).to_numpy(),
        "n_obj": out["n_obj"].astype(np.int64).to_numpy(),
        "functionality_micro": (10 ** 6 * out["n_subj"] //
                                out["n_triples"]).astype(np.int64)
        .to_numpy(),
        "inv_functionality_micro": (10 ** 6 * out["n_obj"] //
                                    out["n_triples"]).astype(np.int64)
        .to_numpy(),
    }).sort_values("pred").reset_index(drop=True)


_INFER_COLS = {"r1": pd.Series([], dtype="object"),
               "r2": pd.Series([], dtype="object"),
               "r3": pd.Series([], dtype="object"),
               "n_paths": pd.Series([], dtype="int64"),
               "n_closed": pd.Series([], dtype="int64"),
               "n_new": pd.Series([], dtype="int64"),
               "confidence_micro": pd.Series([], dtype="int64"),
               "new_checksum": pd.Series([], dtype="int64")}

_CKSUM_MOD = 2 ** 31


def _triple_cksum(subj: pd.Series, pred: pd.Series, obj: pd.Series):
    """Order-independent content hash of a triple set: per-triple
    md5-u64 of 'subj|pred|obj' mod 2^31; callers SUM these (partials
    fold associatively, final sum re-modded at the driver)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(f"{s}|{p}|{o}".encode("utf-8"))
                        .digest()[:8], "big") % _CKSUM_MOD
         for s, p, o in zip(subj, pred, obj)),
        dtype=np.int64, count=len(subj))


def rule_inference(triples, min_conf_micro: int = 200_000,
                   rows_hint: int | None = None,
                   max_fanout: int | None = None) -> pd.DataFrame:
    """KB completion by rule application: mine the AMIE path rules
    (``path_rules``), keep those with standard confidence ≥
    ``min_conf_micro``, re-ground their bodies, and anti-join the
    implied heads r3(x, z) against the asserted triples — the classic
    "apply learned horn rules to predict missing facts" step (Galarraga
    et al. WWW'13 §5). A triple predicted by several qualifying rules is
    attributed once, to its best rule (highest confidence, then lowest
    (r1, r2)). Per qualifying rule the audit reports body support,
    closed count, the NEW-prediction count, and an order-independent
    md5 checksum of the predicted-triple set (sum of per-triple u64
    mod 2^31) so the full prediction content is value-verifiable while
    the output stays |R|³-bounded at any corpus size.

    Scale shape: the rule table is |R|³-bounded (driver-sized, shipped
    to workers inside the closure); grounding is the shared one-shuffle
    pass; the anti-join + best-rule dedup is one more bucketed pass
    keyed by (x, z) — every copy of a grounding and every asserted
    head for that pair co-locate, so dedup and membership are exact.
    Grounding runs ONCE (the compacted ``_ground_paths`` Dataset is
    shared between mining and re-grounding)."""
    paths = _ground_paths(triples, rows_hint, max_fanout)
    mined = path_rules(triples, rows_hint=rows_hint, max_fanout=max_fanout,
                       paths=paths)
    mined = mined[mined["confidence_micro"] >= min_conf_micro] \
        .reset_index(drop=True)
    if not len(mined):
        return pd.DataFrame(_INFER_COLS)
    rule_map: dict = {}
    for row in mined.itertuples(index=False):
        rule_map.setdefault((row.r1, row.r2), []).append(
            (row.r3, int(row.confidence_micro)))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = {"k1": [], "k2": [], "r3": [], "r1": [], "r2": [],
                "conf": []}
        if len(df):
            # group by (r1, r2) so each rule's groundings expand as one
            # vectorized append, not a per-row loop
            for (r1, r2), g in df.groupby(["r1", "r2"], sort=False):
                for r3, conf in rule_map.get((r1, r2), ()):
                    outs["k1"].append(g["x"].to_numpy())
                    outs["k2"].append(g["z"].to_numpy())
                    outs["r3"].append(np.full(len(g), r3, dtype=object))
                    outs["r1"].append(np.full(len(g), r1, dtype=object))
                    outs["r2"].append(np.full(len(g), r2, dtype=object))
                    outs["conf"].append(np.full(len(g), conf, np.int64))
        if not outs["k1"]:
            return pd.DataFrame({
                "k1": pd.Series([], dtype="object"),
                "k2": pd.Series([], dtype="object"),
                "r3": pd.Series([], dtype="object"),
                "r1": pd.Series([], dtype="object"),
                "r2": pd.Series([], dtype="object"),
                "conf": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int64")})
        out = pd.DataFrame({k: np.concatenate(v)
                            for k, v in outs.items()})
        out["side"] = np.zeros(len(out), np.int64)
        return out

    def tag_asserted(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "k1": pd.Series([], dtype="object"),
                "k2": pd.Series([], dtype="object"),
                "r3": pd.Series([], dtype="object"),
                "r1": pd.Series([], dtype="object"),
                "r2": pd.Series([], dtype="object"),
                "conf": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int64")})
        n = len(df)
        return pd.DataFrame({
            "k1": df["subj"].to_numpy(), "k2": df["obj"].to_numpy(),
            "r3": df["pred"].to_numpy(),
            "r1": np.full(n, "", dtype=object),
            "r2": np.full(n, "", dtype=object),
            "conf": np.zeros(n, np.int64),
            "side": np.ones(n, np.int64)})

    union = paths.map_batches(expand, batch_format="pandas").union(
        triples.map_batches(tag_asserted, batch_format="pandas"))

    def infer_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["side"] == 0]
        if not len(cand):
            return pd.DataFrame({
                "r1": pd.Series([], dtype="object"),
                "r2": pd.Series([], dtype="object"),
                "r3": pd.Series([], dtype="object"),
                "n_new": pd.Series([], dtype="int64"),
                "cksum": pd.Series([], dtype="int64")})
        head = g[g["side"] == 1]
        if len(head):
            cand = cand.merge(
                head[["k1", "k2", "r3"]].drop_duplicates()
                .assign(_hit=np.int64(1)),
                on=["k1", "k2", "r3"], how="left")
            cand = cand[cand["_hit"].isna()]
        if not len(cand):
            return pd.DataFrame({
                "r1": pd.Series([], dtype="object"),
                "r2": pd.Series([], dtype="object"),
                "r3": pd.Series([], dtype="object"),
                "n_new": pd.Series([], dtype="int64"),
                "cksum": pd.Series([], dtype="int64")})
        best = cand.sort_values(
            ["k1", "k2", "r3", "conf", "r1", "r2"],
            ascending=[True, True, True, False, True, True]) \
            .drop_duplicates(["k1", "k2", "r3"])
        best = best.assign(
            cksum=_triple_cksum(best["k1"], best["r3"], best["k2"]))
        agg = (best.groupby(["r1", "r2", "r3"], sort=False)
               .agg(n_new=("cksum", "size"), cksum=("cksum", "sum"))
               .reset_index())
        agg["cksum"] = agg["cksum"] % _CKSUM_MOD
        return agg

    parts = hash_bucket_aggregate(union, ["k1", "k2"], infer_bucket,
                                  rows_hint=rows_hint).to_pandas()
    if len(parts):
        folded = parts.groupby(["r1", "r2", "r3"], as_index=False) \
            .agg(n_new=("n_new", "sum"), cksum=("cksum", "sum"))
    else:
        folded = pd.DataFrame({"r1": pd.Series([], dtype="object"),
                               "r2": pd.Series([], dtype="object"),
                               "r3": pd.Series([], dtype="object"),
                               "n_new": pd.Series([], dtype="int64"),
                               "cksum": pd.Series([], dtype="int64")})
    out = mined[["r1", "r2", "r3", "n_paths", "n_closed",
                 "confidence_micro"]].merge(folded, on=["r1", "r2", "r3"],
                                            how="left")
    out["n_new"] = out["n_new"].fillna(0).astype(np.int64)
    out["new_checksum"] = (out["cksum"].fillna(0).astype(np.int64)
                           % _CKSUM_MOD)
    return out.drop(columns="cksum") \
        .sort_values(["r1", "r2", "r3"]).reset_index(drop=True)[
        list(_INFER_COLS)]
