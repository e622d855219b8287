"""Evaluation metrics (SURVEY §2.5 O1-O7), numpy only (no sklearn in box).

- sentence-level accuracy + micro P/R/F1 with negative-label auto-detection:
  reference ``framework/data_loader.py:53-103``
- bag-level PR curve, AUC (trapezoid — equivalent to sklearn.metrics.auc),
  P@k, max-F1 + best threshold, per-entpair micro/macro F1:
  reference ``data_loader.py:239-310``
- multi-label variant NA aliases: reference ``data_loader.py:375-446``

The bag eval's global score sort (O1) is expressed on the Dataset
(``ds.sort('score', descending=True)``) and the cumulative pass runs on the
collected (small) prediction rows — prediction rows are bags × relations,
orders of magnitude smaller than instances.
"""

from __future__ import annotations

import numpy as np

NEG_ALIASES_SENT = ("NA", "na", "no_relation", "Other", "Others")
NEG_ALIASES_MULTI = ("NA", "na", "N/A", "None", "none", "n/a", "no_relation")


def detect_negative(rel2id: dict, aliases=NEG_ALIASES_SENT):
    """First matching negative alias present in the vocabulary, else None."""
    for name in aliases:
        if name in rel2id:
            return rel2id[name]
    return None


def sentence_eval(gold_ids, pred_ids, rel2id: dict) -> dict:
    """acc + micro P/R/F1 excluding the negative class (reference O6)."""
    gold = np.asarray(gold_ids)
    pred = np.asarray(pred_ids)
    neg = detect_negative(rel2id)
    correct = (gold == pred)
    acc = float(correct.mean()) if len(gold) else 0.0
    pos_gold = gold != neg
    pos_pred = pred != neg
    correct_positive = int((correct & pos_gold).sum())
    micro_p = correct_positive / int(pos_pred.sum()) if pos_pred.any() else 0.0
    micro_r = correct_positive / int(pos_gold.sum()) if pos_gold.any() else 0.0
    denom = micro_p + micro_r
    micro_f1 = 2 * micro_p * micro_r / denom if denom else 0.0
    return {"acc": acc, "micro_p": micro_p, "micro_r": micro_r,
            "micro_f1": micro_f1}


def auc_trapezoid(x: np.ndarray, y: np.ndarray) -> float:
    """Area under the (x, y) curve by trapezoidal rule (sklearn.auc equiv)."""
    order = np.argsort(x, kind="stable")
    return float(np.trapz(y[order], x[order]))


def bag_eval(pred_rows, facts: set, rel2id: dict, threshold=0.5) -> dict:
    """PR curve / AUC / P@k / max-F1 over sorted prediction rows (O1-O5).

    Args:
        pred_rows: iterable of dicts {h_id, t_id, relation, score}
            (non-NA rows only — M17 expansion output).
        facts: set of (h_id, t_id, relation) gold triples (G2 fact set).
    """
    # deterministic tiebreak on equal scores: the distributed groupby feeding
    # this gives no stable row order, and AUC/P@k/best_threshold depend on
    # rank order within ties
    rows = sorted(pred_rows,
                  key=lambda r: (-r["score"], r["h_id"], r["t_id"],
                                 r["relation"]))
    total = len(facts)
    hits = np.fromiter(
        ((r["h_id"], r["t_id"], r["relation"]) in facts for r in rows),
        dtype=np.int64, count=len(rows))
    cum = hits.cumsum()
    ranks = np.arange(1, len(rows) + 1)
    prec = cum / ranks
    rec = cum / max(total, 1)
    f1s = 2 * prec * rec / (prec + rec + 1e-20)
    best_i = int(f1s.argmax()) if len(rows) else 0
    out = {
        "auc": auc_trapezoid(rec, prec) if len(rows) else 0.0,
        "max_micro_f1": float(f1s.max()) if len(rows) else 0.0,
        "best_threshold": rows[best_i]["score"] if rows else 0.0,
        "mean_prec": float(prec.mean()) if len(rows) else 0.0,
    }
    for k in (100, 200, 300):
        out[f"p@{k}"] = float(prec[k - 1]) if len(rows) >= k else None
    # per-entpair micro/macro over the 0.5-threshold predictions (O5)
    n_rel = len(rel2id)
    by_pair: dict = {}
    for r in rows:
        key = (r["h_id"], r["t_id"])
        if key not in by_pair:
            by_pair[key] = {"label": np.zeros(n_rel, np.int64),
                            "pred": np.zeros(n_rel, np.int64)}
        rid = rel2id[r["relation"]]
        if (r["h_id"], r["t_id"], r["relation"]) in facts:
            by_pair[key]["label"][rid] = 1
        if r["score"] >= threshold:
            by_pair[key]["pred"][rid] = 1
    if by_pair:
        label = np.stack([v["label"] for v in by_pair.values()])
        pred = np.stack([v["pred"] for v in by_pair.values()])
        pos = slice(1, n_rel)   # labels 1..N-1 (exclude NA at 0)
        out.update(_prf(label[:, pos], pred[:, pos]))
    # 1e-12 grid on the reported floats: last-ulp noise (BLAS kernel /
    # summation variation across runs) was observed flipping auc's final
    # digit against the golden pin; 12 decimals keeps every meaningful
    # digit of a [0,1] metric while absorbing ~1e-16 jitter
    return {k: (round(v, 12) if isinstance(v, float) else v)
            for k, v in out.items()}


def bag_eval_distributed(scores_ds, rel2id: dict,
                         threshold: float = 0.5,
                         rows_hint: int | None = None) -> dict:
    """``bag_eval`` without collecting prediction rows to the driver —
    the corpus-scale O1-O5 pass (bag count ≈ distinct entity pairs is
    unbounded on a web corpus, so the eval stream must stay distributed).

    Facts are the argmax relation per entity pair (ties break on
    relation asc — scores are distinct floats in practice, so this
    matches the driver path's first-max). Three distributed pieces:

    1. one bucketed pass per (h_id, t_id) marks each row's hit flag
       (row IS its pair's fact) — the shuffle the scores already paid;
    2. per-relation 0.5-threshold label/pred/tp counts reduce map-side
       (n_rel rows reach the driver) for the micro/macro block;
    3. one global ``Dataset.sort`` by (-score, h_id, t_id, relation),
       then each sorted block computes its exact PR-curve slice from its
       (rank, hit) prefix offsets alone — the carried-block-prefix
       pattern of ``streaming.running_totals`` — and only per-block
       scalars (trapezoid area slice, first-max F1 candidate, precision
       sum, P@k candidates) reach the driver.

    Per-element prec/rec/F1 values are bit-identical to ``bag_eval``;
    only the order the trapezoid/mean sums accumulate differs, which the
    shared 1e-12 rounding grid absorbs (see ``bag_eval``).
    """
    import pyarrow as pa

    import ray

    from ..functions.relational import hash_bucket_aggregate

    # ---- 1. hit-marking bucketed pass -------------------------------
    def mark_bucket(g):
        g = g.sort_values(["h_id", "t_id", "score", "relation"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        first = ~g.duplicated(["h_id", "t_id"], keep="first")
        g = g.assign(hit=first.to_numpy().astype(np.int64))
        return g[["h_id", "t_id", "relation", "score", "hit"]]

    marked = hash_bucket_aggregate(
        scores_ds.select_columns(["h_id", "t_id", "relation", "score"]),
        ["h_id", "t_id"], mark_bucket, rows_hint=rows_hint).materialize()

    # ---- 2. per-relation threshold partials (map-side reduce) -------
    def rel_partials(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.to_pandas()
        if "score" not in df.columns:        # schema-less empty block
            df = pd.DataFrame({"relation": pd.Series([], dtype=object),
                               "score": pd.Series([], dtype="float64"),
                               "hit": pd.Series([], dtype="int64")})
        pred = (df["score"] >= threshold).to_numpy()
        hit = df["hit"].to_numpy().astype(bool)
        out = pd.DataFrame({"relation": df["relation"],
                            "label_c": hit.astype(np.int64),
                            "pred_c": pred.astype(np.int64),
                            "tp_c": (hit & pred).astype(np.int64)})
        agg = out.groupby("relation", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    rel_rows = (marked.map_batches(rel_partials, batch_format="pyarrow")
                .to_pandas().groupby("relation", as_index=False).sum())
    n_rel = len(rel2id)
    label_v = np.zeros(n_rel, np.int64)
    pred_v = np.zeros(n_rel, np.int64)
    tp_v = np.zeros(n_rel, np.int64)
    for _, r in rel_rows.iterrows():
        rid = rel2id[r["relation"]]
        label_v[rid] = r["label_c"]
        pred_v[rid] = r["pred_c"]
        tp_v[rid] = r["tp_c"]
    total_facts = int(label_v.sum())

    # ---- 3. global sort + per-block PR-curve slices ------------------
    sorted_ds = marked.sort(["score", "h_id", "t_id", "relation"],
                            descending=[True, False, False, False]
                            ).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def counts(t: pa.Table):
        return (t.num_rows,
                int(np.asarray(t.column("hit").to_numpy(
                    zero_copy_only=False)).sum()))

    @ray.remote
    def block_slice(t: pa.Table, rank_off: int, hit_off: int,
                    total: int, ks: tuple):
        n = t.num_rows
        if n == 0:
            return {"trapz": 0.0, "prec_sum": 0.0, "f1": None,
                    "pk": {}}
        hits = np.asarray(t.column("hit").to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cum = hit_off + hits.cumsum()
        ranks = np.arange(rank_off + 1, rank_off + 1 + n, dtype=np.int64)
        prec = cum / ranks
        rec = cum / max(total, 1)
        # np.trapz segment sum: dx * (y_i + y_{i-1}) / 2 per consecutive
        # pair, including the boundary segment back to the previous
        # block's last point (absent only for the global first point)
        if rank_off > 0:
            prev_prec = hit_off / rank_off
            prev_rec = hit_off / max(total, 1)
            x = np.concatenate([[prev_rec], rec])
            y = np.concatenate([[prev_prec], prec])
        else:
            x, y = rec, prec
        trapz = float((np.diff(x) * (y[1:] + y[:-1]) / 2.0).sum())
        f1 = 2 * prec * rec / (prec + rec + 1e-20)
        bi = int(f1.argmax())
        f1_cand = (float(f1[bi]), rank_off + bi,
                   float(t.column("score")[bi].as_py()))
        pk = {k: float(prec[k - 1 - rank_off]) for k in ks
              if rank_off < k <= rank_off + n}
        return {"trapz": trapz, "prec_sum": float(prec.sum()),
                "f1": f1_cand, "pk": pk}

    per_block = ray.get([counts.remote(r) for r in refs])
    ns = [c[0] for c in per_block]
    hs = [c[1] for c in per_block]
    rank_offs = np.concatenate([[0], np.cumsum(ns[:-1])]) if ns else []
    hit_offs = np.concatenate([[0], np.cumsum(hs[:-1])]) if hs else []
    ks = (100, 200, 300)
    slices = ray.get([
        block_slice.remote(r, int(ro), int(ho), total_facts, ks)
        for r, ro, ho in zip(refs, rank_offs, hit_offs)])

    n_rows = int(sum(ns))
    auc = float(sum(s["trapz"] for s in slices))
    mean_prec = (float(sum(s["prec_sum"] for s in slices)) / n_rows
                 if n_rows else 0.0)
    f1_cands = [s["f1"] for s in slices if s["f1"] is not None]
    if f1_cands:
        best_f1, best_idx, best_score = max(
            f1_cands, key=lambda c: (c[0], -c[1]))
    else:
        best_f1, best_score = 0.0, 0.0
    out = {
        "auc": auc if n_rows else 0.0,
        "max_micro_f1": best_f1,
        "best_threshold": best_score,
        "mean_prec": mean_prec,
    }
    pk_all: dict = {}
    for s in slices:
        pk_all.update(s["pk"])
    for k in ks:
        out[f"p@{k}"] = pk_all.get(k) if n_rows >= k else None

    # micro/macro at threshold over relation columns 1..n_rel-1 (the
    # same NA-column exclusion as bag_eval)
    lv, pv, tv = label_v[1:], pred_v[1:], tp_v[1:]
    tp = int(tv.sum())
    micro_p = tp / pv.sum() if pv.sum() else 0.0
    micro_r = tp / lv.sum() if lv.sum() else 0.0
    micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)
                if micro_p + micro_r else 0.0)
    ps = np.where(pv > 0, tv / np.maximum(pv, 1), 0.0)
    rs = np.where(lv > 0, tv / np.maximum(lv, 1), 0.0)
    fs = np.where(ps + rs > 0, 2 * ps * rs / np.maximum(ps + rs, 1e-300),
                  0.0)
    out.update({
        "micro_p_05": float(micro_p), "micro_r_05": float(micro_r),
        "micro_f1_05": float(micro_f1), "macro_p": float(np.mean(ps)),
        "macro_r": float(np.mean(rs)), "macro_f1": float(np.mean(fs))})
    return {k: (round(v, 12) if isinstance(v, float) else v)
            for k, v in out.items()}


def _prf(label: np.ndarray, pred: np.ndarray) -> dict:
    """micro + macro P/R/F1 over a binary label/pred matrix."""
    tp = (label & pred).sum()
    micro_p = tp / pred.sum() if pred.sum() else 0.0
    micro_r = tp / label.sum() if label.sum() else 0.0
    micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)
                if micro_p + micro_r else 0.0)
    # macro: average over relation columns
    ps, rs, fs = [], [], []
    for c in range(label.shape[1]):
        tp_c = int((label[:, c] & pred[:, c]).sum())
        p = tp_c / pred[:, c].sum() if pred[:, c].sum() else 0.0
        r = tp_c / label[:, c].sum() if label[:, c].sum() else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        ps.append(p); rs.append(r); fs.append(f)
    return {"micro_p_05": float(micro_p), "micro_r_05": float(micro_r),
            "micro_f1_05": float(micro_f1), "macro_p": float(np.mean(ps)),
            "macro_r": float(np.mean(rs)), "macro_f1": float(np.mean(fs))}


def multilabel_eval(score_matrix: np.ndarray, label_matrix: np.ndarray,
                    rel2id: dict, threshold: float = 0.5) -> dict:
    """Multi-label sentence eval (O7, reference ``data_loader.py:375-446``).

    Args:
        score_matrix: (n_sent, n_rel) sigmoid scores.
        label_matrix: (n_sent, n_rel) 0/1 gold (``anno_relation_vec``).
    Returns PR-curve AUC + max-F1 over non-NA (sent, rel) rows, plus
    micro/macro P/R/F1 at ``threshold``. The negative label is auto-detected
    from the multi-label alias list (``data_loader.py:383``).
    """
    neg = detect_negative(rel2id, NEG_ALIASES_MULTI)
    n_rel = score_matrix.shape[1]
    pos_cols = [c for c in range(n_rel) if c != neg]
    scores = score_matrix[:, pos_cols].ravel()
    labels = label_matrix[:, pos_cols].ravel().astype(np.int64)
    order = np.argsort(-scores, kind="stable")
    hits = labels[order]
    cum = hits.cumsum()
    ranks = np.arange(1, len(hits) + 1)
    prec = cum / ranks
    total = max(int(labels.sum()), 1)
    rec = cum / total
    f1s = 2 * prec * rec / (prec + rec + 1e-20)
    out = {
        "auc": auc_trapezoid(rec, prec) if len(hits) else 0.0,
        "max_micro_f1": float(f1s.max()) if len(hits) else 0.0,
        "best_threshold": float(scores[order][f1s.argmax()]) if len(hits) else 0.0,
    }
    pred = (score_matrix[:, pos_cols] >= threshold).astype(np.int64)
    gold = label_matrix[:, pos_cols].astype(np.int64)
    out.update(_prf(gold, pred))
    # exact-match accuracy over the trained (non-NA) label columns — the
    # loss never constrains the NA logit (multi_label_sentence_re.py trains
    # labels 1..N-1 only), so it is excluded here too
    out["acc"] = float((pred == gold).all(axis=1).mean()) \
        if len(score_matrix) else 0.0
    return out


def triple_prf(pred_triples, gold_triples) -> dict:
    """Set P/R/F1 of (subj, pred, obj) triples — the north-star P/R gate."""
    p_set, g_set = set(pred_triples), set(gold_triples)
    inter = len(p_set & g_set)
    prec = inter / len(p_set) if p_set else 0.0
    rec = inter / len(g_set) if g_set else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "n_pred": len(p_set), "n_gold": len(g_set)}
