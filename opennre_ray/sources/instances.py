"""RE-instance sources: JSONL / parquet readers for the reference's record
format, flattened to the engine's columnar schema.

The reference reads one python-literal dict per line via ``eval(line)``
(``framework/data_loader.py:26-31`` — S1). This engine reads real JSONL via
``ray.data.read_json`` (a 100 TB corpus is JSONL/parquet shards, not
eval()-able text) and flattens the nested ``h``/``t`` structs into columns,
with explicit schema validation instead of the reference's duck typing
(SURVEY §1.3).

Also provides the vectorized label encode (M5, ``data_loader.py:40-41``)
and the multi-label score expansion (M18, ``data_loader.py:387-398``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

INSTANCE_COLUMNS = ("row_id", "text", "h_id", "h_name", "h_start", "h_end",
                    "t_id", "t_name", "t_start", "t_end", "relation")


def flatten_instance_batch(batch: pa.Table) -> pa.Table:
    """Nested {text|token, h{id,name,pos}, t{...}, relation} rows → flat
    columns. Pre-tokenized rows are joined back to text (offsets stay
    token-level only if no char variant exists — mirrors the exclusive
    text/token branch, ``base_encoder.py:91-96``)."""
    def col(name):
        return (batch.column(name).to_pylist()
                if name in batch.column_names else [None] * batch.num_rows)

    texts = col("text")
    tokens = col("token")
    hs = col("h")
    ts = col("t")
    rels = col("relation")
    # annotated multi-label test rows (reference data_loader.py:154-160):
    # carried through as list columns when the source has them
    has_anno = ("anno_relation_list" in batch.column_names
                or "anno_relation_vec" in batch.column_names)
    anno_lists = col("anno_relation_list")
    anno_vecs = col("anno_relation_vec")
    out = {k: [] for k in INSTANCE_COLUMNS}
    out["is_token"] = []
    out["tokens"] = []
    for i in range(batch.num_rows):
        h, t = hs[i] or {}, ts[i] or {}
        is_tok = texts[i] is None
        out["row_id"].append(i)
        out["text"].append(" ".join(tokens[i]) if is_tok else texts[i])
        out["is_token"].append(is_tok)
        # carry the ORIGINAL token list — a token containing an internal
        # space (e.g. 'New York') must not be re-split from the joined text,
        # which would shift token-level entity offsets (reference passes
        # token lists through untouched, base_encoder.py token branch).
        # Text rows carry [] (NOT null): a mixed null/list column trips
        # Ray's automatic TensorArray cast in to_pandas; `is_token` is the
        # authoritative mode flag.
        out["tokens"].append(list(tokens[i]) if is_tok else [])
        out["h_id"].append(h.get("id", ""))
        out["h_name"].append(h.get("name", ""))
        out["h_start"].append(int(h["pos"][0]))
        out["h_end"].append(int(h["pos"][1]))
        out["t_id"].append(t.get("id", ""))
        out["t_name"].append(t.get("name", ""))
        out["t_start"].append(int(t["pos"][0]))
        out["t_end"].append(int(t["pos"][1]))
        out["relation"].append(rels[i] if rels[i] is not None else "NA")
    return pa.table({
        "row_id": pa.array(out["row_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "is_token": pa.array(out["is_token"], pa.bool_()),
        "tokens": pa.array(out["tokens"], pa.list_(pa.string())),
        "h_id": pa.array(out["h_id"], pa.string()),
        "h_name": pa.array(out["h_name"], pa.string()),
        "h_start": pa.array(out["h_start"], pa.int32()),
        "h_end": pa.array(out["h_end"], pa.int32()),
        "t_id": pa.array(out["t_id"], pa.string()),
        "t_name": pa.array(out["t_name"], pa.string()),
        "t_start": pa.array(out["t_start"], pa.int32()),
        "t_end": pa.array(out["t_end"], pa.int32()),
        "relation": pa.array(out["relation"], pa.string()),
        # non-annotated rows carry [] (not null): mixed null/list columns
        # trip Ray's TensorArray cast in to_pandas (same rule as `tokens`);
        # empty == not annotated
        **({"anno_relation_list": pa.array(
                [l if l is not None else [] for l in anno_lists],
                pa.list_(pa.string())),
            "anno_relation_vec": pa.array(
                [v if v is not None else [] for v in anno_vecs],
                pa.list_(pa.int64()))}
           if has_anno else {}),
    })


def read_instances_jsonl(path: str):
    """JSONL RE records → flat instance Dataset (S1 → Ray Data).

    Note: each flattened batch numbers row_id from 0 — add a global key
    upstream when cross-file identity matters (O9 replacement is the
    explicit row_id/url key, never positional order).
    """
    import ray.data as rd

    ds = rd.read_json(path)
    return ds.map_batches(flatten_instance_batch, batch_format="pyarrow")


def encode_labels(batch: pa.Table, rel2id: dict[str, int],
                  col: str = "relation") -> pa.Table:
    """Vectorized relation→id lookup (M5, reference ``data_loader.py:40``)."""
    ids = [rel2id[r] for r in batch.column(col).to_pylist()]
    return batch.append_column("label", pa.array(ids, pa.int64()))


def label_matrix_from_instances(df, rel2id: dict[str, int]) -> np.ndarray:
    """(n, n_rel) 0/1 gold matrix per reference ``data_loader.py:425-430``:
    annotated rows use ``anno_relation_vec`` (falling back to one-hots of
    ``anno_relation_list`` if the vec is absent), plain rows one-hot their
    single ``relation``.
    """
    n_rel = len(rel2id)
    out = np.zeros((len(df), n_rel), dtype=np.int64)
    lists = (df["anno_relation_list"].tolist()
             if "anno_relation_list" in df.columns else [None] * len(df))
    vecs = (df["anno_relation_vec"].tolist()
            if "anno_relation_vec" in df.columns else [None] * len(df))
    rels = df["relation"].tolist()
    for i, (lst, vec, rel) in enumerate(zip(lists, vecs, rels)):
        # vec wins whenever present (even without a list — sources may
        # carry only the vector form, reference data_loader.py:425-430);
        # empty ([] or None) means not annotated
        if vec is not None and len(vec):
            out[i] = np.asarray(vec, dtype=np.int64)
        elif lst is not None and len(lst):
            for r in lst:
                out[i, rel2id[r]] = 1
        else:
            out[i, rel2id[rel]] = 1
    return out


def expand_multilabel_scores(sent_ids, score_matrix: np.ndarray,
                             id2rel: dict[int, str],
                             na_id: int | None = 0) -> pa.Table:
    """Per sentence × non-NA relation score rows (M18,
    ``data_loader.py:387-398``)."""
    rows_sid, rows_rel, rows_score = [], [], []
    n, n_rel = score_matrix.shape
    for rid in range(n_rel):
        if rid == na_id:
            continue
        rows_sid.extend(sent_ids)
        rows_rel.extend([id2rel[rid]] * n)
        rows_score.extend(score_matrix[:, rid].tolist())
    return pa.table({
        "sent_id": pa.array(rows_sid),
        "relation": pa.array(rows_rel, pa.string()),
        "score": pa.array(np.asarray(rows_score, dtype=np.float32)),
    })
