"""Pair generation: mention-annotated sentences → RE instance rows.

Stateless map_batches explode (SURVEY §7.1 ``pair_gen``). Produces the flat
columnar equivalent of the reference's instance record
(``base_encoder.py:91-98``: text + h/t {id, name, pos}), one row per ordered
candidate entity pair. Bounded fan-out: only pairs within ``max_gap``
mentions of each other, capped per sentence, so a pathological page can't
blow up a block.
"""

from __future__ import annotations

import pyarrow as pa

MAX_GAP = 2          # pair mentions at most this many mentions apart
MAX_PAIRS_PER_SENT = 8


def generate_pairs(batch: pa.Table, max_gap: int = MAX_GAP,
                   max_pairs: int = MAX_PAIRS_PER_SENT) -> pa.Table:
    """Explode each sentence's mention list into instance rows.

    Skips self-pairs (same entity id) — a triple (e, r, e) is noise for the
    graph build, mirroring how distant supervision keys bags on distinct
    (h.id, t.id) (reference ``data_loader.py:152-164``).
    """
    cols = {k: [] for k in
            ("url", "sent_idx", "text", "h_id", "h_name", "h_start", "h_end",
             "t_id", "t_name", "t_start", "t_end")}
    for url, sidx, sent, starts, ends, surfaces, eids in zip(
            batch.column("url").to_pylist(),
            batch.column("sent_idx").to_pylist(),
            batch.column("sentence").to_pylist(),
            batch.column("m_start").to_pylist(),
            batch.column("m_end").to_pylist(),
            batch.column("m_surface").to_pylist(),
            batch.column("m_entity").to_pylist()):
        n = len(starts)
        emitted = 0
        for i in range(n):
            if emitted >= max_pairs:
                break
            for j in range(i + 1, min(i + 1 + max_gap, n)):
                if eids[i] == eids[j]:
                    continue
                cols["url"].append(url)
                cols["sent_idx"].append(sidx)
                cols["text"].append(sent)
                cols["h_id"].append(eids[i])
                cols["h_name"].append(surfaces[i])
                cols["h_start"].append(starts[i])
                cols["h_end"].append(ends[i])
                cols["t_id"].append(eids[j])
                cols["t_name"].append(surfaces[j])
                cols["t_start"].append(starts[j])
                cols["t_end"].append(ends[j])
                emitted += 1
                if emitted >= max_pairs:
                    break
    return pa.table({
        "url": pa.array(cols["url"], pa.string()),
        "sent_idx": pa.array(cols["sent_idx"], pa.int32()),
        "text": pa.array(cols["text"], pa.string()),
        "h_id": pa.array(cols["h_id"], pa.string()),
        "h_name": pa.array(cols["h_name"], pa.string()),
        "h_start": pa.array(cols["h_start"], pa.int32()),
        "h_end": pa.array(cols["h_end"], pa.int32()),
        "t_id": pa.array(cols["t_id"], pa.string()),
        "t_name": pa.array(cols["t_name"], pa.string()),
        "t_start": pa.array(cols["t_start"], pa.int32()),
        "t_end": pa.array(cols["t_end"], pa.int32()),
    })
