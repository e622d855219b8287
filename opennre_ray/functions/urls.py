"""URL canonicalization + crawl-level dedup (engine addition; the
reference has no crawl-side tooling — its corpus arrives pre-cleaned).

A Common-Crawl-style corpus re-crawls the same page under cosmetically
different URLs: case-shifted scheme/host, tracking parameters, fragments,
trailing slashes. ``normalize_url`` collapses those variants with an
RE2-safe regex chain (character classes + anchors only, no lookarounds)
so the Python pass and the DuckDB ``regexp_replace`` oracle agree
byte-for-byte; ``url_dedup`` then keeps the earliest crawl per canonical
URL via one coarse hash-bucket shuffle (``hash_bucket_aggregate`` — key
cardinality ≈ page count, so the per-group Ray path is off the table).

The sandbox corpus has no URL column of its own, so ``messy_url``
deterministically synthesizes the raw crawl URL from ``doc_id`` (every
10th row re-crawls its predecessor's page under a different cosmetic
variant); the oracle replays the same synthesis in SQL, making the whole
messify → normalize → dedup chain value-checked end to end.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# Cosmetic-variant cycle: the m = doc_id % 5 cases below. A re-crawl row
# (doc_id % 10 == 9) shares its predecessor's base_id but lands a
# DIFFERENT variant (m differs), so dedup is exercised on distinct raw
# strings, not byte-equal ones.
_SCHEME_HOST_RE = re.compile(r"^[A-Za-z]+://[^/?#]*")


def messy_url(doc_id: int) -> str:
    """Deterministic raw crawl URL for a document row (SQL-replayable)."""
    base = doc_id - (1 if doc_id % 10 == 9 else 0)
    m = doc_id % 5
    if m == 0:
        return f"https://docs.test/page/{base}"
    if m == 1:
        return f"HTTPS://DOCS.TEST/page/{base}"
    if m == 2:
        return (f"https://docs.test/page/{base}"
                f"?utm_source=feed&utm_campaign=c{doc_id % 7}")
    if m == 3:
        return f"https://docs.test/page/{base}#sec-{doc_id % 3}"
    return f"https://docs.test/page/{base}/"


def normalize_url(url: str) -> str:
    """Canonicalize one URL: lowercase scheme+host, drop the fragment,
    strip utm_* tracking parameters (tidying any dangling '?'/'&'), and
    trim a single non-root trailing slash. Each step is one RE2-safe
    substitution mirrored verbatim in the SQL oracle."""
    m = _SCHEME_HOST_RE.match(url)
    if m:
        url = m.group(0).lower() + url[m.end():]
    url = re.sub(r"#.*$", "", url)
    url = re.sub(r"[?&]utm_[a-z]+=[A-Za-z0-9_-]*", "", url)
    url = re.sub(r"\?&", "?", url)
    url = re.sub(r"[?&]$", "", url)
    url = re.sub(r"^([A-Za-z]+://[^/]+/.*[^/])/$", r"\1", url)
    return url


def url_normalize_batch(batch: pa.Table) -> pa.Table:
    """doc_id → (doc_id, norm_url): synthesize the raw crawl URL and
    canonicalize it. Row-local, streams at read bandwidth."""
    ids = batch.column("doc_id").to_pylist()
    norm = [normalize_url(messy_url(d)) for d in ids]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "norm_url": pa.array(norm, pa.string()),
    })


def url_dedup(docs_ds, *, rows_hint: int | None = None):
    """Crawl dedup: group by canonical URL, keep the earliest crawl.

    Returns (norm_url, keeper_doc_id, n_crawls). warc_ts is monotone in
    doc_id in this corpus (sources/pages.py), so min(doc_id) IS the
    earliest crawl; a corpus with independent timestamps would carry
    warc_ts through the same aggregate and argmin on it. One coarse
    bucket shuffle — key cardinality ≈ page count at 100 TB, so this
    must be the vectorized-bucket path, never per-group."""
    from .relational import hash_bucket_aggregate

    norm = docs_ds.map_batches(url_normalize_batch, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("norm_url", sort=False).agg(
            keeper_doc_id=("doc_id", "min"),
            n_crawls=("doc_id", "size"),
        ).reset_index()
        return out.astype({"keeper_doc_id": np.int64, "n_crawls": np.int64})

    return hash_bucket_aggregate(norm, ["norm_url"], per_bucket,
                                 rows_hint=rows_hint)
