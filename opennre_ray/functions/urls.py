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


# ---------------------------------------------------------------------------
# Domain extraction + blocklist filtering (UT1-style)
# ---------------------------------------------------------------------------

# Synthesis constants for the crawl-host corpus (SQL-replayable): hosts
# cycle 3 subdomain prefixes x 37 sites x 11 TLDs, two of them
# multi-label so registered-domain extraction is actually exercised.
CRAWL_TLDS = ("com", "org", "net", "io", "co.uk", "edu",
              "gov", "info", "biz", "co.jp", "dev")
CRAWL_SUBS = ("", "www.", "cdn.")
BLOCKED_SITES = (5, 17, 29)
MULTI_SUFFIXES = frozenset({"co.uk", "co.jp"})  # public-suffix-lite

_HOST_RE = re.compile(r"^[A-Za-z]+://([^/?#]+)")


def crawl_url(doc_id: int) -> str:
    """Deterministic crawl URL with a varied host (SQL-replayable)."""
    return (f"https://{CRAWL_SUBS[doc_id % 3]}site{doc_id % 37}"
            f".{CRAWL_TLDS[doc_id % 11]}/p/{doc_id}")


def registered_domain(host: str) -> str:
    """Registrable domain of a host: last two labels, or last three when
    the final two form a multi-label public suffix (co.uk, co.jp). A
    production build swaps MULTI_SUFFIXES for the full public-suffix
    list; the logic (longest-matching-suffix + one label) is the same."""
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def blocked_domains() -> frozenset[str]:
    """The blocklist: every TLD variant of the blocked site ids. Tiny by
    construction — at scale this is the ray.put-broadcast small side
    (UT1's adult list is ~4M entries, ~100 MB: still broadcast-sized)."""
    return frozenset(f"site{i}.{t}" for i in BLOCKED_SITES
                     for t in CRAWL_TLDS)


def domain_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (domain, tld, blocked) doc-count partials. The full
    chain runs on the URL STRING — synthesize, parse the host, extract
    the registered domain, test blocklist membership — so the oracle
    checks parsing, not just the arithmetic that generated the URL."""
    block = blocked_domains()
    doms, tlds, flags = [], [], []
    for d in batch.column("doc_id").to_pylist():
        host = _HOST_RE.match(crawl_url(d)).group(1)
        dom = registered_domain(host)
        doms.append(dom)
        tlds.append(dom.split(".", 1)[1])
        flags.append(int(dom in block))
    t = pa.table({"domain": pa.array(doms, pa.string()),
                  "tld": pa.array(tlds, pa.string()),
                  "blocked": pa.array(flags, pa.int64())})
    g = t.group_by(["domain", "tld", "blocked"]).aggregate([([], "count_all")])
    return g.rename_columns(["domain", "tld", "blocked", "n_docs"])


def domain_blocklist_stats(docs_ds) -> pd.DataFrame:
    """Blocklist report: docs per registered domain with its blocked
    flag. Partials are domain-cardinality per block (bounded by distinct
    hosts, not rows) -> one driver-sized finalize; the corpus itself
    never shuffles. Returns (domain, tld, blocked, n_docs)."""
    df = docs_ds.map_batches(domain_stats_batch,
                             batch_format="pyarrow").to_pandas()
    out = df.groupby(["domain", "tld", "blocked"], sort=False,
                     as_index=False)["n_docs"].sum()
    return out.astype({"blocked": np.int64, "n_docs": np.int64})


# ---------------------------------------------------------------------------
# Hyperlink-graph extraction (engine addition; the reference has no
# crawl-side tooling). A Common-Crawl page carries outlinks in its HTML;
# the KG-adjacent question "which sources link to which" is a two-stage
# pipeline: regex href extraction over the html bytes (row-local, streams
# at read bandwidth) -> one shuffle join edge.dst -> documents to resolve
# the target's source -> a source x source edge-count aggregate. The
# sandbox corpus has no html-with-links column, so the outlink targets are
# synthesized deterministically from doc_id (md5 draws, SQL-replayable);
# the engine still renders real markup and extracts with a real regex, so
# the plumbing under test is the one a raw crawl would use.
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(rb'href="https://docs\.test/doc/(\d+)"')
_ANCHOR_RE = re.compile(rb'href="https://docs\.test/doc/(\d+)">(\w+)</a>')

N_ANCHOR_WORDS = 40

_LINKED_PAGE = (
    b"<html><head><title>doc %d</title></head><body>"
    b"<nav>home | about</nav><p>body</p>%s"
    b"<footer>&copy; corpus</footer></body></html>"
)


def _link_u64(s: str) -> int:
    # first 8 md5 digest bytes big-endian == ('0x'||substr(md5(s),1,16))::UBIGINT
    import hashlib
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def n_outlinks(doc_id: int) -> int:
    """1-3 outlinks per page, a deterministic md5 draw."""
    return 1 + _link_u64(f"nlinks:{doc_id}") % 3


def outlink_target(doc_id: int, j: int, n_docs: int) -> int:
    """The j-th outlink's target doc index (md5 draw mod corpus size)."""
    return _link_u64(f"link:{doc_id}:{j}") % n_docs


def anchor_word(doc_id: int, j: int) -> str:
    """The j-th outlink's anchor text (md5 draw over a 40-word lexicon)."""
    return f"anchor{_link_u64(f'atext:{doc_id}:{j}') % N_ANCHOR_WORDS}"


def render_linked_html(doc_id: int, n_docs: int) -> bytes:
    """Deterministic page markup with <a> outlink anchors."""
    anchors = b"".join(
        b'<a href="https://docs.test/doc/%d">%s</a>'
        % (outlink_target(doc_id, j, n_docs),
           anchor_word(doc_id, j).encode())
        for j in range(n_outlinks(doc_id)))
    return _LINKED_PAGE % (doc_id, anchors)


def extract_links_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """(doc_id, source) -> one edge row per extracted href:
    (src_doc, src_source, dst_doc). Renders the linked page and pulls
    targets back out with the compiled href regex — the extraction is the
    real operation; the render is the sandbox's stand-in for the crawl."""
    sdocs, srcs, dsts = [], [], []
    for d, s in zip(batch.column("doc_id").to_pylist(),
                    batch.column("source").to_pylist()):
        html = render_linked_html(d, n_docs)
        for m in _HREF_RE.finditer(html):
            sdocs.append(d)
            srcs.append(s)
            dsts.append(int(m.group(1)))
    return pa.table({"src_doc": pa.array(sdocs, pa.int64()),
                     "src_source": pa.array(srcs, pa.string()),
                     "dst_doc": pa.array(dsts, pa.int64())})


def extract_anchors_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """(doc_id, ...) -> one (dst_doc, anchor) row per extracted <a> tag —
    the incoming-anchor-text stream search engines aggregate to name a
    target page. Same render-then-regex contract as
    ``extract_links_batch``."""
    dsts, anchors = [], []
    for d in batch.column("doc_id").to_pylist():
        html = render_linked_html(d, n_docs)
        for m in _ANCHOR_RE.finditer(html):
            dsts.append(int(m.group(1)))
            anchors.append(m.group(2).decode())
    return pa.table({"dst_doc": pa.array(dsts, pa.int64()),
                     "anchor": pa.array(anchors, pa.string())})
