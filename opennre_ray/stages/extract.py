"""HTML → text extraction stage (stateless map_batches).

The reference assumes plain sentences as input (``data_loader.py:26-31``);
the KG build's web corpus needs a trafilatura-equivalent extraction step
whose output is **byte-identical per url** across retries/partitions
(north-star invariant). The extractor is a pure, versioned function:
bump ``EXTRACTOR_VERSION`` on any behavior change so lineage rows record
which extractor produced a partition.
"""

from __future__ import annotations

import re

import pyarrow as pa

EXTRACTOR_VERSION = "1"

# Block-level content we keep: paragraph bodies. Boilerplate containers
# (head/script/style/nav/footer/header/aside) are removed wholesale first.
_BOILERPLATE = re.compile(
    rb"<(script|style|head|nav|footer|header|aside)\b.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_PARAGRAPH = re.compile(rb"<p\b[^>]*>(.*?)</p\s*>", re.DOTALL | re.IGNORECASE)
_TAG = re.compile(rb"<[^>]+>")

_ENTITIES = [
    (b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
    (b"&#39;", b"'"), (b"&nbsp;", b" "), (b"&amp;", b"&"),  # &amp; LAST
]


def extract_text(html: bytes) -> str:
    """Extract readable text from page markup. Pure and deterministic.

    Strategy: drop boilerplate containers, take <p> bodies in document order
    joined by blank lines, strip residual inline tags, unescape entities.
    Falls back to whole-body tag-strip when a page has no <p> blocks.
    """
    body = _BOILERPLATE.sub(b"", html)
    paras = _PARAGRAPH.findall(body)
    if not paras:
        paras = [_TAG.sub(b" ", body)]
    out = b"\n\n".join(_TAG.sub(b" ", p) for p in paras)
    for ent, ch in _ENTITIES:
        out = out.replace(ent, ch)
    return out.decode("utf-8", "replace")


class ExtractText:
    """map_batches UDF: pages(url, html, ...) → +text, -html.

    Drops the (potentially MB-sized) ``html`` column immediately after
    extraction so downstream blocks stay small (SURVEY §7.4 item 7).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.array(
            [extract_text(h) for h in batch.column("html").to_pylist()],
            type=pa.string(),
        )
        keep = [c for c in batch.column_names if c != "html"]
        out = batch.select(keep)
        return out.append_column("text", texts)
