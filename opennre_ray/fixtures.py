"""Deterministic synthetic fixtures: vocabularies, relation sets, gazetteer.

The reference downloads its vocabs/checkpoints from the web
(``opennre/pretrain.py:14-124``); this sandbox has no network, so every
asset is derived deterministically here (seed-fixed, content-addressed).
The word list matches the synthetic ``documents`` corpus vocabulary in
``/root/testdata`` so the KG pipeline exercises real lookups, plus probe
tokens for OOV / CJK / accent paths.
"""

from __future__ import annotations

import hashlib

import numpy as np

# The closed vocabulary of the synthetic document corpus (31 words), plus
# generic function words. Order is load-bearing: ids are positions.
CORPUS_WORDS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

EXTRA_WORDS = [
    "of", "and", "in", "to", "was", "son", "king", "company", "founded",
    "born", "city", "country", "died", "high", "grandson",
]


def default_word2id() -> dict[str, int]:
    """Token→id map. ``[UNK]``/``[PAD]`` are appended by the encoder ctor
    (mirrors reference ``base_encoder.py:48-53`` behavior)."""
    return {w: i for i, w in enumerate(CORPUS_WORDS + EXTRA_WORDS)}


# Relation vocabulary: NA first at id 0 so negative-label auto-detection
# (reference ``data_loader.py:67-74``) has its canonical alias.
RELATIONS = [
    "NA", "father", "country", "founder_of", "part_of", "located_in",
    "member_of", "spouse", "employer", "educated_at",
]


def default_rel2id() -> dict[str, int]:
    return {r: i for i, r in enumerate(RELATIONS)}


def bert_vocab() -> dict[str, int]:
    """BERT-style vocab: specials, entity markers, whole words, ## pieces."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += [f"[unused{i}]" for i in range(6)]
    tokens += CORPUS_WORDS + EXTRA_WORDS
    # subword pieces so greedy longest-match has real work to do
    tokens += ["##s", "##ing", "##er", "##ed", "##a", "##b", "cust", "##omer",
               "win", "##dow", "str", "##eam"]
    return {t: i for i, t in enumerate(tokens)}


# ---------------------------------------------------------------------------
# Gazetteer: surface form → canonical entity id (the alias table the
# NER+linking actor pins; the reference only *declares* the NER hook,
# ``model/base_model.py:59-71`` — mention detection is new code here).
# ---------------------------------------------------------------------------

_ENTITY_SURFACES = [
    "spark", "table", "join", "hash", "stream", "window", "vector", "column",
    "row", "key", "batch", "merge", "sort", "filter", "scan", "query",
    "group", "data", "customer", "part",
]

_MULTIWORD_ALIASES = {
    # multi-token aliases resolve to the head word's entity
    "hash join": "join",
    "table scan": "scan",
    "merge sort": "sort",
    "sort merge": "merge",
    "group agg": "group",
}


def entity_id(name: str) -> str:
    """Stable synthetic entity id (Q + 7 hex digits of the name hash)."""
    return "Q" + hashlib.sha1(name.encode()).hexdigest()[:7]


# Coarse ontology over the gazetteer (every entity gets exactly one type)
# + the relation type schema — the domain/range constraints a KG-quality
# pass validates extracted triples against (violations are model errors
# by construction, exactly what a curation review queues).
ENTITY_TYPES = {
    "spark": "SYSTEM", "stream": "SYSTEM", "batch": "SYSTEM",
    "query": "SYSTEM", "window": "SYSTEM",
    "table": "DATA", "column": "DATA", "row": "DATA", "key": "DATA",
    "data": "DATA", "vector": "DATA", "part": "DATA",
    "join": "OP", "hash": "OP", "merge": "OP", "sort": "OP",
    "filter": "OP", "scan": "OP", "group": "OP",
    "customer": "AGENT",
}

#: pred → the single allowed (subj_type, obj_type) pair
RELATION_SCHEMA = {
    "father": ("AGENT", "AGENT"), "spouse": ("AGENT", "AGENT"),
    "employer": ("AGENT", "SYSTEM"), "educated_at": ("AGENT", "SYSTEM"),
    "member_of": ("AGENT", "OP"), "founder_of": ("AGENT", "SYSTEM"),
    "part_of": ("DATA", "DATA"), "located_in": ("DATA", "SYSTEM"),
    "country": ("SYSTEM", "DATA"),
}


#: class → parent class (rdfs:subClassOf edges over the coarse types) —
#: the taxonomy the RDFS-reasoning pass (kg_type_inference) closes over.
CLASS_PARENT = {
    "SYSTEM": "ARTIFACT", "DATA": "ARTIFACT",
    "OP": "PROCESS", "AGENT": "ACTOR",
    "ARTIFACT": "THING", "PROCESS": "THING", "ACTOR": "THING",
}


def class_ancestors() -> dict[str, tuple]:
    """Reflexive-transitive closure of :data:`CLASS_PARENT`:
    class → (class, parent, ..., root). Ontology-sized by construction
    (taxonomies are KBs of ~10³ classes, never corpus-sized), so the
    closure computes in-process and broadcasts."""
    out = {}
    classes = set(CLASS_PARENT) | set(CLASS_PARENT.values())
    for c in classes:
        chain, cur = [c], c
        while cur in CLASS_PARENT:
            cur = CLASS_PARENT[cur]
            if cur in chain:        # defensive: a cycle would hang
                break
            chain.append(cur)
        out[c] = tuple(chain)
    return out


def entity_type_table() -> dict[str, str]:
    """entity id → coarse type (broadcast-sized by construction)."""
    return {entity_id(s): t for s, t in ENTITY_TYPES.items()}


def default_alias_table() -> dict[str, str]:
    """surface form (normalized) → entity id."""
    table = {s: entity_id(s) for s in _ENTITY_SURFACES}
    for alias, canon in _MULTIWORD_ALIASES.items():
        table[alias] = entity_id(canon)
    return table


def seeded_glove(word2id: dict[str, int], dim: int = 50,
                 seed: int = 42) -> np.ndarray:
    """float32 (V, dim) embedding matrix (stand-in for the GloVe download,
    reference ``pretrain.py:133-134``)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((len(word2id), dim)).astype(np.float32) / np.sqrt(dim)


# ---------------------------------------------------------------------------
# Page synthesis: wrap document rows in deterministic HTML so the
# extraction stage has a byte-exact inverse to verify against
# (BASELINE input_hint: url, warc_ts, html, text, lang).
# ---------------------------------------------------------------------------

HTML_TEMPLATE = (
    "<html><head><title>doc {doc_id}</title>"
    '<meta charset="utf-8"><script>var x=1;</script></head>'
    "<body><nav>home | about</nav><p>{text}</p>"
    "<footer>&copy; corpus</footer></body></html>"
)


def page_url(source: str, doc_id: int) -> str:
    return f"https://docs.test/{source}/{doc_id}"


def render_html(doc_id: int, text: str) -> bytes:
    """Deterministic page markup; body text HTML-escaped."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return HTML_TEMPLATE.format(doc_id=doc_id, text=esc).encode("utf-8")
