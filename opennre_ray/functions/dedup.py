"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only distinct is the fact set (``data_loader.py:151-164``);
a web-scale corpus additionally needs document-level near-dedup. All
operators follow the same scale shape:

  vectorized per-batch signature → (small) shuffle on signature keys →
  per-group resolution

so no stage ever holds the corpus; the shuffles move signatures, not
documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                carry_cols: list[str] | None = None,
                rows_hint: int | None = None):
    """Keep the min-key row per identical text: hash-partition + per-group min.

    The md5 column keeps the shuffle key small (16 bytes vs document bytes);
    per-group resolution runs through coarse hash buckets (one vectorized
    pandas groupby per bucket) since group count ≈ corpus size.

    Default output: (content_md5, key). With ``carry_cols``, the keeper ROW
    survives with those columns attached (e.g. the text itself for a
    downstream pipeline) — the shuffle then moves the carried columns too.
    """

    from .relational import hash_bucket_aggregate

    carry = list(carry_cols or [])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest()
             for t in batch.column(text_col).to_pylist()]
        cols = {"content_md5": pa.array(h, pa.string()),
                key_col: batch.column(key_col)}
        for c in carry:
            cols[c] = batch.column(c)
        return pa.table(cols)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    if not carry:
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("content_md5", as_index=False)[key_col].min()
    else:
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return (g.sort_values(key_col)
                    .drop_duplicates("content_md5")[[key_col] + carry])

    return hash_bucket_aggregate(hashed, ["content_md5"], per_bucket,
                                 rows_hint=rows_hint)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of word k-shingles.

    Shingle hash = first 8 md5 bytes (same convention as
    :func:`_word_hash64`) so the whole MinHash pipeline is computable by a
    SQL engine and thus value-oracle-able end to end."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i: i + k]) for i in range(len(words) - k + 1)]
    out = {int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
           for g in grams}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 3) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature via tabulated affine permutations."""
    sh = shingle_hashes(text, k)
    if len(sh) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (P, S) affine transform mod Mersenne prime, min over shingles
    vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHashLSH:
    """map_batches stage: doc → (band_id, band_hash, doc_id) rows.

    ``num_perm = bands * rows_per_band``. Docs sharing any band bucket are
    near-dup candidates; the groupby on (band_id, band_hash) is the shuffle.
    """

    def __init__(self, num_bands: int = 16, rows_per_band: int = 4,
                 shingle_k: int = 3, text_col: str = "text",
                 key_col: str = "doc_id"):
        self.num_bands = num_bands
        self.rows = rows_per_band
        self.k = shingle_k
        self.text_col = text_col
        self.key_col = key_col
        self.a, self.b = _minhash_params(num_bands * rows_per_band)

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, keys = [], [], []
        for key, text in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            sig = minhash_signature(text, self.a, self.b, self.k)
            for bi in range(self.num_bands):
                band = sig[bi * self.rows: (bi + 1) * self.rows]
                band_hashes.append(hashlib.blake2b(
                    band.tobytes(), digest_size=8).hexdigest())
                band_ids.append(bi)
                keys.append(key)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
            self.key_col: pa.array(keys),
        })


def minhash_duplicate_groups(ds, *, num_bands=16, rows_per_band=4,
                             shingle_k=3, text_col="text", key_col="doc_id"):
    """Docs → (doc_id, dup_group) for docs sharing ≥1 LSH band bucket.

    dup_group = min doc key in the bucket (single-round min-label propagation;
    buckets overlapping through a shared doc resolve via a second small
    groupby on doc). Returns only docs that hit at least one non-singleton
    bucket.
    """

    from .relational import hash_bucket_aggregate

    bands = ds.map_batches(
        MinHashLSH(num_bands, rows_per_band, shingle_k, text_col, key_col),
        batch_format="pyarrow")

    # ~docs × bands distinct (band_id, band_hash) groups → bucketed resolve
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        roots = g.groupby(["band_id", "band_hash"])[key_col].transform("min")
        sizes = g.groupby(["band_id", "band_hash"])[key_col].transform("size")
        hit = g[sizes >= 2]
        return pd.DataFrame({key_col: hit[key_col],
                             "dup_group": roots[sizes >= 2]})

    cand = hash_bucket_aggregate(bands, ["band_id", "band_hash"],
                                 bucket_pairs)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)["dup_group"].min()

    return hash_bucket_aggregate(cand, [key_col], resolve)


def lsh_candidate_pairs(ds, *, num_bands=16, rows_per_band=4,
                        shingle_k=3, text_col="text", key_col="doc_id",
                        rows_hint: int | None = None):
    """Distinct candidate pairs (a < b) sharing ≥1 MinHash-LSH band
    bucket — the raw candidate set BEFORE any verification, which is what
    an LSH recall/precision audit scores. One bucketed shuffle on
    (band_id, band_hash) with vectorized in-bucket pair expansion + one
    distinct-pair aggregate (the same shape as ``simhash_dedup_pairs``;
    a bucket of f docs costs f² candidate rows, bounded by band width)."""
    from .relational import compute_n_buckets, hash_bucket_aggregate

    n_buckets = compute_n_buckets(rows_hint)
    bands = ds.map_batches(
        MinHashLSH(num_bands, rows_per_band, shingle_k, text_col, key_col),
        batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
        m = m[m[f"{key_col}_a"] < m[f"{key_col}_b"]]
        return pd.DataFrame({
            "a": m[f"{key_col}_a"].to_numpy(np.int64),
            "b": m[f"{key_col}_b"].to_numpy(np.int64)}).drop_duplicates()

    cand = hash_bucket_aggregate(bands, ["band_id", "band_hash"],
                                 bucket_pairs, n_buckets=n_buckets)
    return hash_bucket_aggregate(
        cand, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]),
        n_buckets=n_buckets)


def minhash_dedup_clusters(ds, *, num_bands=16, rows_per_band=4,
                           shingle_k=3, text_col="text", key_col="doc_id",
                           rows_hint: int | None = None):
    """TRANSITIVE near-dedup clustering — the production dedup shape
    (Gopher / RefinedWeb): LSH band buckets → doc↔bucket star edges →
    distributed connected components → one canonical keeper per cluster.

    ``minhash_duplicate_groups`` is one-hop (per-bucket min): a doc chained
    to the cluster root only through another doc's bucket keeps a local
    root. Here the bucket graph's components give the closure. Star edges
    (doc node → bucket node) keep the edge count LINEAR in bucket
    membership — the O(n²) in-bucket pair list is never materialized, a
    hot bucket (boilerplate page duplicated 10⁶ times) costs 10⁶ edges,
    not 10¹². Every doc also gets a self-edge so singletons survive CC and
    come back as their own cluster.

    Returns (key_col, cluster, keep) for EVERY doc: cluster = min doc key
    in the component, keep = (doc == cluster) — filter on ``keep`` to
    deduplicate, or group on ``cluster`` to inspect near-dup families.
    """
    import pyarrow.compute as pc

    from .relational import compute_n_buckets, hash_bucket_aggregate

    n_buckets = compute_n_buckets(rows_hint)
    bands = ds.map_batches(
        MinHashLSH(num_bands, rows_per_band, shingle_k, text_col, key_col),
        batch_format="pyarrow")

    # membership rows in multi-doc buckets only (singleton buckets carry
    # no dedup signal and would inflate the edge set ~bands×)
    def multi_memberships(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band_id", "band_hash"])[key_col] \
            .transform("size")
        hit = g[sizes >= 2]
        return pd.DataFrame({
            "subj": "D" + hit[key_col].astype(str),
            "obj": "B" + hit["band_id"].astype(str) + ":"
                   + hit["band_hash"],
        })

    memb = hash_bucket_aggregate(bands, ["band_id", "band_hash"],
                                 multi_memberships, n_buckets=n_buckets)

    def self_edges(batch: pa.Table) -> pa.Table:
        d = pc.binary_join_element_wise(
            pa.scalar("D"), pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""))
        return pa.table({"subj": d, "obj": d})

    edges = memb.union(ds.map_batches(self_edges, batch_format="pyarrow"))
    return components_keeper(edges, key_col, key_prefix="D",
                             n_buckets=n_buckets)


def components_keeper(edges_ds, key_col: str, *, key_prefix: str = "K",
                      n_buckets: int | None = None):
    """Shared clustering tail for entity resolution / near-dedup: run
    distributed connected components over prefixed string edges (key
    nodes are ``key_prefix + str(int key)``; other node prefixes — e.g.
    LSH bucket nodes — are allowed and dropped on the way back), then
    per-component NUMERIC min as the canonical keeper (the string
    component label can be a non-key node or lexicographically wrong —
    "D10" < "D2" — so it is never the rep) and a bucketed join back.
    Include a self-edge per key so singletons survive. Returns
    (key_col, cluster, keep) for every key.
    """
    import pyarrow.compute as pc

    from .graph import connected_components
    from .relational import hash_bucket_aggregate, shuffle_join

    labels = connected_components(edges_ds)

    def to_keys(t: pa.Table) -> pa.Table:
        ent = t.column("entity")
        t = t.filter(pc.starts_with(ent, key_prefix))
        key = pc.cast(pc.utf8_slice_codeunits(t.column("entity"),
                                              len(key_prefix),
                                              2 ** 31 - 1), pa.int64())
        return pa.table({key_col: key, "component": t.column("component")})

    keys_lbl = labels.map_batches(to_keys, batch_format="pyarrow")

    def comp_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("component", as_index=False)[key_col].min() \
            .rename(columns={key_col: "cluster"})

    mins = hash_bucket_aggregate(keys_lbl, ["component"], comp_min,
                                 n_buckets=n_buckets)
    joined = shuffle_join(keys_lbl, mins, "component", "component",
                          [key_col], ["cluster"], n_buckets=n_buckets)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: batch[key_col].astype("int64"),
            "cluster": batch["cluster"].astype("int64"),
            "keep": batch[key_col].to_numpy() ==
                    batch["cluster"].to_numpy()})

    return joined.map_batches(finalize, batch_format="pandas")


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Classic two-row DP edit distance; with ``cap`` the function
    early-exits (returning ``cap + 1``) as soon as a full DP row's
    minimum exceeds ``cap`` — rows are still computed in full, but the
    result is exact for all distances ≤ cap (enough for thresholded
    joins)."""
    if a == b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    if cap is not None and len(b) - len(a) > cap:
        return cap + 1
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        lo = j  # row minimum for the early exit
        for i, ca in enumerate(a, 1):
            v = min(prev[i] + 1, cur[i - 1] + 1,
                    prev[i - 1] + (ca != cb))
            cur.append(v)
            lo = min(lo, v)
        if cap is not None and lo > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    """Jaro similarity, the DuckDB/rapidfuzz formulation: match window
    ``max(len)/2 - 1``, greedy left-to-right matching, transpositions =
    the count of order-mismatched matched characters FLOOR-halved
    (rapidfuzz, which DuckDB vendors, uses integer division — an odd
    mismatch count rounds down), score ``(m/|a| + m/|b| + (m-t)/m)/3``."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t_full = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t_full += 1
            j += 1
    t = t_full // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: boost by the common prefix (capped at 4 chars) when
    the Jaro score clears the standard 0.7 threshold — DuckDB's
    ``jaro_winkler_similarity`` defaults, verified pairwise against
    DuckDB in tests (the alias-match oracle depends on bit-parity at
    6-decimal rounding)."""
    sim = jaro(a, b)
    if sim > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return sim


def _dist_le1(a: str, b: str) -> int | None:
    """Edit distance if ≤ 1, else None — O(len) scans instead of the
    full DP (~118 µs → ~3 µs per pair; the max_dist=1 verify is the
    hot loop of the blocked self-join)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return None
        return 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return None
    i = j = 0
    skipped = False
    while i < la:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not skipped:
            skipped = True
            j += 1
        else:
            return None
    return 1


def edit_distance_self_join(ds, *, id_col: str, str_col: str,
                            block_fn=None, max_dist: int = 1,
                            rows_hint: int | None = None):
    """Blocked string-similarity self-join (typo-tolerant record
    linkage): emit pairs of rows whose strings are within ``max_dist``
    edits, restricted to pairs sharing a block key (default: the string
    minus its last character — the standard blocking tradeoff, cross-
    block matches are out of scope by construction and documented as
    such). One bucketed shuffle on the block key; the banded Levenshtein
    verify runs only inside blocks, never corpus-wide. Pairs come out
    normalized (id_a < id_b) with the exact distance.
    """
    from .relational import hash_bucket_aggregate

    block = block_fn or (lambda s: s[:-1] if s else s)

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_blk": [block(s) for s in df[str_col]],
            id_col: df[id_col], str_col: df[str_col]})

    out_cols = ["id_a", "id_b", "dist"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("_blk", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy()
            ss = grp[str_col].tolist()
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    if max_dist == 1:
                        d = _dist_le1(ss[i], ss[j])
                        if d is not None:
                            rows.append((ids[i], ids[j], d))
                        continue
                    d = levenshtein(ss[i], ss[j], cap=max_dist)
                    if d <= max_dist:
                        rows.append((ids[i], ids[j], d))
        if not rows:
            return pd.DataFrame({c: [] for c in out_cols})
        return pd.DataFrame(rows, columns=out_cols)

    return hash_bucket_aggregate(
        ds.map_batches(add_block, batch_format="pandas"), ["_blk"],
        per_bucket, rows_hint=rows_hint)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _word_hash64(w: str) -> int:
    """First 8 md5 bytes as uint64 — chosen because BOTH engines can
    compute it (`('0x' || substr(md5(w),1,16))::UBIGINT` in DuckDB), which
    makes SimHash fully value-oracle-able."""
    # == int(hexdigest()[:16], 16) but without the hex round-trip
    return int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str, _cache: dict = {}) -> int:
    """64-bit SimHash over whitespace tokens (unit weights).

    Word hashes are cached per worker (Zipfian vocab → most lookups hit),
    and the ±1 bit accumulation is one vectorized pass per document.
    """
    words = text.split()
    if not words:
        return 0
    hs = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = _cache.get(w)
        if h is None:
            if len(_cache) > 250_000:
                _cache.clear()
            h = _cache[w] = _word_hash64(w)
        hs[i] = h
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)   # (W, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHashStage:
    """map_batches stage: doc → (doc_id, simhash, band0..band3).

    The 4 × 16-bit bands support Hamming-distance ≤3 candidate search via
    exact-match on any band (pigeonhole)."""

    def __init__(self, text_col="text", key_col="doc_id"):
        self.text_col = text_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch.column(self.text_col).to_pylist()]
        arr = np.array(hashes, dtype=np.uint64)
        out = {self.key_col: batch.column(self.key_col),
               "simhash": pa.array(arr)}
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((arr >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint32))
        return pa.table(out)


#: byte-wise popcount LUT (numpy 1.26 has no ``bitwise_count``)
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of an int64/uint64 array via the byte LUT."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return _POPCNT8[b].sum(axis=1)


def simhash_dedup_pairs(ds, *, max_hamming: int = 3, text_col: str = "text",
                        key_col: str = "doc_id",
                        rows_hint: int | None = None):
    """SimHash near-dup pairs (the Manku et al. WWW'07 crawl-dedup shape):
    64-bit SimHash → 4 × 16-bit band tables → exact band match candidates
    → popcount verify. Hamming ≤ 3 guarantees (pigeonhole over 4 bands)
    that at least one band matches exactly, so band equality is a LOSSLESS
    candidate filter at the default threshold.

    Scale shape: one membership expansion (4 rows/doc), ONE bucketed
    shuffle on (band_id, band_val) with vectorized in-bucket pair
    expansion (self-merge), then a distinct-pair aggregate — never an
    all-pairs product. Zero signatures (token-less docs or all-tie votes)
    are dropped: they carry no near-dup signal and would cross-pair every
    empty doc quadratically. A band value shared by f docs costs f²
    candidate pairs; at web scale widen the bands (more, wider tables) to
    bound f — the band width is the load knob, the pipeline shape stays.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤
    ``max_hamming``.
    """
    from .relational import compute_n_buckets, hash_bucket_aggregate

    n_buckets = compute_n_buckets(rows_hint)
    sig = ds.map_batches(SimHashStage(text_col, key_col),
                         batch_format="pyarrow")

    def memberships(batch: pa.Table) -> pd.DataFrame:
        arr = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        keep = arr != 0
        sh = arr[keep].view(np.int64)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)[keep] \
            .astype(np.int64)
        n = len(sh)
        band_id = np.repeat(np.arange(4, dtype=np.int64), n)
        vals = np.concatenate([
            ((sh.view(np.uint64) >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            .astype(np.int64) for b in range(4)]) if n else \
            np.empty(0, np.int64)
        return pd.DataFrame({"band_id": band_id,
                             "band_val": vals,
                             key_col: np.tile(keys, 4),
                             "sig": np.tile(sh, 4)})

    memb = sig.map_batches(memberships, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_val"], suffixes=("_a", "_b"))
        m = m[m[f"{key_col}_a"] < m[f"{key_col}_b"]]
        if not len(m):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ham = _popcount64(np.bitwise_xor(m["sig_a"].to_numpy(np.int64),
                                         m["sig_b"].to_numpy(np.int64)))
        hit = ham <= max_hamming
        return pd.DataFrame({"doc_a": m[f"{key_col}_a"].to_numpy()[hit],
                             "doc_b": m[f"{key_col}_b"].to_numpy()[hit],
                             "hamming": ham[hit]})

    cand = hash_bucket_aggregate(memb, ["band_id", "band_val"],
                                 bucket_pairs, n_buckets=n_buckets)

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    return hash_bucket_aggregate(cand, ["doc_a", "doc_b"], distinct,
                                 n_buckets=n_buckets)


# ---------------------------------------------------------------------------
# N-gram Jaccard verification
# ---------------------------------------------------------------------------

def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard similarity."""
    a = set(map(int, shingle_hashes(text_a, k)))
    b = set(map(int, shingle_hashes(text_b, k)))
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def verify_candidates(ds_docs, candidates, threshold=0.8, k=3,
                      text_col="text", key_col="doc_id"):
    """Filter candidate pairs by exact Jaccard.

    ``candidates``: list of (key_a, key_b). The doc texts for the candidate
    set are fetched via a broadcast dict (candidate sets are small relative
    to the corpus by construction).
    """
    import ray

    wanted = {a for a, _ in candidates} | {b for _, b in candidates}

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.is_in(batch.column(key_col),
                     value_set=pa.array(list(wanted)))
        return batch.filter(m).select([key_col, text_col])

    texts = {}
    for b in ds_docs.map_batches(project,
                                 batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for key, t in zip(b.column(key_col).to_pylist(),
                          b.column(text_col).to_pylist()):
            texts[key] = t
    out = []
    for a, b_ in candidates:
        sim = jaccard(texts.get(a, ""), texts.get(b_, ""), k)
        if sim >= threshold:
            out.append((a, b_, sim))
    return out


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_groups(ds_emb, threshold=0.98, key_col="vec_id",
                         vec_col="embedding", n_planes=12, seed=11):
    """Near-dup via random-hyperplane LSH buckets + in-bucket cosine verify.

    Vectors whose signs agree on all ``n_planes`` random projections land in
    one bucket; exact cosine runs only within buckets (each a tiny dense
    matmul). Returns (vec_id, dup_group) rows for verified members.
    """

    class PlaneSig:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .similarity import _as_matrix
            mat = _as_matrix(batch.column(vec_col), dtype=np.float32)
            # planes are a pure function of (dim, seed) so a cached stage
            # instance shared across datasets of different dims stays correct
            if self.planes is None or self.planes.shape[0] != mat.shape[1]:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal(
                    (mat.shape[1], n_planes)).astype(np.float32)
            bits = (mat @ self.planes) > 0
            sig = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            return pa.table({
                key_col: batch.column(key_col),
                "bucket": pa.array(sig.astype(np.int64)),
                vec_col: batch.column(vec_col),
            })

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({key_col: [], "dup_group": []})
        mat = np.stack(g[vec_col].to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        keys = g[key_col].to_numpy()
        # union-find over SIMILAR PAIRS only — a flat min(members) root
        # would merge disjoint duplicate pairs that merely share a bucket
        parent = {k: k for k in keys}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if sims[i, j] >= threshold:
                    ri, rj = find(keys[i]), find(keys[j])
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
                    touched.add(keys[i])
                    touched.add(keys[j])
        if not touched:
            return pd.DataFrame({key_col: [], "dup_group": []})
        mm = sorted(touched)
        return pd.DataFrame({key_col: mm,
                             "dup_group": [find(k) for k in mm]})

    def plane_sig_batch(batch):
        from ..stages.score import cached

        stage = cached(("planesig", n_planes, seed, vec_col, key_col),
                       PlaneSig)
        return stage(batch)

    sig = ds_emb.map_batches(plane_sig_batch, batch_format="pyarrow")
    return sig.groupby("bucket").map_groups(in_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Eval-set decontamination
# ---------------------------------------------------------------------------

#: distinct eval-shingle count above which the filter set stops being an
#: exact broadcast array and degrades to a Bloom filter (conservative:
#: Bloom false positives over-REMOVE, never leak contamination). Same
#: budget reasoning as relational.ANTI_JOIN_BROADCAST_LIMIT.
DECONTAM_BROADCAST_LIMIT = 50_000_000


def decontaminate(docs_ds, eval_ds, *, k: int = 13,
                  text_col: str = "text", key_col: str = "doc_id",
                  broadcast_limit: int = DECONTAM_BROADCAST_LIMIT):
    """Remove corpus documents sharing any word ``k``-gram with an eval set
    (the GPT-3/Llama-style n-gram decontamination pass an LLM training
    pipeline runs before pretraining).

    Scale shape: the EVAL side is small by definition — its distinct
    shingle hashes (the same md5-derived 64-bit hashes the MinHash
    pipeline uses, so the operator is SQL-replayable) are collected once
    and broadcast as a sorted uint64 array; each corpus batch then does
    one vectorized ``np.isin`` over its concatenated shingles and a
    segment-wise any-reduction. No shuffle of the corpus at all. Above
    ``broadcast_limit`` distinct eval shingles the exact set degrades to
    a mergeable Bloom filter (false positives over-remove a ~0.1% sliver
    of clean docs — conservative by construction; contamination can never
    leak through, since Bloom has no false negatives).

    Returns the CLEAN rows of ``docs_ds`` (key + text columns).
    """
    import ray

    # distinct eval shingle hashes: per-batch set union → tiny driver merge
    def batch_shingles(b: pa.Table) -> pa.Table:
        out = set()
        for t in b.column(text_col).to_pylist():
            out.update(shingle_hashes(t, k).tolist())
        return pa.table({"h": pa.array(sorted(out), pa.uint64())})

    parts = eval_ds.map_batches(batch_shingles, batch_format="pyarrow")
    eval_hashes = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        eval_hashes.update(b.column("h").to_pylist())

    use_bloom = len(eval_hashes) > broadcast_limit
    if use_bloom:
        from .sketches import Bloom
        n_bits = max(1 << 20, 16 * len(eval_hashes))
        bloom = Bloom(n_bits)
        bloom.add_many(list(map(str, eval_hashes)))
        ref = ray.put((True, bloom.to_bytes(), n_bits))
    else:
        arr = np.fromiter(eval_hashes, dtype=np.uint64,
                          count=len(eval_hashes))
        arr.sort()
        ref = ray.put((False, arr, None))
    ref_key = ref.hex()

    def keep_clean(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        def load():
            is_bloom, payload, bits = ray.get(ref)
            if is_bloom:
                from .sketches import Bloom
                return (True, Bloom.from_bytes(payload, bits))
            return (False, payload)

        is_bloom, filt = cached(("decontam", ref_key), load)
        texts = batch.column(text_col).to_pylist()
        if not texts:
            return batch.select([key_col, text_col])
        sh = [shingle_hashes(t, k) for t in texts]
        flat = np.concatenate(sh) if sh else np.empty(0, np.uint64)
        if is_bloom:
            hit = np.asarray(filt.contains_many(
                [str(int(h)) for h in flat]), dtype=bool)
        else:
            hit = np.isin(flat, filt)
        lens = np.fromiter((len(s) for s in sh), dtype=np.int64,
                           count=len(sh))
        seg = np.repeat(np.arange(len(sh)), lens)
        contaminated = np.zeros(len(sh), dtype=bool)
        np.logical_or.at(contaminated, seg[hit], True)
        return batch.filter(pa.array(~contaminated)).select(
            [key_col, text_col])

    return docs_ds.map_batches(keep_clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document duplicated spans (exact-substring dedup primitive)
# ---------------------------------------------------------------------------

def positional_shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit md5 hash of the word k-gram at EVERY position (one per
    start offset, duplicates kept — unlike :func:`shingle_hashes`).
    Docs with fewer than ``k`` tokens emit no spans. int64 view of the
    uint64 hash (bit-reinterpreted) so downstream pandas groupbys stay on
    a native dtype."""
    words = text.split()
    if len(words) < k:
        return np.empty(0, dtype=np.int64)
    grams = (" ".join(words[i: i + k]) for i in range(len(words) - k + 1))
    return np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8],
                        "big") for g in grams),
        dtype=np.uint64, count=len(words) - k + 1).view(np.int64)


def duplicated_spans(docs_ds, *, k: int = 8, text_col: str = "text",
                     key_col: str = "doc_id", rows_hint: int | None = None,
                     broadcast_limit: int = DECONTAM_BROADCAST_LIMIT):
    """Per-document count of k-gram spans that also appear in ANOTHER
    document — the detection half of exact-substring dedup (the
    "deduplicating training data" span-redaction pass): spans whose
    k-gram has cross-document frequency ≥ 2 are boilerplate/copy
    candidates.

    Scale shape, two passes, corpus never shuffled:
    1. document-frequency per shingle hash: each batch emits its docs'
       DISTINCT hashes (one row per (doc, hash)), a bucketed aggregate
       sums doc-frequency AND filters to df ≥ 2 inside the bucket — only
       actual duplicates (typically a tiny fraction) leave the shuffle.
    2. the dup-hash set broadcasts (sorted int64 array under
       ``broadcast_limit``, else a Bloom filter — false positives only
       over-flag, never miss a real duplicate span), and each batch
       counts span membership vectorized (np.isin).

    Returns (key_col, n_spans, n_dup_spans) — all int64.
    """
    import ray

    from .relational import hash_bucket_aggregate

    def doc_hash_partial(batch: pa.Table) -> pa.Table:
        hs = []
        for t in batch.column(text_col).to_pylist():
            u = np.unique(positional_shingle_hashes(t, k))
            hs.append(u)
        n = [len(u) for u in hs]
        return pa.table({
            "h": pa.array(np.concatenate(hs) if hs else
                          np.empty(0, np.int64)),
            "df": pa.array(np.ones(int(sum(n)), dtype=np.int64))})

    def dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", as_index=False, sort=False)["df"].sum()
        return s[s["df"] >= 2][["h"]]

    dup = hash_bucket_aggregate(
        docs_ds.map_batches(doc_hash_partial, batch_format="pyarrow"),
        ["h"], dup_bucket, rows_hint=rows_hint)

    dup_hashes: list[int] = []
    for b in dup.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            dup_hashes.extend(b.column("h").to_pylist())

    use_bloom = len(dup_hashes) > broadcast_limit
    if use_bloom:
        from .sketches import Bloom
        n_bits = max(1 << 20, 16 * len(dup_hashes))
        bloom = Bloom(n_bits)
        bloom.add_many(list(map(str, dup_hashes)))
        ref = ray.put((True, bloom.to_bytes(), n_bits))
    else:
        arr = np.array(sorted(dup_hashes), dtype=np.int64)
        ref = ray.put((False, arr, None))

    def count_spans(batch: pa.Table) -> pa.Table:
        is_bloom, payload, n_bits = ray.get(ref)
        if is_bloom:
            from .sketches import Bloom
            filt = Bloom.from_bytes(payload, n_bits)
        n_spans, n_dup = [], []
        for t in batch.column(text_col).to_pylist():
            hs = positional_shingle_hashes(t, k)
            n_spans.append(len(hs))
            if is_bloom:
                n_dup.append(int(filt.contains_many(
                    [str(h) for h in hs.tolist()]).sum()))
            else:
                n_dup.append(int(np.isin(hs, payload).sum()))
        return pa.table({
            key_col: batch.column(key_col),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_dup_spans": pa.array(n_dup, pa.int64())})

    return docs_ds.map_batches(count_spans, batch_format="pyarrow")


def _segment_hashes(text: str, w: int) -> tuple[list[str], np.ndarray]:
    """Non-overlapping ``w``-word segments of ``text`` (last may be short)
    plus the md5-derived 64-bit hash of each segment string (int64 view,
    same hash family as the MinHash/decontam operators so the op stays
    SQL-replayable)."""
    words = text.split()
    if not words:
        return [], np.empty(0, dtype=np.int64)
    segs = [" ".join(words[i: i + w]) for i in range(0, len(words), w)]
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
         for s in segs), dtype=np.uint64, count=len(segs)).view(np.int64)
    return segs, hs


def paragraph_dedup(docs_ds, *, w: int = 10, text_col: str = "text",
                    key_col: str = "doc_id", rows_hint: int | None = None,
                    broadcast_limit: int = DECONTAM_BROADCAST_LIMIT):
    """CCNet-style duplicated-paragraph removal with document reassembly
    (Wenzek et al. 2020, public): cut each document into non-overlapping
    ``w``-word segments (the "paragraph" unit for this corpus — the
    synthetic pages carry no newline structure), drop every segment whose
    exact text occurs ≥ 2 times anywhere in the corpus (boilerplate by
    definition — all copies go, not just the later ones), and rejoin the
    surviving segments in document order.

    Scale shape mirrors :func:`duplicated_spans` — the corpus is never
    shuffled:
    1. segment-frequency pass: each batch emits per-segment-hash partial
       COUNTS (np.unique combiner), a bucketed aggregate sums them and
       keeps only count ≥ 2 hashes inside the bucket.
    2. the dup-hash set broadcasts (sorted int64 array under
       ``broadcast_limit``, else a Bloom filter — Bloom false positives
       over-remove a ~0.1% sliver, never let a duplicate through) and each
       batch rebuilds its docs from the kept segments, vectorized isin.

    Returns (key_col, clean_text, n_units, n_removed).
    """

    from .relational import hash_bucket_aggregate

    def seg_count_partial(batch: pa.Table) -> pa.Table:
        hs = [_segment_hashes(t, w)[1]
              for t in batch.column(text_col).to_pylist()]
        flat = np.concatenate(hs) if hs else np.empty(0, np.int64)
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"h": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    def dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", as_index=False, sort=False)["cnt"].sum()
        return s[s["cnt"] >= 2][["h"]]

    dup = hash_bucket_aggregate(
        docs_ds.map_batches(seg_count_partial, batch_format="pyarrow"),
        ["h"], dup_bucket, rows_hint=rows_hint)

    dup_hashes: list[int] = []
    for b in dup.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            dup_hashes.extend(b.column("h").to_pylist())

    import ray

    use_bloom = len(dup_hashes) > broadcast_limit
    if use_bloom:
        from .sketches import Bloom
        n_bits = max(1 << 20, 16 * len(dup_hashes))
        bloom = Bloom(n_bits)
        bloom.add_many(list(map(str, dup_hashes)))
        ref = ray.put((True, bloom.to_bytes(), n_bits))
    else:
        arr = np.array(sorted(dup_hashes), dtype=np.int64)
        ref = ray.put((False, arr, None))

    def rebuild(batch: pa.Table) -> pa.Table:
        is_bloom, payload, n_bits = ray.get(ref)
        if is_bloom:
            from .sketches import Bloom
            filt = Bloom.from_bytes(payload, n_bits)
        clean, n_units, n_removed = [], [], []
        for t in batch.column(text_col).to_pylist():
            segs, hs = _segment_hashes(t, w)
            if is_bloom:
                drop = np.asarray(filt.contains_many(
                    [str(int(h)) for h in hs.tolist()]), dtype=bool)
            else:
                drop = np.isin(hs, payload)
            clean.append(" ".join(
                s for s, d in zip(segs, drop) if not d))
            n_units.append(len(segs))
            n_removed.append(int(drop.sum()))
        return pa.table({
            key_col: batch.column(key_col),
            "clean_text": pa.array(clean, pa.string()),
            "n_units": pa.array(n_units, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64())})

    return docs_ds.map_batches(rebuild, batch_format="pyarrow")


def semantic_dedup(ds_emb, *, k: int = 8, iters: int = 3,
                   threshold: float = 0.45, id_col: str = "vec_id",
                   vec_col: str = "embedding", rows_hint: int | None = None):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with k-means, then inside each cluster drop any
    vector whose cosine to a LOWER-id cluster-mate reaches ``threshold``
    (the lowest id of a near-dup set survives — deterministic keeper).

    Scale shape: the pairwise cosine never runs globally — k-means bounds
    it to ~ (n/k)^2 per cluster, and at web scale k grows with the corpus
    (n/k stays a few thousand) so each cluster is one small vectorized
    matmul inside a bucketed shuffle keyed on the cluster label. The
    clustering itself is the integer fixed-point streaming k-means
    (similarity.kmeans_fixed_point) — bit-identical distributed vs
    sequential, so the whole operator is value-reproducible and its SQL
    replay oracle-able (cosines rounded at 6 decimals before the
    threshold compare, same in engine and oracle).
    """

    from .relational import hash_bucket_aggregate
    from .similarity import kmeans_fixed_point
    from .sqlcompat import sql_round

    labeled = kmeans_fixed_point(ds_emb, k=k, iters=iters, id_col=id_col,
                                 vec_col=vec_col, keep_vec=True)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, cg in g.groupby("cluster", sort=False):
            cg = cg.sort_values(id_col)
            m = np.asarray(np.stack(cg[vec_col].to_numpy()), dtype=np.float64)
            if len(m) > 1:
                norms = np.sqrt((m * m).sum(axis=1))
                cos = sql_round((m @ m.T) / np.outer(norms, norms), 6)
                # drop row i if any j<i (id order) has cos >= threshold
                dup = (np.tril(cos >= threshold, k=-1)).any(axis=1)
            else:
                dup = np.zeros(len(m), dtype=bool)
            out.append(cg.loc[~dup, [id_col, "cluster"]])
        return pd.concat(out) if out else g[[id_col, "cluster"]]

    return hash_bucket_aggregate(labeled, ["cluster"], per_cluster,
                                 rows_hint=rows_hint)


def jaccard_pair_join(docs_ds, threshold: float = 0.3, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      rows_hint: int | None = None):
    """EXACT all-pairs Jaccard self-join above ``threshold`` via prefix
    filtering (PPJoin family, Xiao et al. 2008 — public): two docs with
    J(A,B) >= t must share at least one token among each doc's first
    ``|A| - ceil(t*|A|) + 1`` tokens under a global rarity ordering, so
    candidate generation buckets by PREFIX tokens only — the rare ones —
    instead of all tokens (the df-ordered prefix is what kills the
    "every pair shares 'the'" blowup of a naive token join).

    Passes:
      1. token document-frequency (bucketed aggregate) → broadcast
         token→(df, rank) ordering (rarest first, lexicographic tie);
      2. per doc: distinct tokens sorted by rank; emit one candidate row
         per PREFIX token carrying the doc's full sorted token list
         (the standard PPJoin payload trade-off — verification is local
         to the bucket, no second join);
      3. per token bucket: exact Jaccard on every candidate pair sharing
         that token, keep >= t (6-dp rounded, matching the SQL replay);
      4. one bucketed distinct on (a, b) — a pair can qualify via
         several shared prefix tokens.

    Exactness: guaranteed recall by the prefix-filter theorem; precision
    exact by construction (every emitted pair is verified).
    Returns (a, b, jaccard) with a < b.
    """
    import math

    import ray

    from .relational import hash_bucket_aggregate
    from .sqlcompat import sql_round

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(set(t.split()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "df": pa.array(list(c.values()), pa.int64())})

    def df_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(df=("df", "sum"))

    dfs = hash_bucket_aggregate(
        docs_ds.map_batches(df_partial, batch_format="pyarrow"),
        ["token"], df_bucket, rows_hint=rows_hint).to_pandas()
    dfs = dfs.sort_values(["df", "token"]).reset_index(drop=True)
    rank = {t: i for i, t in enumerate(dfs["token"])}
    ref = ray.put(rank)
    ref_key = ref.hex()

    def prefix_rows(batch: pa.Table) -> pa.Table:
        from ..stages.score import cached

        rk = cached(("ppjoin", ref_key), lambda: ray.get(ref))
        toks_out, ids, payloads = [], [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            toks = sorted(set(t.split()), key=lambda w: rk[w])
            n = len(toks)
            if not n:
                continue
            p = n - math.ceil(threshold * n) + 1
            payload = "\x1f".join(toks)
            for w in toks[:p]:
                toks_out.append(w)
                ids.append(int(i))
                payloads.append(payload)
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         id_col: pa.array(ids, pa.int64()),
                         "toks": pa.array(payloads, pa.string())})

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for _, grp in g.groupby("token", sort=False):
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            ids = grp[id_col].to_numpy()
            sets = [frozenset(s.split("\x1f")) for s in grp["toks"]]
            m = len(ids)
            for x in range(m):
                for y in range(x + 1, m):
                    inter = len(sets[x] & sets[y])
                    jac = float(sql_round(
                        inter / (len(sets[x]) + len(sets[y]) - inter), 6))
                    if jac >= threshold:
                        out_a.append(int(ids[x]))
                        out_b.append(int(ids[y]))
                        out_j.append(jac)
        return pd.DataFrame({
            "a": pd.Series(out_a, dtype=np.int64),
            "b": pd.Series(out_b, dtype=np.int64),
            "jaccard": pd.Series(out_j, dtype=np.float64)})

    pairs = hash_bucket_aggregate(
        docs_ds.map_batches(prefix_rows, batch_format="pyarrow"),
        ["token"], verify_bucket, rows_hint=rows_hint)

    def distinct_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    return hash_bucket_aggregate(pairs, ["a", "b"], distinct_bucket,
                                 rows_hint=rows_hint)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------

WINNOW_K = 4   # words per gram
WINNOW_W = 5   # grams per window -> guarantee threshold t = W + K - 1 = 8


def winnow_fingerprints(text: str, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> tuple[int, np.ndarray]:
    """Winnowing: the distinct window-minima of positional k-gram hashes.

    MOSS's fingerprint selection — any shared run of >= w + k - 1 words
    between two documents is GUARANTEED to share a selected fingerprint,
    while storing only ~2/(w+1) of the gram hashes. Gram hash = first 8
    md5 bytes (same convention as :func:`shingle_hashes`) so the whole
    scheme replays in SQL. Short docs (< k words) hash the whole text as
    one gram, mirroring shingle_hashes; <= w grams collapse to a single
    window. Returns (n_grams, sorted distinct uint64 fingerprints).
    """
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i: i + k])
                 for i in range(len(words) - k + 1)]
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
         for g in grams), dtype=np.uint64, count=len(grams))
    if len(h) <= w:
        fps = h.min(keepdims=True)
    else:
        fps = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return len(grams), np.unique(fps)


def winnow_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_grams, n_fps, fp_checksum — per-doc winnowing summary.

    fp_checksum = sum of the distinct fingerprints mod 2**64 (numpy
    uint64 wraparound == HUGEINT % 2**64 in the SQL oracle), so the
    SELECTED SET is value-checked, not just its size. Row-local; the
    fingerprint lists themselves feed winnow_matches when materialized.
    """
    n_grams, n_fps, checks = [], [], []
    for t in batch.column("text").to_pylist():
        ng, fps = winnow_fingerprints(t)
        n_grams.append(ng)
        n_fps.append(len(fps))
        checks.append(fps.sum(dtype=np.uint64))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_grams": pa.array(n_grams, pa.int64()),
        "n_fps": pa.array(n_fps, pa.int64()),
        "fp_checksum": pa.array(np.array(checks, dtype=np.uint64)),
    })


def containment_pair_join(docs_ds, threshold: float = 0.5, *,
                          k: int = 3, df_cap: int = 64,
                          id_col: str = "doc_id", text_col: str = "text",
                          rows_hint: int | None = None):
    """ASYMMETRIC containment self-join: ordered pairs (src, dst) with
    C(src→dst) = |S(src) ∩ S(dst)| / |S(src)| >= threshold over word
    k-shingle sets. Containment (Broder 1997's other resemblance) finds
    near-SUBSET relations Jaccard misses — a short doc quoted inside a
    long one scores J ≈ |short|/|long| (tiny) but C(short→long) ≈ 1;
    it's the quote-inclusion / partial-mirror detector next to the
    symmetric MinHash path.

    Discriminative-shingle restriction: shingles with document frequency
    above ``df_cap`` (boilerplate) are dropped from BOTH the intersection
    and the denominator — the standard capped-index semantics, replayed
    exactly by the SQL oracle. Unique shingles (df = 1) still count
    toward the denominator (a doc full of its own content must NOT look
    contained just because its overlap is all that survives); they are
    merely skipped during pair generation, where they cannot contribute.
    Docs shorter than k words have no shingles and never pair.

    Scale shape (no all-pairs): bucket-by-shingle co-locates every copy
    of a shingle, so df-filter + per-shingle pair generation are
    bucket-local (pair volume <= df_cap^2 per shingle by construction);
    per-doc capped sizes and per-pair shared counts are two more
    bucketed sums; two hash joins attach the denominators. Returns
    (src, dst, n_shared, src_size, containment[6dp rounded]).
    """
    from .relational import hash_bucket_aggregate, shuffle_join
    from .sqlcompat import sql_round

    def explode(batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            toks = t.split()
            for g in {" ".join(toks[j: j + k])
                      for j in range(len(toks) - k + 1)}:
                ids.append(int(i))
                sh.append(g)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "s": pa.array(sh, pa.string())})

    ex = docs_ds.map_batches(explode, batch_format="pyarrow")

    # ONE shuffle of the exploded table: a shingle's bucket sees its
    # full posting list, so df-filter, per-doc capped-size PARTIALS and
    # per-shingle pair partials all come out of the same bucket pass
    # (tagged rows: kind 0 = (doc, partial size), kind 1 = (a, b, n)).
    # The old three-pass shape re-shuffled the 9M-row table twice more.
    def fused_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64"),
                              "kind": pd.Series([], dtype="int64")})
        if not len(g):
            return empty
        df = g.groupby("s")["doc_id"].transform("size")
        kept = g[df <= df_cap]
        if not len(kept):
            return empty
        szp = kept.groupby("doc_id", as_index=False).size()
        size_rows = pd.DataFrame({
            "a": szp["doc_id"].to_numpy(np.int64),
            "b": np.full(len(szp), -1, np.int64),
            "n": szp["size"].to_numpy(np.int64),
            "kind": np.zeros(len(szp), np.int64)})
        pairable = kept[(df[df <= df_cap] >= 2).to_numpy()][
            ["doc_id", "s"]]
        m = pairable.merge(pairable, on="s")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m):
            pr = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
                  .size())
            pair_rows = pd.DataFrame({
                "a": pr["doc_id_x"].to_numpy(np.int64),
                "b": pr["doc_id_y"].to_numpy(np.int64),
                "n": pr["size"].to_numpy(np.int64),
                "kind": np.ones(len(pr), np.int64)})
            return pd.concat([size_rows, pair_rows], ignore_index=True)
        return size_rows

    fused = hash_bucket_aggregate(ex, ["s"], fused_bucket,
                                  rows_hint=rows_hint).materialize()

    def only(kind: int):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t.column("kind"), kind)) \
                    .drop_columns(["kind"])
        return f

    def size_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("a", as_index=False)["n"].sum()
        return pd.DataFrame({"doc_id": out["a"].to_numpy(np.int64),
                             "sz": out["n"].to_numpy(np.int64)})

    sizes = hash_bucket_aggregate(
        fused.map_batches(only(0), batch_format="pyarrow"), ["a"],
        size_sum, rows_hint=rows_hint)

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["n"].sum()
        return out.astype({"a": np.int64, "b": np.int64, "n": np.int64})

    shared = hash_bucket_aggregate(
        fused.map_batches(only(1), batch_format="pyarrow"), ["a", "b"],
        sum_bucket, rows_hint=rows_hint)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": np.concatenate([a, b]).astype(np.int64),
            "dst": np.concatenate([b, a]).astype(np.int64),
            "n_shared": np.concatenate([n, n]).astype(np.int64)})

    both = shared.map_batches(orient, batch_format="pyarrow")
    out = shuffle_join(both, sizes, "src", "doc_id",
                       ["dst", "n_shared"], ["sz"], rows_hint=rows_hint)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
                "src_size": pd.Series([], dtype="int64"),
                "containment": pd.Series([], dtype="float64")})
        c = sql_round(df["n_shared"].to_numpy(np.int64).astype(np.float64)
                      / df["sz"].to_numpy(np.int64).astype(np.float64), 6)
        out = pd.DataFrame({"src": df["src"].to_numpy(np.int64),
                            "dst": df["dst"].to_numpy(np.int64),
                            "n_shared": df["n_shared"].to_numpy(np.int64),
                            "src_size": df["sz"].to_numpy(np.int64),
                            "containment": c})
        return out[out["containment"] >= threshold]

    return out.map_batches(finish, batch_format="pandas")
