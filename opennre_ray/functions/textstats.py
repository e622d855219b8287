"""Text-analysis operators over the documents table (SURVEY extension set).

Language-ID, quality scoring, token counting, fingerprinting — the text-side
utilities a 100 TB training-data pipeline needs. All are stateless
``map_batches`` UDFs with vectorized bodies; the token split matches
``tokenization.split_on_whitespace`` semantics (strip + whitespace split) so
results agree with the RE tokenizer and with the DuckDB oracle
(``regexp_split_to_array(trim(text), '\\s+')``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sqlcompat import sql_round

# Function-word profiles for the n-gram/stopword language heuristic.
# (No external langid model in this sandbox; heuristic over closed classes.)
_LANG_MARKERS = {
    "en": {"the", "a", "of", "and", "in", "to", "is", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"},
    "es": {"el", "la", "de", "y", "es", "un", "una", "que"},
    "fr": {"le", "la", "et", "est", "un", "une", "que", "pour"},
}

_STOPWORDS = {"the", "a", "an", "of", "and", "or", "in", "on", "to", "is"}


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return t.split() if t else []


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens — whitespace token count (strip + split semantics;
    empty / whitespace-only text counts 0 tokens, unlike a bare regexp
    split which yields [''])."""
    trimmed = pc.utf8_trim_whitespace(batch.column("text"))
    counts = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    counts = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()),
                        counts)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_tokens": counts.cast(pa.int64())})


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Per-document quality features: length, token stats, stopword ratio.

    Mirrors common web-corpus quality filters (length/punct/stopword ratio);
    ratios rounded to 6 digits so float compare with the SQL oracle is exact.
    """
    texts = batch.column("text").to_pylist()
    n_chars, n_toks, stop_ratio, mean_len = [], [], [], []
    for t in texts:
        toks = _tokens(t)
        n = len(toks)
        n_chars.append(len(t))
        n_toks.append(n)
        stops = sum(1 for w in toks if w.lower() in _STOPWORDS)
        stop_ratio.append(float(sql_round(stops / n, 6)) if n else 0.0)
        mean_len.append(
            float(sql_round(sum(len(w) for w in toks) / n, 6)) if n else 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_toks, pa.int64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "mean_token_len": pa.array(mean_len, pa.float64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 hex (exact dedup key) + 64-bit rolling hash.

    The rolling hash is a polynomial Rabin-Karp over bytes (deterministic,
    shift-resistant prefix property) for cheap near-identity probes.
    """
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    rolls = []
    MOD = (1 << 61) - 1
    BASE = 257
    for t in texts:
        h = 0
        for b in t.encode("utf-8"):
            h = (h * BASE + b) % MOD
        rolls.append(h)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "md5": pa.array(md5s, pa.string()),
        "rolling_hash": pa.array(np.array(rolls, dtype=np.uint64)),
    })


def repetition_ratio(tokens: list[str]) -> float:
    """Gopher-style repetition: 1 - distinct/total 3-shingles (0 when the
    text has fewer than 3 tokens). Shared by ``docs_repetition`` and the
    pretrain pipeline so the definition cannot drift."""
    if len(tokens) < 3:
        return 0.0
    total = len(tokens) - 2
    distinct = len({tuple(tokens[i: i + 3]) for i in range(total)})
    return 1.0 - distinct / total


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: argmax of function-word hit-rate per profile.

    Falls back to 'und' when no profile scores > 0. (The synthetic corpus's
    ``lang`` column is generator metadata, not derivable from the word-salad
    text — this operator demonstrates the real heuristic.)
    """
    texts = batch.column("text").to_pylist()
    langs, confs = [], []
    for t in texts:
        toks = [w.lower() for w in _tokens(t)]
        n = max(1, len(toks))
        best_lang, best = "und", 0.0
        for lang, markers in _LANG_MARKERS.items():
            s = sum(1 for w in toks if w in markers) / n
            if s > best:
                best, best_lang = s, lang
        langs.append(best_lang)
        confs.append(float(sql_round(best, 6)))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(langs, pa.string()),
        "confidence": pa.array(confs, pa.float64()),
    })


def top_vocab(docs_ds, n: int = 256) -> frozenset:
    """Exact top-``n`` corpus vocabulary by (count DESC, token ASC).

    Two-stage: map-side Counter partials collapse each block to its local
    vocabulary before the groupby shuffle (the shuffle moves vocabulary-
    sized frames, never the corpus), then one sort+limit over the
    aggregated counts. The result is ``n`` tokens — kilobytes — which the
    caller broadcasts (``ray.put``) into the scoring pass. Deterministic
    tie-break at the cutoff: lexicographic token order, matching the SQL
    ``ORDER BY cnt DESC, token``.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_tokens(t))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    counts = (docs_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))
    top = counts.sort(["cnt", "token"],
                      descending=[True, False]).limit(n).to_pandas()
    return frozenset(top["token"])


def oov_stats(docs_ds, vocab: frozenset):
    """Per-document out-of-vocabulary counts against a broadcast corpus
    vocabulary — the corpus-statistics quality signal ("word-salad" docs
    score high OOV against the corpus's own head vocabulary).

    ``vocab`` ships to workers once via ``ray.put``; each batch emits
    integer (n_tokens, oov_cnt) so the SQL comparison is exact. Two-pass
    shape: pass 1 (``top_vocab``) reduces the corpus to a kilobyte
    statistic, pass 2 is a stateless streaming map — the standard
    broadcast-statistics pattern (same as the quantile-threshold filter).
    """
    import ray

    ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        voc = ray.get(ref)
        n_toks, oov = [], []
        for t in batch.column("text").to_pylist():
            toks = _tokens(t)
            n_toks.append(len(toks))
            oov.append(sum(1 for w in toks if w not in voc))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "oov_cnt": pa.array(oov, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def inverted_index(docs_ds, id_col: str = "doc_id",
                   text_col: str = "text", rows_hint: int | None = None):
    """Token → (document frequency, sorted posting list) search index.

    Map-side: each batch emits DISTINCT (token, id) pairs per doc (within-
    doc repeats collapse before the shuffle); one bucketed aggregate then
    builds each token's posting list. Postings serialize as a
    comma-joined id string sorted numerically — deterministic and
    SQL-replayable via ``string_agg(... ORDER BY id)``. Scale note: a
    token's posting row is O(df); production indexes segment ultra-hot
    tokens into df-bucketed shards — the aggregation shape here (bucketed
    by token hash) is the same either way.
    """

    from .relational import hash_bucket_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        ids, toks = [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            for w in set(_tokens(t)):
                ids.append(i)
                toks.append(w)
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.sort_values(id_col).groupby("token", sort=False)[id_col]
        out = agg.agg(lambda s: ",".join(map(str, s))).rename("postings")
        df = agg.size().rename("df")
        return pd.concat([df, out], axis=1).reset_index()

    return hash_bucket_aggregate(docs_ds.map_batches(
        pairs, batch_format="pyarrow"), ["token"], per_bucket,
        rows_hint=rows_hint)


def tfidf_topk(docs_ds, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", n_docs: int | None = None,
               rows_hint: int | None = None,
               broadcast_limit: int = 2_000_000):
    """Per-document top-``k`` tf-idf terms (score = tf · ln(N/df), ranked
    on the 6-decimal-rounded score with lexicographic tie-break — the
    exact ordering the SQL ``row_number() OVER (ORDER BY score DESC,
    token)`` replay uses, so distributed output is value-oracle-able).

    Two passes over the corpus:
      1. document frequency per token — distinct tokens per doc collapse
         map-side, then ONE bucketed aggregate (the shuffle moves
         vocabulary-sized partials, never document text);
      2. scoring — tf per doc is local to the row, idf comes from the df
         table. Under ``broadcast_limit`` distinct tokens the df map
         ships once via ``ray.put`` and pass 2 is a stateless streaming
         map (the in-sandbox reality). Above it (open-web vocab ≈ corpus
         cardinality) the same math runs as (doc, token, tf) pairs
         bucket-joined to the df table by token hash, then a per-doc
         bucketed top-k — no driver-sized state anywhere.

    ``n_docs``: pass the parquet-metadata row count when cheaply known;
    otherwise a count() pass derives it.
    """
    import ray

    from .relational import hash_bucket_aggregate

    if n_docs is None:
        n_docs = docs_ds.count()

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        ids, toks = [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            for w in set(_tokens(t)):
                ids.append(i)
                toks.append(w)
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    def df_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(df=(id_col, "size"))

    df_ds = hash_bucket_aggregate(
        docs_ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["token"], df_per_bucket, rows_hint=rows_hint)

    def topk_frame(g: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, token, tf, df) rows → per-doc top-k by rounded score."""
        # shuffle_join's tagged union degrades value columns to object
        tf = g["tf"].astype(np.int64)
        dfc = g["df"].astype(np.int64)
        g = g.assign(tf=tf, score=sql_round(tf * np.log(n_docs / dfc), 6))
        g = g.sort_values(["score", "token"], ascending=[False, True],
                          kind="stable")
        out = g.groupby(id_col, sort=False).head(k)
        return out[[id_col, "token", "tf", "score"]]

    # materialize the vocabulary-sized aggregate ONCE (object store,
    # distributed) — count() then to_pandas()/join would otherwise run
    # the corpus df pass twice; the corpus itself is never materialized
    df_ds = df_ds.materialize()
    n_tokens = df_ds.count()
    if n_tokens <= broadcast_limit:
        dfmap = {t: int(c) for t, c in zip(
            *(df_ds.to_pandas()[c] for c in ("token", "df")))}
        ref = ray.put(dfmap)

        def score_batch(batch: pa.Table) -> pd.DataFrame:
            from collections import Counter
            dfm = ray.get(ref)
            rows = []
            id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
            for i, t in zip(id_np, batch.column(text_col).to_pylist()):
                for w, tf in Counter(_tokens(t)).items():
                    rows.append((i, w, tf, dfm[w]))
            return topk_frame(pd.DataFrame(
                rows, columns=[id_col, "token", "tf", "df"]))

        return docs_ds.map_batches(score_batch, batch_format="pyarrow")

    # scale path: token-bucketed join of (doc, token, tf) onto df,
    # then a doc-bucketed top-k
    def tf_pairs(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids, toks, tfs = [], [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            for w, c in Counter(_tokens(t)).items():
                ids.append(i)
                toks.append(w)
                tfs.append(c)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    from .relational import shuffle_join
    joined = shuffle_join(
        docs_ds.map_batches(tf_pairs, batch_format="pyarrow"), df_ds,
        "token", "token", [id_col, "tf"], ["df"], rows_hint=rows_hint)
    return hash_bucket_aggregate(joined, [id_col], topk_frame,
                                 rows_hint=rows_hint)


def unigram_logprob(docs_ds, *, id_col: str = "doc_id",
                    text_col: str = "text", rows_hint: int | None = None,
                    broadcast_limit: int = 2_000_000):
    """Per-document average log-likelihood under the corpus's own unigram
    LM — the CCNet quality signal (Wenzek et al. 2020 score documents
    with a KenLM n-gram LM; with no external LM available the corpus's
    own unigram distribution is the deterministic stand-in: word-salad /
    rare-token documents score low, head-vocabulary prose scores high).

    Integer fixed-point so the distributed sum is EXACT and
    SQL-replayable: each token's log-prob ln(count/total) is rounded once
    to a 1e-6-grid BIGINT (``floor(x·10⁶ + ½)`` — Python ``math.log`` and
    DuckDB ``ln`` share libm, so the grid values agree bit-for-bit), and
    per-document sums are integer arithmetic with no float-summation-order
    hazard. Returns (id_col, n_tokens, logprob_fp) where
    avg-logprob ≈ logprob_fp / (1e6 · n_tokens).

    Two corpus passes, same shape as ``tfidf_topk``:
      1. unigram counts — map-side Counter partials, one bucketed
         aggregate (the shuffle moves vocabulary-sized partials);
      2. scoring — vocabulary under ``broadcast_limit`` ships once via
         ``ray.put`` and pass 2 is a stateless streaming map; above it
         the same math runs as (doc, token, tf) pairs bucket-joined onto
         the log-prob table, then a per-doc bucketed integer sum (empty
         docs carried through the left join as zero rows).
    """
    import math
    from collections import Counter

    import ray

    from .relational import hash_bucket_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_tokens(t))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    def sum_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(cnt=("cnt", "sum"))

    vocab = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["token"], sum_per_bucket, rows_hint=rows_hint).materialize()

    total = float(vocab.sum("cnt") or 0)

    def fp_of(cnt: float) -> int:
        return int(math.floor(math.log(cnt / total) * 1_000_000 + 0.5))

    fp_ds = vocab.map_batches(
        lambda b: pd.DataFrame({
            "token": b["token"],
            "fp": np.asarray([fp_of(float(c)) for c in b["cnt"]],
                             dtype=np.int64)}),
        batch_format="pandas").materialize()
    return _sum_token_fp(docs_ds, fp_ds, id_col=id_col, text_col=text_col,
                         out_col="logprob_fp", rows_hint=rows_hint,
                         broadcast_limit=broadcast_limit)


def _sum_token_fp(docs_ds, fp_ds, *, id_col: str, text_col: str,
                  out_col: str, n_col: str = "n_tokens",
                  terms_fn=None, rows_hint: int | None = None,
                  broadcast_limit: int = 2_000_000):
    """Per-doc integer sum of a per-term fixed-point weight table —
    pass 2 shared by ``unigram_logprob`` / ``dsir_weights`` /
    ``bigram_logprob``.

    ``fp_ds`` is a MATERIALIZED (token, fp int64) Dataset covering every
    corpus term, where a "term" is whatever ``terms_fn(text)`` yields
    (default: whitespace tokens; bigram scoring passes space-joined
    pairs). Under ``broadcast_limit`` it ships once via ``ray.put`` and
    scoring is a stateless streaming map; above it the same math runs as
    (doc, term, tf) pairs bucket-joined onto the fp table, then a per-doc
    bucketed exact integer sum (empty docs carried through the left join
    as zero rows). Returns (id_col, n_col, out_col).
    """
    from collections import Counter

    import ray

    from .relational import hash_bucket_aggregate, shuffle_join

    terms = terms_fn or _tokens

    if fp_ds.count() <= broadcast_limit:
        vdf = fp_ds.to_pandas()
        fpmap = ({} if vdf.empty else
                 {t: int(f) for t, f in zip(vdf["token"], vdf["fp"])})
        ref = ray.put(fpmap)

        def score_batch(batch: pa.Table) -> pa.Table:
            fpm = ray.get(ref)
            n_toks, sums = [], []
            for t in batch.column(text_col).to_pylist():
                toks = terms(t)
                n_toks.append(len(toks))
                sums.append(sum(fpm[w] for w in toks))
            return pa.table({
                id_col: batch.column(id_col),
                n_col: pa.array(n_toks, pa.int64()),
                out_col: pa.array(sums, pa.int64())})

        return docs_ds.map_batches(score_batch, batch_format="pyarrow")

    def tf_pairs(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        id_np = batch.column(id_col).to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, batch.column(text_col).to_pylist()):
            counted = Counter(terms(t))
            if not counted:               # empty doc: zero marker row
                counted = {"": 0}
            for w, c in counted.items():
                ids.append(i)
                toks.append(w)
                tfs.append(c)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    joined = shuffle_join(
        docs_ds.map_batches(tf_pairs, batch_format="pyarrow"), fp_ds,
        "token", "token", [id_col, "tf"], ["fp"], how="left",
        rows_hint=rows_hint)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        tf = g["tf"].astype(np.int64)
        fp = g["fp"].fillna(0).astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].astype(np.int64),
                            n_col: tf, out_col: tf * fp})
        return (out.groupby(id_col, as_index=False)
                .agg(**{n_col: (n_col, "sum"),
                        out_col: (out_col, "sum")}))

    return hash_bucket_aggregate(joined, [id_col], per_doc,
                                 rows_hint=rows_hint)


def _bigrams(text: str) -> list[str]:
    """Space-joined adjacent token pairs — unambiguous keys because
    whitespace tokenization guarantees tokens contain no spaces."""
    toks = _tokens(text)
    return [a + " " + b for a, b in zip(toks, toks[1:])]


def bigram_logprob(docs_ds, *, id_col: str = "doc_id",
                   text_col: str = "text", rows_hint: int | None = None,
                   broadcast_limit: int = 2_000_000):
    """Per-document conditional log-likelihood under the corpus's own
    add-one-smoothed BIGRAM LM — one modeling step up from
    ``unigram_logprob`` toward CCNet's KenLM scorer (Wenzek et al. 2020):
    p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (ctx(w_{i-1}) + V) where
    ctx(w) = Σ bigram counts with left context w and V = unigram vocab
    size. Repetitive and word-salad text diverge much harder under the
    conditional model than under unigram frequencies.

    ONE counting pass emits unigram AND bigram partials together (tagged
    rows, right='' marks unigrams), so the context counts and V cost no
    extra corpus pass; the per-bigram fp then folds inside a
    left-bucketed aggregate — same-left rows co-locate, so ctx(w) is an
    in-bucket sum, NO join. Fixed-point 1e-6-grid BIGINT as everywhere.
    Returns (id_col, n_bigrams, bigram_fp); docs with <2 tokens score 0.
    """
    import math
    from collections import Counter

    from .relational import hash_bucket_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = _tokens(t)
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        lefts = list(uni.keys()) + [l for l, _ in bi.keys()]
        rights = [""] * len(uni) + [r for _, r in bi.keys()]
        cnts = list(uni.values()) + list(bi.values())
        return pa.table({"left": pa.array(lefts, pa.string()),
                         "right": pa.array(rights, pa.string()),
                         "cnt": pa.array(cnts, pa.int64())})

    def sum_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["left", "right"], as_index=False) \
            .agg(cnt=("cnt", "sum"))

    counts = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["left", "right"], sum_per_bucket, rows_hint=rows_hint) \
        .materialize()

    import pyarrow.compute as pc
    n_vocab = counts.map_batches(
        lambda t: t.filter(pc.equal(t.column("right"), "")),
        batch_format="pyarrow").count()
    bigrams = counts.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("right"), "")),
        batch_format="pyarrow")

    def fp_per_left(g: pd.DataFrame) -> pd.DataFrame:
        ctx = g.groupby("left")["cnt"].transform("sum")
        denom = (ctx + n_vocab).to_numpy()
        num = (g["cnt"] + 1).to_numpy()
        fp = np.asarray([
            math.floor(math.log(int(a) / int(b)) * 1_000_000 + 0.5)
            for a, b in zip(num, denom)], dtype=np.int64)
        return pd.DataFrame({"token": g["left"] + " " + g["right"],
                             "fp": fp})

    fp_ds = hash_bucket_aggregate(bigrams, ["left"], fp_per_left,
                                  rows_hint=rows_hint).materialize()
    return _sum_token_fp(docs_ds, fp_ds, id_col=id_col, text_col=text_col,
                         out_col="bigram_fp", n_col="n_bigrams",
                         terms_fn=_bigrams, rows_hint=rows_hint,
                         broadcast_limit=broadcast_limit)


#: Kneser-Ney absolute discount d = 0.75 in nano fixed-point
KN_DISCOUNT_NANO = 750_000_000


def kneser_ney_logprob(docs_ds, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       rows_hint: int | None = None,
                       broadcast_limit: int = 2_000_000):
    """Per-document log-likelihood under the corpus's own interpolated
    Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman 1999) — the
    smoothing KenLM itself uses, one step up from ``bigram_logprob``'s
    add-one model:

        p(w2|w1) = max(c(w1 w2) − d, 0)/c(w1·)
                   + d·N1+(w1·)/c(w1·) · N1+(·w2)/N_bigram_types

    with d = 0.75. The whole chain is integer nano fixed-point — every
    division a floor on int64 — so the per-bigram probability and its
    1e-6-grid log weight replay exactly in SQL. Scale shape: ONE bigram
    counting shuffle; the continuation counts N1+(·w2) fold in a
    right-keyed bucketed pass (vocab-sized output) and bucket-join back
    onto the bigram table; c(w1·) and N1+(w1·) are in-bucket transforms
    of the left-keyed fold (no join); scoring streams via
    ``_sum_token_fp``. Returns (id_col, n_bigrams, kn_fp); docs with <2
    tokens score 0.
    """
    import math
    from collections import Counter

    from .relational import hash_bucket_aggregate, shuffle_join

    def count_partial(batch: pa.Table) -> pa.Table:
        bi: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = _tokens(t)
            bi.update(zip(toks, toks[1:]))
        keys = list(bi.keys())
        return pa.table({
            "left": pa.array([k[0] for k in keys], pa.string()),
            "right": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([bi[k] for k in keys], pa.int64())})

    def sum_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["left", "right"], as_index=False) \
            .agg(cnt=("cnt", "sum"))

    counts = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["left", "right"], sum_per_bucket, rows_hint=rows_hint) \
        .materialize()
    n_types = counts.count()

    def ncont_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("right", as_index=False).agg(
            ncont=("right", "size"))
        return out.astype({"ncont": np.int64})

    ncont = hash_bucket_aggregate(counts, ["right"], ncont_bucket,
                                  rows_hint=rows_hint)
    joined = shuffle_join(counts, ncont, "right", "right",
                          ["left", "cnt"], ["ncont"],
                          rows_hint=rows_hint)

    d_nano = KN_DISCOUNT_NANO

    def fp_per_left(g: pd.DataFrame) -> pd.DataFrame:
        c1 = g.groupby("left")["cnt"].transform("sum") \
            .to_numpy(np.int64)
        n1p = g.groupby("left")["cnt"].transform("size") \
            .to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        nc = g["ncont"].to_numpy(np.int64)
        term1 = np.maximum(c * 10 ** 9 - d_nano, 0) // c1
        lam = d_nano * n1p // c1
        pcont = nc * 10 ** 9 // n_types
        p_nano = term1 + lam * pcont // 10 ** 9
        fp = np.asarray([
            math.floor(math.log(int(p) / 1e9) * 1_000_000 + 0.5)
            for p in p_nano], dtype=np.int64)
        return pd.DataFrame({"token": g["left"] + " " + g["right"],
                             "fp": fp})

    fp_ds = hash_bucket_aggregate(joined, ["left"], fp_per_left,
                                  rows_hint=rows_hint).materialize()
    return _sum_token_fp(docs_ds, fp_ds, id_col=id_col,
                         text_col=text_col, out_col="kn_fp",
                         n_col="n_bigrams", terms_fn=_bigrams,
                         rows_hint=rows_hint,
                         broadcast_limit=broadcast_limit)


def source_divergence(docs_ds, *, group_col: str = "source",
                      text_col: str = "text",
                      rows_hint: int | None = None):
    """Per-group KL divergence of the group's unigram distribution from
    the corpus distribution — the 'which sources are linguistically
    unusual' curation signal. KL(p_s ‖ p) = Σ_w p_s(w)·[ln p_s(w) −
    ln p(w)]; reported as integer (group totals, Σ cnt_s·fp) where fp is
    the 1e-6-grid-rounded log-ratio, so distributed sums are exact and
    SQL-replayable (avg-KL ≈ kl_fp_sum / (1e6·n_tokens)).

    One (group, token) counting pass; the per-token GLOBAL count folds
    inside the token-bucketed aggregate (same-token rows co-locate — no
    join), with group totals broadcast from a tiny per-group sum.
    """
    import math
    from collections import Counter

    from .relational import hash_bucket_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for w in _tokens(t):
                c[(g, w)] += 1
        keys = list(c.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in keys], pa.string()),
            "token": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64())})

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([group_col, "token"], as_index=False) \
            .agg(cnt=("cnt", "sum"))

    counts = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        [group_col, "token"], sum_pairs, rows_hint=rows_hint) \
        .materialize()

    totals = (counts.map_batches(
        lambda df: df.groupby(group_col, as_index=False)
        .agg(t=("cnt", "sum")), batch_format="pandas").to_pandas()
        .groupby(group_col, as_index=False).agg(t=("t", "sum")))
    tot_s = dict(zip(totals[group_col], (int(x) for x in totals["t"])))
    tot = sum(tot_s.values())

    def kl_partial(g: pd.DataFrame) -> pd.DataFrame:
        cg = g.groupby("token")["cnt"].transform("sum")
        fp = np.asarray([
            math.floor((math.log(int(cs) / tot_s[s])
                        - math.log(int(c) / tot)) * 1_000_000 + 0.5)
            for s, cs, c in zip(g[group_col], g["cnt"], cg)],
            dtype=np.int64)
        out = pd.DataFrame({group_col: g[group_col],
                            "kl": g["cnt"].to_numpy() * fp})
        return out.groupby(group_col, as_index=False).agg(
            kl_fp_sum=("kl", "sum"))

    parts = hash_bucket_aggregate(counts, ["token"], kl_partial,
                                  rows_hint=rows_hint)

    from ray.data.aggregate import Sum
    out = parts.groupby(group_col).aggregate(
        Sum("kl_fp_sum", alias_name="kl_fp_sum"))

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b["kl_fp_sum"] = b["kl_fp_sum"].astype("int64")
        b["n_tokens"] = np.asarray([tot_s[s] for s in b[group_col]],
                                   dtype=np.int64)
        return b

    return out.map_batches(fin, batch_format="pandas")


def source_influence(docs_ds, *, group_col: str = "source",
                     text_col: str = "text",
                     rows_hint: int | None = None):
    """Leave-one-source-out data valuation: each source's influence on
    the corpus unigram log-likelihood, influence_fp = LL(corpus) −
    LL(corpus − source), where LL = Σ_w c_w·ln(c_w / T) under the MLE
    unigram model (both in exact 1e-6 fixed point, each ln rounded once
    so distributed sums are order-independent integers). A source whose
    removal barely moves LL is statistically redundant; a large delta
    marks a source that shapes the corpus distribution — the cheap
    first-order proxy for leave-one-out data valuation over sources.

    Same two-pass shape as :func:`source_divergence`: one (group, token)
    counting pass, then a token-bucketed pass where each token's GLOBAL
    count folds in-bucket (same-token rows co-locate — no join) and the
    per-source leave-out terms vectorize as a dense (bucket-vocab ×
    sources) matrix; per-source totals broadcast from a tiny aggregate.
    Cost is O(vocab × sources) — sources are a bounded curation-tier
    dimension, not corpus-scale.
    """
    from collections import Counter

    from .relational import hash_bucket_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for w in _tokens(t):
                c[(g, w)] += 1
        keys = list(c.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in keys], pa.string()),
            "token": pa.array([k[1] for k in keys], pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64())})

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([group_col, "token"], as_index=False) \
            .agg(cnt=("cnt", "sum"))

    counts = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        [group_col, "token"], sum_pairs, rows_hint=rows_hint) \
        .materialize()

    totals = (counts.map_batches(
        lambda df: df.groupby(group_col, as_index=False)
        .agg(t=("cnt", "sum")), batch_format="pandas").to_pandas()
        .groupby(group_col, as_index=False).agg(t=("t", "sum")))
    tot_s = dict(zip(totals[group_col], (int(x) for x in totals["t"])))
    tot = sum(tot_s.values())
    sources = sorted(tot_s)
    rem = np.asarray([tot - tot_s[s] for s in sources], dtype=np.int64)

    def infl_partial(g: pd.DataFrame) -> pd.DataFrame:
        piv = (g.pivot_table(index="token", columns=group_col,
                             values="cnt", fill_value=0, aggfunc="sum")
               .reindex(columns=sources, fill_value=0))
        mat = piv.to_numpy(np.int64)
        cg = mat.sum(axis=1)
        ll_f = np.floor(np.log(cg / tot) * 1_000_000 + 0.5) \
            .astype(np.int64)
        ll_partial = int((cg * ll_f).sum())
        m = cg[:, None] - mat
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.floor(np.log(m / rem[None, :]) * 1_000_000 + 0.5)
        f = np.where(m > 0, f, 0).astype(np.int64)
        wo = (m * f).sum(axis=0)
        return pd.DataFrame({group_col: sources, "wo_fp": wo,
                             "ll_fp": np.full(len(sources), ll_partial,
                                              np.int64)})

    parts = (hash_bucket_aggregate(counts, ["token"], infl_partial,
                                   rows_hint=rows_hint)
             .to_pandas().groupby(group_col, as_index=False).sum())
    parts["n_tokens"] = np.asarray([tot_s[s] for s in parts[group_col]],
                                   dtype=np.int64)
    parts["influence_fp"] = (parts["ll_fp"] - parts["wo_fp"]) \
        .astype(np.int64)
    out = (parts[[group_col, "n_tokens", "wo_fp", "influence_fp"]]
           .sort_values(group_col).reset_index(drop=True))
    return out.astype({"n_tokens": np.int64, "wo_fp": np.int64,
                       "influence_fp": np.int64})


def dsir_weights(docs_ds, *, is_target_col: str = "is_target",
                 id_col: str = "doc_id", text_col: str = "text",
                 rows_hint: int | None = None,
                 broadcast_limit: int = 2_000_000):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document importance
    = Σ_tokens [ln p_target(w) − ln p_raw(w)] under add-one-smoothed
    unigram proxies, where the target distribution is estimated from the
    rows flagged by ``is_target_col`` and the raw distribution from the
    whole corpus. Rank or threshold on the weight to select raw docs that
    look like the target domain.

    One TAGGED counting pass (token, cnt_all, cnt_tgt partials → one
    bucketed aggregate — the target LM costs no extra corpus pass), then
    the shared fixed-point scoring pass (``_sum_token_fp``). The log-ratio
    is rounded ONCE to a 1e-6-grid BIGINT, so distributed sums are exact
    and SQL-replayable. Returns (id_col, n_tokens, dsir_fp).
    """
    import math
    from collections import Counter

    from .relational import hash_bucket_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        call: Counter = Counter()
        ctgt: Counter = Counter()
        for t, is_t in zip(batch.column(text_col).to_pylist(),
                           batch.column(is_target_col).to_pylist()):
            toks = _tokens(t)
            call.update(toks)
            if is_t:
                ctgt.update(toks)
        words = list(call.keys())
        return pa.table({
            "token": pa.array(words, pa.string()),
            "cnt_all": pa.array([call[w] for w in words], pa.int64()),
            "cnt_tgt": pa.array([ctgt.get(w, 0) for w in words],
                                pa.int64())})

    def sum_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False).agg(
            cnt_all=("cnt_all", "sum"), cnt_tgt=("cnt_tgt", "sum"))

    vocab = hash_bucket_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["token"], sum_per_bucket, rows_hint=rows_hint).materialize()

    n_vocab = vocab.count()
    tot_all = int(vocab.sum("cnt_all") or 0)
    tot_tgt = int(vocab.sum("cnt_tgt") or 0)

    def fp_of(c_all: int, c_tgt: int) -> int:
        lt = math.log((c_tgt + 1) / (tot_tgt + n_vocab))
        lr = math.log((c_all + 1) / (tot_all + n_vocab))
        return int(math.floor((lt - lr) * 1_000_000 + 0.5))

    fp_ds = vocab.map_batches(
        lambda b: pd.DataFrame({
            "token": b["token"],
            "fp": np.asarray([fp_of(int(a), int(t))
                              for a, t in zip(b["cnt_all"], b["cnt_tgt"])],
                             dtype=np.int64)}),
        batch_format="pandas").materialize()
    return _sum_token_fp(docs_ds, fp_ds, id_col=id_col, text_col=text_col,
                         out_col="dsir_fp", rows_hint=rows_hint,
                         broadcast_limit=broadcast_limit)


# Gopher quality-rule thresholds (Rae et al. 2021, Table A1 — public).
GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS = 50, 100_000
GOPHER_MIN_WORD_LEN, GOPHER_MAX_WORD_LEN = 3.0, 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_REPETITION = 0.2


_ALPHA_RE = None


def gopher_signals(text: str) -> tuple[int, float, float, int, float, int]:
    """Per-document Gopher rule signals (n_tokens, mean_token_len,
    alpha_ratio, n_stop_distinct, repetition, passed 0/1) — the single
    definition shared by ``gopher_quality_batch`` and the curation
    pipeline so the rule set cannot drift between the standalone query
    and the composed chain."""
    import re

    global _ALPHA_RE
    if _ALPHA_RE is None:
        _ALPHA_RE = re.compile(r"[A-Za-z]")
    toks = _tokens(text)
    n = len(toks)
    ml = float(sql_round(sum(map(len, toks)) / n, 6)) if n else 0.0
    ar = (float(sql_round(
        sum(1 for w in toks if _ALPHA_RE.search(w)) / n, 6))
        if n else 0.0)
    ns = len({w.lower() for w in toks if w.lower() in _STOPWORDS})
    rp = float(sql_round(repetition_ratio(toks), 6))
    ok = int(GOPHER_MIN_TOKENS <= n <= GOPHER_MAX_TOKENS
             and GOPHER_MIN_WORD_LEN <= ml <= GOPHER_MAX_WORD_LEN
             and ar >= GOPHER_MIN_ALPHA_RATIO
             and ns >= GOPHER_MIN_STOPWORDS
             and rp <= GOPHER_MAX_REPETITION)
    return n, ml, ar, ns, rp, ok


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Gopher-rules composite quality filter (Rae et al. 2021): word-count
    bounds, mean-word-length bounds, alphabetic-word ratio, distinct-
    stopword floor, repeated-3-gram ceiling — each signal emitted as its
    own column plus the AND of all rules as ``passed`` (0/1 BIGINT).

    Stateless vectorized map (no corpus statistics needed — every rule is
    row-local), so the filter streams at read bandwidth and composes
    before any shuffle-bearing stage. Ratios are rounded to the same
    1e-6 grid the rules are evaluated on, so the SQL replay is exact.
    Alphabetic test is ASCII ``[A-Za-z]`` on both sides (RE2 parity).
    """
    texts = batch.column("text").to_pylist()
    n_toks, mean_len, alpha_ratio, n_stop, rep, passed = \
        [], [], [], [], [], []
    for t in texts:
        n, ml, ar, ns, rp, ok = gopher_signals(t)
        n_toks.append(n)
        mean_len.append(ml)
        alpha_ratio.append(ar)
        n_stop.append(ns)
        rep.append(rp)
        passed.append(ok)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_toks, pa.int64()),
        "mean_token_len": pa.array(mean_len, pa.float64()),
        "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
        "n_stop_distinct": pa.array(n_stop, pa.int64()),
        "repetition": pa.array(rep, pa.float64()),
        "passed": pa.array(passed, pa.int64()),
    })


# PII scrub patterns (CCNet/Dolma-style pre-training hygiene pass).
# RE2-safe subset only — character classes + bounded quantifiers, no
# backrefs or lookarounds — so the Python `re` replay and the DuckDB
# `regexp_replace(..., 'g')` oracle match byte-for-byte (both engines
# agree on greedy char-class extents; see test_pii_scrub_duckdb_parity).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9][0-9()\-. ]{6,}[0-9]"),
)

_PII_COMPILED = None


def pii_scrub(text: str) -> tuple[str, list[int]]:
    """Scrub PII spans in category order (email, ipv4, phone), replacing
    each match with ``<CATEGORY>``. Returns (clean_text, per-category
    match counts). Order matters: earlier categories consume their spans
    before later patterns see the text — the SQL oracle chains its
    ``regexp_replace`` calls in the same order."""
    import re

    global _PII_COMPILED
    if _PII_COMPILED is None:
        _PII_COMPILED = [(name, re.compile(pat)) for name, pat in
                         PII_PATTERNS]
    counts = []
    for name, rx in _PII_COMPILED:
        text, n = rx.subn(f"<{name.upper()}>", text)
        counts.append(n)
    return text, counts


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """doc_id, clean_md5, n_email, n_ipv4, n_phone, n_pii — row-local
    scrub, streams at read bandwidth (the scrubbed text is carried as an
    md5 so corpus-scale outputs stay narrow; compose ``pii_scrub``
    directly in a pipeline stage to keep the text itself)."""
    out_counts = [[] for _ in PII_PATTERNS]
    md5s = []
    for t in batch.column("text").to_pylist():
        clean, counts = pii_scrub(t)
        md5s.append(hashlib.md5(clean.encode()).hexdigest())
        for acc, n in zip(out_counts, counts):
            acc.append(n)
    cols = {"doc_id": batch.column("doc_id"),
            "clean_md5": pa.array(md5s, pa.string())}
    total = None
    for (name, _), acc in zip(PII_PATTERNS, out_counts):
        arr = np.asarray(acc, dtype=np.int64)
        cols[f"n_{name}"] = pa.array(arr)
        total = arr if total is None else total + arr
    cols["n_pii"] = pa.array(total)
    return pa.table(cols)


# C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning..."): keep only lines that read like prose sentences,
# then gate the document on what survives. The rules below are the
# RE2/ASCII-safe subset so the Python pass and the DuckDB list_filter
# oracle agree byte-for-byte (see test_c4_filter_duckdb_parity):
# strip = ' \t\r' only, word split = runs of [^ \t], lower() on ASCII.
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_KEPT_LINES = 3
C4_TERMINAL_PUNCT = frozenset({".", "!", "?", '"', "'"})
C4_LINE_BLOCK = "javascript"          # boilerplate "enable javascript" lines
C4_DOC_BLOCK_LOWER = "lorem ipsum"    # placeholder text ⇒ drop the page
C4_DOC_BLOCK_RAW = "{"                # leaked source code ⇒ drop the page

_C4_WORD_RE = None


def c4_line_filter(text: str) -> tuple[str, int, int, int]:
    """One document through the C4 line rules.

    Returns (kept_text, n_lines, n_kept, passed): a line survives iff it
    ends in terminal punctuation, has ≥ C4_MIN_WORDS_PER_LINE words, and
    does not mention javascript; the doc passes iff ≥ C4_MIN_KEPT_LINES
    lines survive and the page has neither "lorem ipsum" nor a curly
    brace. Row-local — streams at read bandwidth."""
    import re

    global _C4_WORD_RE
    if _C4_WORD_RE is None:
        _C4_WORD_RE = re.compile(r"[^ \t]+")
    kept = []
    lines = text.split("\n")
    for ln in lines:
        t = ln.strip(" \t\r")
        if not t or t[-1] not in C4_TERMINAL_PUNCT:
            continue
        if len(_C4_WORD_RE.findall(t)) < C4_MIN_WORDS_PER_LINE:
            continue
        if C4_LINE_BLOCK in t.lower():
            continue
        kept.append(t)
    passed = int(len(kept) >= C4_MIN_KEPT_LINES
                 and C4_DOC_BLOCK_LOWER not in text.lower()
                 and C4_DOC_BLOCK_RAW not in text)
    return "\n".join(kept), len(lines), len(kept), passed


def c4_filter_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_lines, n_kept, kept_md5, passed — the kept text is carried
    as an md5 so corpus-scale outputs stay narrow; compose
    ``c4_line_filter`` directly in a pipeline stage to keep the text."""
    n_lines, n_kept, md5s, passed = [], [], [], []
    for t in batch.column("text").to_pylist():
        clean, nl, nk, p = c4_line_filter(t)
        n_lines.append(nl)
        n_kept.append(nk)
        md5s.append(hashlib.md5(clean.encode()).hexdigest())
        passed.append(p)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "kept_md5": pa.array(md5s, pa.string()),
        "passed": pa.array(passed, pa.int64()),
    })


def source_shingle_overlap(docs_ds, *, strat_col: str = "source",
                           text_col: str = "text",
                           rows_hint: int | None = None) -> pd.DataFrame:
    """Pairwise content overlap between corpus strata (sources/domains):
    Jaccard similarity of each pair's DISTINCT 3-shingle sets — the
    corpus-analytics signal for "which crawls duplicate each other"
    (cross-source boilerplate shows up as a high-Jaccard pair).

    Scale shape: batches collapse to distinct (shingle, stratum) pairs
    map-side; ONE bucketed aggregate groups by shingle and emits partial
    counts — per-stratum distinct-shingle tallies (diagonal rows) and
    per-pair co-occurrence tallies (off-diagonal rows). The partials are
    strata²-sized per bucket, so the final reduce is a driver-side sum
    over kilobytes. Output: (source_a, source_b, n_a, n_b, n_common,
    jaccard) for every unordered pair, zeros included.
    """
    from itertools import combinations

    from .relational import hash_bucket_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, str]] = set()
        for src, t in zip(batch.column(strat_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = _tokens(t)
            for i in range(len(toks) - 2):
                seen.add((" ".join(toks[i: i + 3]), src))
        sh, srcs = (list(c) for c in zip(*seen)) if seen else ([], [])
        return pa.table({"s": pa.array(sh, pa.string()),
                         strat_col: pa.array(srcs, pa.string())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["s", strat_col])
        rows: dict[tuple[str, str], int] = {}
        for _, grp in g.groupby("s", sort=False):
            srcs = sorted(grp[strat_col])
            for a in srcs:
                rows[(a, a)] = rows.get((a, a), 0) + 1
            for a, b in combinations(srcs, 2):
                rows[(a, b)] = rows.get((a, b), 0) + 1
        if not rows:
            return pd.DataFrame({"source_a": [], "source_b": [],
                                 "cnt": pd.Series([], dtype=np.int64)})
        ka, kb = zip(*rows.keys())
        return pd.DataFrame({"source_a": list(ka), "source_b": list(kb),
                             "cnt": np.fromiter(rows.values(), np.int64)})

    partials = hash_bucket_aggregate(
        docs_ds.map_batches(pairs, batch_format="pyarrow"),
        ["s"], per_bucket, rows_hint=rows_hint).to_pandas()

    agg = (partials.groupby(["source_a", "source_b"], as_index=False)
           .agg(cnt=("cnt", "sum")))
    diag = {r.source_a: int(r.cnt) for r in agg.itertuples()
            if r.source_a == r.source_b}
    common = {(r.source_a, r.source_b): int(r.cnt)
              for r in agg.itertuples() if r.source_a != r.source_b}
    out = []
    for a, b in combinations(sorted(diag), 2):
        na, nb = diag[a], diag[b]
        nc = common.get((a, b), 0)
        out.append((a, b, na, nb, nc,
                    float(sql_round(nc / (na + nb - nc), 6))))
    return pd.DataFrame(out, columns=["source_a", "source_b", "n_a",
                                      "n_b", "n_common", "jaccard"]) \
        .astype({"n_a": np.int64, "n_b": np.int64, "n_common": np.int64})


# Encoding-damage detection (ftfy-style triage, detection only): classic
# UTF-8-read-as-Latin-1 artifact sequences, the replacement character,
# and stray C0 control bytes. Detection is the curation-side operation
# (drop or route to a repair pass); repair itself is out of scope. All
# three patterns are literal-alternation / character-class RE2-safe so
# the DuckDB regexp_extract_all oracle counts identically. Markers are
# spelled with \\u escapes (several contain C1 controls / NBSP).
MOJIBAKE_MARKERS = (
    "\u00c3\u00a9",                            # e-acute read as Latin-1
    "\u00c3\u00a8", "\u00c3\u00a4",          # e-grave, a-umlaut
    "\u00c3\u00b6", "\u00c3\u00bc",          # o-umlaut, u-umlaut
    "\u00c3\u00b1",                            # n-tilde
    "\u00e2\u20ac\u2122",                     # right single quote mangled
    "\u00e2\u20ac\u0153",                     # left double quote mangled
    "\u00e2\u20ac\u009d",                     # right double quote mangled
    "\u00c2\u00a0",                            # NBSP double-encoded
)
MOJIBAKE_CONTROL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_MOJIBAKE_RES = None


def mojibake_signals(text: str) -> tuple[int, int, int, int]:
    """(n_mojibake, n_replacement, n_control, clean) for one document."""
    import re

    global _MOJIBAKE_RES
    if _MOJIBAKE_RES is None:
        _MOJIBAKE_RES = (
            re.compile("|".join(re.escape(m) for m in MOJIBAKE_MARKERS)),
            re.compile("\ufffd"),
            re.compile(MOJIBAKE_CONTROL_CLASS),
        )
    mj = len(_MOJIBAKE_RES[0].findall(text))
    rp = len(_MOJIBAKE_RES[1].findall(text))
    ct = len(_MOJIBAKE_RES[2].findall(text))
    return mj, rp, ct, int(mj == 0 and rp == 0 and ct == 0)


def mojibake_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_mojibake, n_replacement, n_control, clean: row-local,
    streams at read bandwidth."""
    cols = {"n_mojibake": [], "n_replacement": [], "n_control": [],
            "clean": []}
    for t in batch.column("text").to_pylist():
        mj, rp, ct, ok = mojibake_signals(t)
        cols["n_mojibake"].append(mj)
        cols["n_replacement"].append(rp)
        cols["n_control"].append(ct)
        cols["clean"].append(ok)
    return pa.table({"doc_id": batch.column("doc_id"),
                     **{k: pa.array(v, pa.int64())
                        for k, v in cols.items()}})


_SENT_RE = None
_VOWEL_RE = None


def flesch_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_words, n_sents, n_syllables, flesch — Flesch reading
    ease with the standard corpus heuristics: sentences = runs of
    [.!?] (min 1), syllables = vowel-group count per word (min 1,
    [aeiouy]+ on the lowercased token). Row-local, streams at read
    bandwidth; the score's float arithmetic is spelled identically in
    the SQL oracle (literals parse exactly at this precision) and
    rounded to 12 decimals per the pinned-float rule. Empty docs are
    dropped (the score is undefined at zero words)."""
    import re

    global _SENT_RE, _VOWEL_RE
    if _SENT_RE is None:
        _SENT_RE = re.compile(r"[.!?]+")
        _VOWEL_RE = re.compile(r"[aeiouy]+")

    ids, nw, ns, nsy = [], [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        toks = _tokens(text)
        if not toks:
            continue
        ids.append(doc_id)
        nw.append(len(toks))
        ns.append(max(len(_SENT_RE.findall(text)), 1))
        nsy.append(sum(max(len(_VOWEL_RE.findall(w.lower())), 1)
                       for w in toks))
    w = np.array(nw, dtype=np.int64)
    s = np.array(ns, dtype=np.int64)
    sy = np.array(nsy, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        flesch = sql_round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 12)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_words": pa.array(w, pa.int64()),
        "n_sents": pa.array(s, pa.int64()),
        "n_syllables": pa.array(sy, pa.int64()),
        "flesch": pa.array(flesch, pa.float64()),
    })


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (fasttext/CCNet-style model filter).
# Real curation pipelines score every page with a linear model over hashed
# bag-of-words features (fasttext quality classifiers in CCNet / GPT-3 /
# RedPajama); the compute shape is hash -> weight lookup -> sum, which is
# exactly what this stage runs. The sandbox has no trained weights, so the
# weight vector is an md5-seeded integer draw (SQL-replayable) — swap in a
# learned vector and nothing else changes.
# ---------------------------------------------------------------------------

QCLF_DIM = 4096          # hashed feature buckets
QCLF_WSPAN = 2001        # weights drawn in [-1000, 1000]

_QCLF_WEIGHTS: "np.ndarray | None" = None
_QCLF_BUCKET_CACHE: dict[str, int] = {}


def _qclf_weights() -> "np.ndarray":
    """Seeded per-worker weight vector: w[i] = md5u64('qw:i') % 2001 - 1000
    (built once per worker; a learned fasttext vector would ship via
    ray.put instead — same lookup, different provenance)."""
    global _QCLF_WEIGHTS
    if _QCLF_WEIGHTS is None:
        _QCLF_WEIGHTS = np.array(
            [int.from_bytes(hashlib.md5(f"qw:{i}".encode()).digest()[:8],
                            "big") % QCLF_WSPAN - (QCLF_WSPAN // 2)
             for i in range(QCLF_DIM)], dtype=np.int64)
    return _QCLF_WEIGHTS


def _qclf_bucket(tok: str) -> int:
    b = _QCLF_BUCKET_CACHE.get(tok)
    if b is None:
        b = int.from_bytes(hashlib.md5(("qh:" + tok).encode("utf-8"))
                           .digest()[:8], "big") % QCLF_DIM
        if len(_QCLF_BUCKET_CACHE) < 1_000_000:   # Zipf head stays cached
            _QCLF_BUCKET_CACHE[tok] = b
    return b


def quality_classifier_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, score, keep — integer score = sum of hashed
    token weights (keep = score >= 0). Row-local; the token->bucket map
    is memoized per worker so the md5 cost follows the vocabulary, not
    the token stream."""
    w = _qclf_weights()
    ids, nt, sc = [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        toks = [t.lower() for t in _tokens(text)]
        ids.append(doc_id)
        nt.append(len(toks))
        sc.append(int(w[[_qclf_bucket(t) for t in toks]].sum()) if toks
                  else 0)
    score = np.array(sc, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(nt, pa.int64()),
        "score": pa.array(score, pa.int64()),
        "keep": pa.array((score >= 0).astype(np.int64), pa.int64()),
    })
