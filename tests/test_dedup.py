"""Dedup operator tests: exact, MinHash-LSH, SimHash, Jaccard, embedding."""

import numpy as np
import pyarrow as pa
import pytest

from opennre_ray.functions.dedup import (
    MinHashLSH,
    SimHashStage,
    embedding_dup_groups,
    exact_dedup,
    jaccard,
    minhash_duplicate_groups,
    minhash_signature,
    _minhash_params,
    shingle_hashes,
    simhash64,
)


def test_shingles_and_jaccard():
    a = "the quick brown fox jumps over the lazy dog"
    assert jaccard(a, a) == 1.0
    b = "the quick brown fox jumps over a lazy dog"
    assert 0.3 < jaccard(a, b) < 1.0
    assert jaccard("completely different words here now", a) == 0.0
    assert jaccard("", "") == 1.0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(100)]
    a = " ".join(words)
    b = " ".join(words[:80] + [f"x{i}" for i in range(20)])
    pa_, pb_ = _minhash_params(256)
    sa = minhash_signature(a, pa_, pb_)
    sb = minhash_signature(b, pa_, pb_)
    est = (sa == sb).mean()
    true = jaccard(a, b)
    assert abs(est - true) < 0.12


def test_simhash_near_duplicates_close_in_hamming():
    a = " ".join(f"tok{i}" for i in range(50))
    b = a + " extra"
    c = " ".join(f"other{i}" for i in range(50))
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    d_ab = bin(ha ^ hb).count("1")
    d_ac = bin(ha ^ hc).count("1")
    assert d_ab < 8 < d_ac


def test_exact_dedup_ray(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": 3, "text": "same text"},
        {"doc_id": 1, "text": "same text"},
        {"doc_id": 2, "text": "different"},
    ])
    out = exact_dedup(ds).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_minhash_lsh_stage_shapes():
    stage = MinHashLSH(num_bands=4, rows_per_band=2)
    batch = pa.table({"doc_id": [1, 2], "text": ["a b c d", "a b c d"]})
    out = stage(batch)
    assert out.num_rows == 8     # 2 docs × 4 bands
    # identical docs share every band hash
    df = out.to_pandas()
    g = df.groupby("band_id")["band_hash"].nunique()
    assert (g == 1).all()


def test_minhash_duplicate_groups_finds_near_dups(ray_session):
    import ray.data as rd

    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zz"
    far = " ".join(f"q{i}" for i in range(60))
    ds = rd.from_items([
        {"doc_id": 10, "text": base},
        {"doc_id": 11, "text": near},
        {"doc_id": 12, "text": far},
    ])
    out = minhash_duplicate_groups(ds, num_bands=16, rows_per_band=2).to_pandas()
    groups = dict(zip(out["doc_id"], out["dup_group"]))
    assert groups.get(10) == 10 and groups.get(11) == 10
    assert 12 not in groups or groups[12] == 12


def test_simhash_stage_bands():
    stage = SimHashStage()
    out = stage(pa.table({"doc_id": [1], "text": ["hello world tokens"]}))
    h = out.column("simhash")[0].as_py()
    for b in range(4):
        assert out.column(f"band{b}")[0].as_py() == (h >> (16 * b)) & 0xFFFF


def test_simhash_dedup_pairs_vs_bruteforce(ray_session):
    """Banded candidate search + popcount verify == the all-pairs answer
    (banding is lossless at Hamming ≤ 3 by pigeonhole over 4 bands)."""
    import itertools

    import ray

    from opennre_ray.functions.dedup import simhash_dedup_pairs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark quiet forest tonight")
    texts = [base,
             base,                                    # exact dup: hamming 0
             base.replace("quiet", "silent"),         # near dup
             "completely unrelated text about astrophysics and turbines",
             "another document with its own distinct vocabulary entirely",
             ""]                                      # zero sig: dropped
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    got = simhash_dedup_pairs(docs, rows_hint=64).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    sigs = {i: simhash64(t) for i, t in enumerate(texts) if simhash64(t)}
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3)
    assert [tuple(r) for r in got.to_numpy()] == want
    assert (0, 1, 0) in want                          # exact dup found


def test_pair_ops_partition_invariant(ray_session):
    """simhash_dedup_pairs and lsh_candidate_pairs return identical pair
    sets at any block count (bucketing must not depend on layout)."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.dedup import (lsh_candidate_pairs,
                                             simhash_dedup_pairs)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = []
    for i in range(40):
        t = base if i % 7 == 0 else f"{base} doc{i} unique tail {i}"
        rows.append({"doc_id": i, "text": t})

    def canon(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True))

    outs_s, outs_l = [], []
    for n_parts in (1, 9):
        ds = rd.from_items(rows).repartition(n_parts)
        outs_s.append(canon(simhash_dedup_pairs(ds, rows_hint=64)
                            .to_pandas()))
        outs_l.append(canon(lsh_candidate_pairs(ds, rows_hint=64)
                            .to_pandas()))
    pd.testing.assert_frame_equal(outs_s[0], outs_s[1])
    pd.testing.assert_frame_equal(outs_l[0], outs_l[1])
    assert len(outs_s[0]) >= 1 and len(outs_l[0]) >= 1


def test_embedding_dup_groups(ray_session, sf_dir):
    import ray.data as rd

    v = np.random.default_rng(5).standard_normal(16).astype(np.float32)
    rows = [
        {"vec_id": 1, "embedding": v.tolist()},
        {"vec_id": 2, "embedding": (v * 1.001).tolist()},   # same direction
        {"vec_id": 3, "embedding": (-v).tolist()},          # opposite
    ]
    out = embedding_dup_groups(rd.from_items(rows), threshold=0.99).to_pandas()
    got = dict(zip(out["vec_id"], out["dup_group"]))
    assert got == {1: 1, 2: 1}


def test_embedding_dup_groups_keeps_disjoint_pairs_separate(ray_session):
    """Two similar PAIRS sharing an LSH bucket must not merge into one
    group (regression: flat min-of-members union)."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    # two orthogonal directions → two disjoint near-dup pairs
    u = rng.standard_normal(32).astype(np.float32)
    v = rng.standard_normal(32).astype(np.float32)
    v -= v @ u / (u @ u) * u          # orthogonalize
    rows = [
        {"vec_id": 1, "embedding": u.tolist()},
        {"vec_id": 2, "embedding": (u * 1.01).tolist()},
        {"vec_id": 3, "embedding": v.tolist()},
        {"vec_id": 4, "embedding": (v * 0.99).tolist()},
    ]
    # n_planes=0 buckets would collide everything; use 1 plane so the two
    # pairs may or may not share a bucket — assert grouping is pairwise
    out = embedding_dup_groups(rd.from_items(rows), threshold=0.99,
                               n_planes=1).to_pandas()
    got = dict(zip(out["vec_id"], out["dup_group"]))
    if 1 in got or 2 in got:
        assert got.get(1, 1) == 1 and got.get(2, 1) == 1
    if 3 in got or 4 in got:
        assert got.get(3, 3) == 3 and got.get(4, 3) == 3


def test_decontaminate_planted(ray_session):
    """A distinctive eval 13-gram planted into two corpus docs removes
    exactly those docs; the Bloom fallback path is conservative (its clean
    set never exceeds the exact clean set, and leaks nothing)."""
    import ray.data as rd

    from opennre_ray.functions.dedup import decontaminate

    secret = ("zeta eta theta iota kappa lam mu nu xi omicron pi rho "
              "sigma")                                       # 13 words
    eval_rows = [{"doc_id": 1000, "text": f"held out {secret} tail"}]
    corpus_rows = [
        {"doc_id": 1, "text": f"left pad {secret} right pad"},    # dirty
        {"doc_id": 2, "text": f"{secret} starts this one"},       # dirty
        {"doc_id": 3, "text": "a perfectly clean document " * 5},
        {"doc_id": 4, "text": "zeta eta theta but only three words match "
                              "nothing contiguous of length thirteen here"},
    ]
    corpus = rd.from_items(corpus_rows, override_num_blocks=2)
    ev = rd.from_items(eval_rows)

    clean = decontaminate(corpus, ev, k=13).to_pandas()
    assert sorted(clean["doc_id"]) == [3, 4]

    bloom_clean = decontaminate(corpus, ev, k=13,
                                broadcast_limit=0).to_pandas()
    assert set(bloom_clean["doc_id"]) <= {3, 4}      # conservative
    assert not ({1, 2} & set(bloom_clean["doc_id"]))  # never leaks


def test_duplicated_spans_planted(ray_session):
    """Planted shared 8-gram across two docs is flagged at every position
    it occupies; within-doc-only repetition is NOT cross-document dup.
    The Bloom fallback path (broadcast_limit=0) matches the exact path."""
    import ray.data as rd

    from opennre_ray.functions.dedup import duplicated_spans

    boiler = "w1 w2 w3 w4 w5 w6 w7 w8"          # exactly k=8 tokens
    rows = [
        {"doc_id": 0, "text": boiler + " aa bb cc dd ee ff gg hh"},
        {"doc_id": 1, "text": "xx yy " + boiler},
        # within-doc repetition only: k-grams repeat inside doc 2 but
        # appear in no other doc
        {"doc_id": 2, "text": ("q1 q2 q3 q4 q5 q6 q7 q8 " * 2).strip()},
        {"doc_id": 3, "text": "short doc"},      # < k tokens: 0 spans
    ]
    ds = rd.from_items(rows).repartition(3)
    got = (duplicated_spans(ds, k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc0: 9 spans, only position 0 (the boilerplate) is cross-doc
    assert got["n_spans"].tolist() == [9, 3, 9, 0]
    assert got["n_dup_spans"].tolist() == [1, 1, 0, 0]

    via_bloom = (duplicated_spans(ds, k=8, broadcast_limit=0).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
    assert via_bloom.equals(got)


def test_semantic_dedup_matches_sequential(ray_session):
    """Distributed SemDeDup == a sequential numpy replay of the same
    clustering + lowest-id-wins cosine pruning, at any block count; a
    planted near-identical pair loses its higher id."""
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.dedup import semantic_dedup
    from opennre_ray.functions.similarity import kmeans_fixed_point
    from opennre_ray.functions.sqlcompat import sql_round

    rng = np.random.default_rng(5)
    n, d = 300, 16
    vecs = rng.standard_normal((n, d))
    vecs[137] = vecs[42] + 1e-4          # planted near-dup (higher id drops)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = rd.from_pandas(df).repartition(7)

    got = semantic_dedup(ds, k=4, iters=2, threshold=0.9,
                         rows_hint=n).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    assert 137 not in set(got["vec_id"]) and 42 in set(got["vec_id"])

    # sequential replay: same labels, brute-force prune per cluster
    labels = (kmeans_fixed_point(ds, k=4, iters=2, keep_vec=False)
              .to_pandas().sort_values("vec_id").reset_index(drop=True))
    m = np.asarray(np.stack(df["embedding"].to_numpy()), dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    cos = sql_round((m @ m.T) / np.outer(norms, norms), 6)
    keep = []
    for i in range(n):
        cl = labels.loc[i, "cluster"]
        mates = labels.index[(labels["cluster"] == cl)
                             & (labels["vec_id"] < i)]
        if not (cos[i, mates] >= 0.9).any():
            keep.append((i, cl))
    exp = pd.DataFrame(keep, columns=["vec_id", "cluster"]).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(np.int64), exp)


def test_paragraph_dedup_planted(ray_session):
    """CCNet-style paragraph removal: a 4-word segment shared verbatim by
    two docs is cut from BOTH (all copies go); unique segments survive and
    rejoin in document order. Bloom fallback (broadcast_limit=0) matches
    the exact broadcast path (no false positives at this tiny scale)."""
    import ray.data as rd

    from opennre_ray.functions.dedup import paragraph_dedup

    boiler = "b1 b2 b3 b4"                       # exactly w=4 words
    rows = [
        {"doc_id": 0, "text": boiler + " aa bb cc dd"},
        {"doc_id": 1, "text": boiler + " ee ff gg hh"},
        # same words NOT segment-aligned -> not a duplicate unit
        {"doc_id": 2, "text": "zz b1 b2 b3 b4 yy xx ww"},
        {"doc_id": 3, "text": ""},               # empty doc: 0 units
    ]
    ds = rd.from_items(rows).repartition(3)
    got = (paragraph_dedup(ds, w=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["clean_text"].tolist() == [
        "aa bb cc dd", "ee ff gg hh", "zz b1 b2 b3 b4 yy xx ww", ""]
    assert got["n_units"].tolist() == [2, 2, 2, 0]
    assert got["n_removed"].tolist() == [1, 1, 0, 0]

    via_bloom = (paragraph_dedup(ds, w=4, broadcast_limit=0).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(via_bloom, got)


def test_jaccard_pair_join_exact_vs_bruteforce(ray_session):
    """Prefix-filtered pair join == brute-force all-pairs Jaccard at the
    threshold — exact recall AND precision, invariant to partitioning."""
    import itertools

    import ray.data as rd

    from opennre_ray.functions.dedup import jaccard_pair_join
    from opennre_ray.functions.sqlcompat import sql_round

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = int(rng.integers(5, 15))
        rows.append({"doc_id": i, "text": " ".join(
            rng.choice(vocab, size=k, replace=False))})
    # planted near-identical pair
    rows.append({"doc_id": 100, "text": "w0 w1 w2 w3 w4 w5"})
    rows.append({"doc_id": 101, "text": "w0 w1 w2 w3 w4 w6"})

    sets = {r["doc_id"]: frozenset(r["text"].split()) for r in rows}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = float(sql_round(
            inter / (len(sets[a]) + len(sets[b]) - inter), 6))
        if jac >= 0.5:
            want.add((a, b, jac))
    assert (100, 101, float(sql_round(5 / 7, 6))) in want

    for n_parts in (1, 5):
        ds = rd.from_items(rows).repartition(n_parts)
        got = jaccard_pair_join(ds, threshold=0.5).to_pandas()
        got_set = {(int(a), int(b), float(j)) for a, b, j in
                   zip(got["a"], got["b"], got["jaccard"])}
        assert got_set == want


def test_edit_distance_self_join_typos(ray_session):
    """Blocked Levenshtein join finds planted single-edit typos, skips
    distance-2 pairs, and (by design) misses cross-block matches."""
    import ray.data as rd

    from opennre_ray.functions.dedup import edit_distance_self_join

    rows = [
        {"rid": 1, "s": "anthropic"},
        {"rid": 2, "s": "anthropiC"},   # substitution at last char
        {"rid": 3, "s": "anthropi"},    # deletion of last char
        {"rid": 4, "s": "anthroXic"},   # differs mid-string: other block
        {"rid": 5, "s": "zebra"},
        {"rid": 6, "s": "zebrA"},
        {"rid": 7, "s": "zebXA"},       # distance 2 from zebrA? no: 1 sub -> same block as 6? block 'zebX' != 'zebr'
    ]
    got = edit_distance_self_join(
        rd.from_items(rows).repartition(3), id_col="rid", str_col="s",
        max_dist=1, rows_hint=64).to_pandas()
    pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    # same block 'anthropi': last-char substitution pair found
    assert (1, 2) in pairs
    # 3 (last-char DELETION -> block 'anthrop') and 4 (mid-string edit)
    # land in other blocks: the documented blocking tradeoff
    assert not any(3 in p or 4 in p for p in pairs)
    assert (5, 6) in pairs
    assert not any(7 in p for p in pairs)
    assert pairs == {(1, 2), (5, 6)}


def test_jaro_winkler_bit_parity_with_duckdb():
    """The alias-match oracle needs jaro_winkler to be BIT-equal to
    DuckDB's rapidfuzz vendoring (6-dp rounding only absorbs ulp noise,
    not formula differences — e.g. rapidfuzz floor-halves an odd
    transposition count, where the textbook formula keeps the .5)."""
    import itertools

    import duckdb

    from opennre_ray.functions.dedup import jaro_winkler

    words = ["martha", "marhta", "dwayne", "duane", "stream", "vetor",
             "scan", "span", "san", "table", "tble", "batch", "bach",
             "customer", "custmer", "aaaa", "aaab", "xy", "yx",
             "abcd", "acbd", "abcde", "bacde", "abcdefghij", "jihgfedcba",
             "a", "ab", "window", "widow", "filter", "fiter"]
    con = duckdb.connect()
    for x, y in itertools.combinations_with_replacement(words, 2):
        want = con.sql("SELECT jaro_winkler_similarity(?, ?)",
                       params=[x, y]).fetchone()[0]
        assert jaro_winkler(x, y) == want, (x, y)
    con.close()


def test_containment_detects_subset(ray_session):
    import pandas as pd
    import ray.data as rd

    from opennre_ray.functions.dedup import containment_pair_join

    base = " ".join(f"tok{i}" for i in range(30))
    quote = " ".join(f"tok{i}" for i in range(10, 20))   # strict subset
    other = " ".join(f"zzz{i}" for i in range(25))
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": [base, quote, other]})
    out = containment_pair_join(
        rd.from_pandas(docs), threshold=0.5).to_pandas()
    got = {(r.src, r.dst): r.containment for r in out.itertuples()}
    # every shingle of the quote appears in the base -> C(2->1) = 1;
    # the reverse direction is 8/28 and must NOT pass at t=0.5;
    # the disjoint doc pairs with nobody
    assert got == {(2, 1): 1.0}
    row = out.iloc[0]
    assert row["n_shared"] == 8 and row["src_size"] == 8
