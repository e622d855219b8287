"""Replicates the driver's correctness gate: every SQL-oracled query must
match DuckDB on the same parquet tables (row count + sorted values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from opennre_ray.pipelines.queries import ORACLES, QUERIES

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb(ray_session, sf_dir, name):
    got = _canon(_to_df(QUERIES[name](sf_dir)))
    con = _duck(sf_dir)
    want = _canon(con.sql(ORACLES[name]).df())
    con.close()
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert list(got.columns) == list(want.columns), name
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        if np.issubdtype(got[col].dtype, np.floating):
            np.testing.assert_allclose(g.astype(float), w.astype(float),
                                       rtol=0, atol=1e-9, err_msg=f"{name}.{col}")
        else:
            mismatch = (pd.Series(g).astype(str) != pd.Series(w).astype(str))
            assert not mismatch.any(), (
                f"{name}.{col}: {mismatch.sum()} mismatches, e.g. "
                f"{list(zip(g[mismatch][:3], w[mismatch][:3]))}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(ray_session, sf_dir, name):
    res = _to_df(QUERIES[name](sf_dir))
    assert len(res) >= 0
    if len(res):            # empty results may lose schema through map_groups
        assert len(res.columns) > 0


def test_pii_scrub_duckdb_parity(ray_session):
    """Python `re` and DuckDB's RE2 agree byte-for-byte on scrub output
    and per-category counts for match-BEARING strings — the corpus-level
    query only exercises the identity path (the synthetic docs carry no
    PII), so the regex-dialect parity is pinned here."""
    import hashlib

    from opennre_ray.functions.textstats import PII_PATTERNS, pii_scrub
    from opennre_ray.pipelines.queries import _sql_pii_scrub

    samples = [
        "contact bob.smith+spam@example.co.uk or eve@sub.domain.io now",
        "server at 192.168.0.1 and 10.0.0.255, not 1234.5.6.7 ok",
        "call +1 (415) 555-0199 today",
        "mixed: a@b.io 8.8.8.8 +44 20 7946 0958 end",
        "no pii here at all",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(samples), dtype=np.int64),
                       "text": samples})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(_sql_pii_scrub()).df().set_index("doc_id")
    con.close()
    assert want["n_pii"].sum() > 0          # the samples actually match
    for i, s in enumerate(samples):
        clean, counts = pii_scrub(s)
        row = want.loc[i]
        assert hashlib.md5(clean.encode()).hexdigest() == row["clean_md5"], s
        for (name, _), n in zip(PII_PATTERNS, counts):
            assert n == row[f"n_{name}"], (s, name)


def test_c4_filter_duckdb_parity(ray_session):
    """Python C4 line rules and the DuckDB list_filter oracle agree
    byte-for-byte on multi-line match-BEARING pages — the corpus-level
    query only exercises the reject path (single-line docs without
    terminal punctuation)."""
    import hashlib

    from opennre_ray.functions.textstats import c4_line_filter
    from opennre_ray.pipelines.queries import _sql_c4_filter

    samples = [
        "Good line with five words here.\nshort.\nno punct line at all\n"
        "Another good line of text right here!\n"
        "This third fine sentence also makes the cut.\ntrailing",
        "lorem ipsum dolor sit amet would be a fine line.\n"
        "Second decent line with many words inside it.\n"
        "Third decent line with many words inside it.\n"
        "Fourth decent line with many words inside it.",
        "var x = { a: 1 };\nA perfectly fine long sentence right here.\n"
        "Another perfectly fine long sentence right here.\n"
        "Third perfectly fine long sentence right here.",
        "Enable JavaScript to view this page properly.\n"
        "A good long line of plain text one.\n"
        "A good long line of plain text two.\n"
        "A good long line of plain text three.",
        "  \t Padded line with enough words to pass easily. \t\n"
        "Second padded line with enough words to pass.\n"
        "Third padded line with enough words to pass.",
        'He said "stop right there, friend!"\nEnds with a quote."',
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(samples), dtype=np.int64),
                       "text": samples})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(_sql_c4_filter()).df().set_index("doc_id")
    con.close()
    assert want["passed"].sum() > 0 and (want["passed"] == 0).any()
    for i, s in enumerate(samples):
        clean, n_lines, n_kept, passed = c4_line_filter(s)
        row = want.loc[i]
        assert n_lines == row["n_lines"], s
        assert n_kept == row["n_kept"], s
        assert passed == row["passed"], s
        assert hashlib.md5(clean.encode()).hexdigest() == row["kept_md5"], s


def test_url_normalize_properties():
    """normalize_url collapses every cosmetic variant of the same page to
    one canonical string, and is idempotent."""
    from opennre_ray.functions.urls import messy_url, normalize_url

    variants = [
        "https://docs.test/page/7",
        "HTTPS://DOCS.TEST/page/7",
        "https://docs.test/page/7?utm_source=feed&utm_campaign=c3",
        "https://docs.test/page/7#sec-1",
        "https://docs.test/page/7/",
    ]
    canon = {normalize_url(u) for u in variants}
    assert canon == {"https://docs.test/page/7"}
    for u in variants:
        assert normalize_url(normalize_url(u)) == normalize_url(u)
    # non-utm query params survive; root trailing slash survives
    assert normalize_url("https://a.b/x?q=1&utm_medium=m") == \
        "https://a.b/x?q=1"
    assert normalize_url("https://a.b/") == "https://a.b/"
    # the synthetic messifier: every 10th row re-crawls its predecessor
    assert normalize_url(messy_url(19)) == normalize_url(messy_url(18))
    assert normalize_url(messy_url(18)) != normalize_url(messy_url(17))


def test_pmi_collocations_hand_oracle(ray_session, tmp_path):
    """PMI over a tiny planted corpus: the always-adjacent pair ('new',
    'york') outranks frequent-but-independent pairs."""
    import pyarrow.parquet as pq

    import pyarrow as pa

    from opennre_ray.pipelines import queries as Q

    docs = pa.table({
        "doc_id": list(range(8)),
        "text": ["new york " + "the cat sat on the mat " * 2] * 4
                + ["the dog ran to the park new york"] * 4,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    out = Q.docs_pmi_collocations(str(sf)).to_pandas()
    # 'new york' is always-adjacent (cnt 8); rarer exclusive pairs like
    # 'dog ran' (cnt 4) legitimately score higher (classic PMI rare-word
    # bias) — assert presence + exact count and the ranking invariant
    ny = out[out["pair"] == "new york"]
    assert len(ny) == 1 and ny.iloc[0]["cnt"] == 8
    assert (out["pmi"].to_numpy()[:-1] >= out["pmi"].to_numpy()[1:]).all()
    # independent pair 'the cat' must rank below the exclusive pairs
    assert float(ny.iloc[0]["pmi"]) > float(
        out[out["pair"] == "on the"]["pmi"].iloc[0])


def test_ntile_and_corr_hand_oracles(ray_session, tmp_path):
    """NTILE tiles exactly match SQL semantics on a remainder case, and
    the integer-moment correlation equals numpy corrcoef."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opennre_ray.pipelines import queries as Q

    n = 10                                       # 10 rows, 4 tiles: 3,3,2,2
    orders = pa.table({
        "o_orderkey": list(range(n)),
        "o_custkey": [0] * n,
        "o_totalprice": [float(100 - i) for i in range(n)],
        "o_orderdate": ["1996-01-01"] * n,
    })
    rng = np.random.default_rng(4)
    qty = rng.integers(1, 50, 300).astype(float)
    price = qty * 1000 + rng.integers(0, 5000, 300).astype(float)
    li = pa.table({"l_quantity": qty, "l_extendedprice": price})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(orders, sf / "orders.parquet")
    pq.write_table(li, sf / "lineitem.parquet")

    tiles = (Q.orders_price_ntile(str(sf)).to_pandas()
             .sort_values("o_totalprice").reset_index(drop=True))
    assert tiles["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]

    got = Q.lineitem_qty_price_corr(str(sf))
    exp = np.corrcoef(qty, price)[0, 1]
    assert abs(got["corr"].iloc[0] - exp) < 1e-6

def test_unigram_logprob_scale_path_matches_broadcast(ray_session):
    """The beyond-broadcast path (token-bucketed join + per-doc integer
    sum) is row-identical to the broadcast path, including an empty doc
    carried through the left join as a zero row."""
    import ray.data as rd

    from opennre_ray.functions.textstats import unigram_logprob

    rows = [
        {"doc_id": 0, "text": "aa bb aa cc"},
        {"doc_id": 1, "text": "bb bb dd"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "  aa  "},
    ]
    ds = rd.from_items(rows).repartition(3)
    base = (unigram_logprob(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert base["n_tokens"].tolist() == [4, 3, 0, 1]
    assert base.loc[2, "logprob_fp"] == 0
    scale = (unigram_logprob(ds, broadcast_limit=0).to_pandas()
             .sort_values("doc_id").reset_index(drop=True)
             .astype(base.dtypes.to_dict()))
    pd.testing.assert_frame_equal(scale, base)


def test_dsir_weights_hand_math_and_scale_path(ray_session):
    """DSIR log-ratio weights match a hand-computed add-one-smoothed
    oracle, target-domain docs outscore off-domain ones, and the
    beyond-broadcast path is row-identical to the broadcast path."""
    import math

    import ray.data as rd

    from opennre_ray.functions.textstats import dsir_weights

    rows = [
        {"doc_id": 0, "is_target": True, "text": "aa bb aa"},
        {"doc_id": 1, "is_target": False, "text": "cc dd"},
        {"doc_id": 2, "is_target": False, "text": "aa bb"},
        {"doc_id": 3, "is_target": False, "text": ""},
    ]
    ds = rd.from_items(rows).repartition(3)
    base = (dsir_weights(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    # hand oracle: vocab {aa:3,bb:2,cc:1,dd:1} (V=4, tot=7), target
    # counts {aa:2,bb:1} (tot=3); fp(w) rounded once to the 1e-6 grid
    cnt_all = {"aa": 3, "bb": 2, "cc": 1, "dd": 1}
    cnt_tgt = {"aa": 2, "bb": 1, "cc": 0, "dd": 0}

    def fp(w):
        lt = math.log((cnt_tgt[w] + 1) / (3 + 4))
        lr = math.log((cnt_all[w] + 1) / (7 + 4))
        return math.floor((lt - lr) * 1_000_000 + 0.5)

    expect = [fp("aa") * 2 + fp("bb"), fp("cc") + fp("dd"),
              fp("aa") + fp("bb"), 0]
    assert base["dsir_fp"].tolist() == expect
    assert base["n_tokens"].tolist() == [3, 2, 2, 0]
    # on-domain docs (target-vocab tokens) outscore the off-domain doc
    assert base.loc[0, "dsir_fp"] > base.loc[1, "dsir_fp"]

    scale = (dsir_weights(ds, broadcast_limit=0).to_pandas()
             .sort_values("doc_id").reset_index(drop=True)
             .astype(base.dtypes.to_dict()))
    pd.testing.assert_frame_equal(scale, base)


def test_bigram_logprob_hand_math_and_scale_path(ray_session):
    """Bigram conditional log-likelihood matches a hand oracle
    (add-one-smoothed p(w_i|w_{i-1}), V = unigram vocab size), docs with
    <2 tokens score 0, and the beyond-broadcast path is row-identical."""
    import math

    import ray.data as rd

    from opennre_ray.functions.textstats import bigram_logprob

    rows = [
        {"doc_id": 0, "text": "aa bb aa"},
        {"doc_id": 1, "text": "aa bb"},
        {"doc_id": 2, "text": "cc"},
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(rows).repartition(3)
    base = (bigram_logprob(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    # bigram counts: (aa,bb):2, (bb,aa):1; ctx(aa)=2, ctx(bb)=1; V=3
    def fp(c, ctx):
        return math.floor(math.log((c + 1) / (ctx + 3)) * 1_000_000 + 0.5)

    expect = [fp(2, 2) + fp(1, 1), fp(2, 2), 0, 0]
    assert base["bigram_fp"].tolist() == expect
    assert base["n_bigrams"].tolist() == [2, 1, 0, 0]

    scale = (bigram_logprob(ds, broadcast_limit=0).to_pandas()
             .sort_values("doc_id").reset_index(drop=True)
             .astype(base.dtypes.to_dict()))
    pd.testing.assert_frame_equal(scale, base)


def test_winnowing_guarantee_and_edges():
    """Winnowing's core guarantee: two documents sharing a run of at
    least w+k-1 words share at least one selected fingerprint; plus the
    short-doc edge cases mirror shingle_hashes conventions."""
    import numpy as np

    from opennre_ray.functions.dedup import (WINNOW_K, WINNOW_W,
                                             winnow_fingerprints)

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    shared = " ".join(vocab[i % 7] for i in range(WINNOW_W + WINNOW_K - 1))
    for trial in range(20):
        pre = " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        post = " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        a = f"{pre} {shared} {post}".strip()
        b = f"{post} {shared} {pre}".strip()
        _, fa = winnow_fingerprints(a)
        _, fb = winnow_fingerprints(b)
        assert len(np.intersect1d(fa, fb)) >= 1, trial
    # short docs: whole text is the single gram; empty text hashes ''
    ng, fps = winnow_fingerprints("one two")
    assert ng == 1 and len(fps) == 1
    ng0, fps0 = winnow_fingerprints("")
    assert ng0 == 1 and len(fps0) == 1
    # density: the selected set is a small fraction of positional grams
    long = " ".join(rng.choice(vocab, size=2000))
    ng_l, fps_l = winnow_fingerprints(long)
    assert 0 < len(fps_l) < ng_l / 2


def test_registered_domain_suffix_logic():
    """Public-suffix-lite extraction: multi-label suffixes keep three
    labels, plain TLDs keep two, regardless of subdomain depth."""
    from opennre_ray.functions.urls import blocked_domains, registered_domain

    assert registered_domain("site4.co.uk") == "site4.co.uk"
    assert registered_domain("www.site4.co.uk") == "site4.co.uk"
    assert registered_domain("a.b.site4.co.jp") == "site4.co.jp"
    assert registered_domain("site4.com") == "site4.com"
    assert registered_domain("cdn.www.site4.com") == "site4.com"
    # blocklist covers every TLD variant of each blocked site
    b = blocked_domains()
    assert "site5.co.uk" in b and "site17.dev" in b and len(b) == 33
    assert "site4.com" not in b


def test_filter_funnel_planted_parity():
    """The funnel SQL and the scalar flag functions agree on planted docs
    that exercise every flag both ways (the corpus itself makes pii/c4
    degenerate: no PII, no terminal-punctuation lines)."""
    from opennre_ray.functions.textstats import (_LANG_MARKERS, _tokens,
                                                 c4_line_filter,
                                                 gopher_signals, pii_scrub)
    from opennre_ray.pipelines.queries import _sql_filter_funnel

    rng = np.random.default_rng(3)
    fillers = [f"word{i}xy" for i in range(200)]
    prose = " ".join(
        ("the" if i % 11 == 0 else "of" if i % 13 == 0
         else str(rng.choice(fillers))) for i in range(120))
    samples = [
        prose + "\n" + "This sentence is long enough to pass the rules.\n"
        "Another sentence that is long enough to pass.\n"
        "A third sentence that is long enough to pass.",        # all pass
        prose + " contact me at bob@example.com please",         # pii hit
        "zz qq xx " * 40,                                        # lang und
        "tiny",                                                  # gopher fail
        prose,                                                   # c4 fail
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(samples), dtype=np.int64),
                       "source": ["s0"] * len(samples),
                       "text": samples})
    con = duckdb.connect()
    con.register("documents", df)
    got = con.sql(_sql_filter_funnel()).df().iloc[0]
    con.close()

    want = {k: 0 for k in got.index}
    want["n_total"] = len(samples)
    for t in samples:
        g = gopher_signals(t)[5]
        toks = [w.lower() for w in _tokens(t)]
        nt = max(1, len(toks))
        k = int(any(sum(1 for w in toks if w in m) / nt > 0
                    for m in _LANG_MARKERS.values()))
        p = int(sum(pii_scrub(t)[1]) == 0)
        c = c4_line_filter(t)[3]
        want["n_pass_gopher"] += g
        want["n_pass_lang"] += k
        want["n_pass_pii"] += p
        want["n_pass_c4"] += c
        want["n_funnel_lang"] += g * k
        want["n_funnel_pii"] += g * k * p
        want["n_funnel_c4"] += g * k * p * c
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    # every flag must vary across the planted set
    assert 0 < want["n_pass_gopher"] < len(samples)
    assert 0 < want["n_pass_lang"] < len(samples)
    assert 0 < want["n_pass_pii"] < len(samples)
    assert 0 < want["n_pass_c4"] < len(samples)
    assert want["n_funnel_c4"] >= 1


def test_length_quantile_rank_formula():
    """The histogram rank selection replays DuckDB quantile_disc exactly
    across random multisets and sizes (including heavy ties)."""
    import math

    from opennre_ray.pipelines.queries import LENGTH_QUANTILES

    rng = np.random.default_rng(11)
    con = duckdb.connect()
    for n in (1, 2, 3, 7, 50, 333):
        vals = rng.integers(0, 12, size=n)
        want = con.sql(
            f"SELECT quantile_disc(x, {list(LENGTH_QUANTILES)}) "
            f"FROM unnest({vals.tolist()}) t(x)").fetchone()[0]
        h = pd.Series(vals).value_counts().sort_index()
        cum = h.cumsum().to_numpy()
        uniq = h.index.to_numpy()
        got = [int(uniq[np.searchsorted(
            cum, max(math.ceil(q * n) - 1, 0) + 1, side="left")])
            for q in LENGTH_QUANTILES]
        assert got == list(want), (n, got, want)
    con.close()


def test_zipf_alpha_planted_slope(ray_session, tmp_path):
    """A corpus planted with freq(rank) ∝ rank^-1 fits alpha ≈ 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opennre_ray.pipelines import queries as Q

    words = []
    for r in range(1, 61):
        words += [f"tok{r:03d}"] * max(1, round(6000 / r))
    rng = np.random.default_rng(5)
    rng.shuffle(words)
    docs = [" ".join(words[i::40]) for i in range(40)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": list(range(40)), "text": docs}),
                   sf / "documents.parquet")
    out = Q.docs_zipf_alpha(str(sf))
    alpha = float(out["zipf_alpha"].iloc[0])
    assert 0.9 < alpha < 1.1, alpha
    assert int(out["n_ranks"].iloc[0]) == 60


def test_mojibake_duckdb_parity(ray_session):
    """Python re and DuckDB RE2 count encoding artifacts identically on
    artifact-BEARING strings (the corpus itself is clean, so the
    corpus-level query only pins the identity path)."""
    from opennre_ray.functions.textstats import mojibake_signals
    from opennre_ray.pipelines.queries import _sql_mojibake

    samples = [
        "perfectly clean prose with nothing odd",
        "caf\u00c3\u00a9 menu twice: caf\u00c3\u00a9",
        "quote \u00e2\u20ac\u2122 and \u00e2\u20ac\u0153both"
        "\u00e2\u20ac\u009d kinds",
        "lost byte \ufffd here and \ufffd there",
        "bell\x07 and null-adjacent\x1f controls\x0b",
        "nbsp\u00c2\u00a0damage",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(samples), dtype=np.int64),
                       "text": samples})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(_sql_mojibake()).df().set_index("doc_id")
    con.close()
    assert want["n_mojibake"].sum() > 0
    assert want["n_replacement"].sum() > 0
    assert want["n_control"].sum() > 0
    for i, s in enumerate(samples):
        mj, rp, ct, ok = mojibake_signals(s)
        row = want.loc[i]
        assert (mj, rp, ct, ok) == (row["n_mojibake"], row["n_replacement"],
                                    row["n_control"], row["clean"]), s


def test_link_graph_render_extract_roundtrip():
    """The href regex recovers EXACTLY the deterministic outlink targets
    from the rendered markup — the extraction path is real (regex over
    html bytes), not a replay of the generator."""
    import pyarrow as pa

    from opennre_ray.functions.urls import (
        extract_links_batch, n_outlinks, outlink_target, render_linked_html)

    n_docs = 97
    for doc_id in (0, 1, 42, 96):
        html = render_linked_html(doc_id, n_docs)
        assert html.startswith(b"<html>") and b"<footer>" in html
        k = n_outlinks(doc_id)
        assert 1 <= k <= 3
        batch = pa.table({"doc_id": pa.array([doc_id], pa.int64()),
                          "source": pa.array(["s"], pa.string())})
        edges = extract_links_batch(batch, n_docs)
        assert edges.column("dst_doc").to_pylist() == [
            outlink_target(doc_id, j, n_docs) for j in range(k)]
        assert edges.column("src_source").to_pylist() == ["s"] * k


def test_cusum_closed_form_equals_recursion():
    """events_cusum_drift computes Page's CUSUM via the closed form
    S_d = C_d - min(0, min prefix C) — verify against the textbook
    recursion S_d = max(0, S_{d-1} + y_d) on adversarial series."""
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(50):
        y = rng.integers(-1000, 1000, size=rng.integers(1, 40))
        c = np.cumsum(y)
        closed = c - np.minimum(np.minimum.accumulate(c), 0)
        s, rec = 0, []
        for v in y.tolist():
            s = max(0, s + v)
            rec.append(s)
        assert closed.tolist() == rec


def test_cusum_drift_flags_planted_shift(ray_session, tmp_path):
    """A planted mean shift in the back half of one type's daily series
    must raise the drift flag there and nowhere in the flat type."""
    import numpy as np
    import pandas as pd

    from opennre_ray.pipelines.queries import events_cusum_drift

    days = pd.date_range("2024-01-01", periods=20, freq="D")
    rows = []
    eid = 0
    for d_i, day in enumerate(days):
        n_flat = 10
        n_shift = 10 if d_i < 10 else 40          # sustained 4x jump
        for etype, n in (("flat", n_flat), ("shift", n_shift)):
            for k in range(n):
                rows.append({"event_id": eid, "ts": day + pd.Timedelta(minutes=k),
                             "user_id": k, "event_type": etype,
                             "value": 1.0, "props": "{}"})
                eid += 1
    df = pd.DataFrame(rows)
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")

    out = events_cusum_drift(str(sf))
    flat = out[out["event_type"] == "flat"]
    shift = out[out["event_type"] == "shift"]
    assert int(flat["drift"].sum()) == 0
    assert int(shift["drift"].sum()) > 0
    # flag fires in the shifted back half only
    assert (shift.loc[shift["drift"] == 1, "day"] >= "2024-01-11").all()
    # exact-integer invariants
    assert (out["cusum_micro"] >= 0).all()


def test_vocab_coverage_invariants(ray_session, sf_dir):
    from opennre_ray.pipelines.queries import docs_vocab_coverage

    out = docs_vocab_coverage(sf_dir).sort_values("v").reset_index(drop=True)
    assert out["v"].tolist() == [10, 100, 1000]
    # coverage is monotone in v, bounded by 1e6, top_sum bounded by total
    assert out["coverage_micro"].is_monotonic_increasing
    assert (out["coverage_micro"] <= 10 ** 6).all()
    assert (out["top_sum"] <= out["total_tokens"]).all()
    assert (out["vocab_size"] > 0).all()


def test_filter_agreement_identities(ray_session, sf_dir):
    from opennre_ray.pipelines.queries import docs_filter_agreement

    row = docs_filter_agreement(sf_dir).iloc[0]
    a, b, c, d = (int(row["n_both_keep"]), int(row["n_gopher_only"]),
                  int(row["n_clf_only"]), int(row["n_both_drop"]))
    n = int(row["n_docs"])
    assert a + b + c + d == n > 0
    pe = (a + b) * (a + c) + (c + d) * (b + d)
    assert int(row["kappa_num"]) == n * (a + d) - pe
    assert int(row["kappa_den"]) == n * n - pe
    assert int(row["agreement_micro"]) == 10 ** 6 * (a + d) // n
    # kappa is a proper fraction: |kappa| <= 1  =>  |num| <= den
    assert abs(int(row["kappa_num"])) <= int(row["kappa_den"])


def test_kg_entity_pagerank_covers_non_na_endpoints(ray_session, sf_dir):
    """Composition sanity for the pinned query: the rank table covers
    EXACTLY the endpoint entities of non-NA predicted triples (pagerank
    math itself is sequential-parity-tested in test_graph)."""
    import pandas as pd

    from opennre_ray.pipelines.queries import (_predicted_triples,
                                               kg_entity_pagerank)

    tri = _predicted_triples(sf_dir).to_pandas()
    tri = tri[tri["pred"] != "NA"]
    want = set(tri["subj"]) | set(tri["obj"])
    got = kg_entity_pagerank(sf_dir).to_pandas()
    assert set(got["entity"]) == want
    assert (got["rank_micro"] > 0).all()


def test_kg_snapshot_diff_matches_sequential(ray_session, sf_dir):
    """Distributed == sequential: recompute the two-snapshot diff with a
    slow pandas pass over the same scored instance stream."""
    import numpy as np
    import pandas as pd

    from opennre_ray.functions.packing import split_draws
    from opennre_ray.functions.rules import _CKSUM_MOD, _triple_cksum
    from opennre_ray.pipelines.kg import candidate_instances
    from opennre_ray.pipelines.queries import kg_snapshot_diff
    from opennre_ray.sources.pages import read_pages

    inst = candidate_instances(read_pages(sf_dir)) \
        .select_columns(["h_id", "pred_rel", "t_id", "url"]).to_pandas()
    inst["snap"] = (split_draws(inst["url"].tolist(), "snap") & 1)
    g = inst.assign(in_a=(inst["snap"] == 0).astype(int),
                    in_b=(inst["snap"] == 1).astype(int)) \
        .groupby(["h_id", "pred_rel", "t_id"], as_index=False) \
        .agg(in_a=("in_a", "max"), in_b=("in_b", "max"))
    status = np.where((g["in_a"] > 0) & (g["in_b"] > 0), "stable",
                      np.where(g["in_b"] > 0, "added", "retired"))
    g = g.assign(status=status,
                 cks=_triple_cksum(g["h_id"], g["pred_rel"], g["t_id"]))
    want = (g.groupby(["pred_rel", "status"], as_index=False)
            .agg(n_triples=("cks", "size"), checksum=("cks", "sum")))
    want["checksum"] = want["checksum"] % _CKSUM_MOD
    want = want.rename(columns={"pred_rel": "pred"}) \
        .sort_values(["pred", "status"]).reset_index(drop=True)

    got = kg_snapshot_diff(sf_dir)
    pd.testing.assert_frame_equal(
        got.astype({"n_triples": "int64", "checksum": "int64"}),
        want.astype({"n_triples": "int64", "checksum": "int64"}))


def test_kneser_ney_hand_math_and_scale_path(ray_session):
    """Kneser-Ney bigram LM matches a hand replay of the integer nano
    fixed-point chain (d = 0.75), docs with <2 tokens score 0, and the
    beyond-broadcast scoring path is row-identical."""
    import math

    import ray.data as rd

    from opennre_ray.functions.textstats import kneser_ney_logprob

    rows = [
        {"doc_id": 0, "text": "aa bb aa"},
        {"doc_id": 1, "text": "aa bb"},
        {"doc_id": 2, "text": "cc"},
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(rows).repartition(3)
    base = (kneser_ney_logprob(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    # bigram counts: (aa,bb):2, (bb,aa):1 -> n_types=2
    # c1(aa)=2 n1p(aa)=1; c1(bb)=1 n1p(bb)=1; ncont(bb)=1, ncont(aa)=1
    def p_nano(c, c1, n1p, nc, nt=2):
        t1 = max(c * 10 ** 9 - 750_000_000, 0) // c1
        lam = 750_000_000 * n1p // c1
        pc = nc * 10 ** 9 // nt
        return t1 + lam * pc // 10 ** 9

    def fp(p):
        return math.floor(math.log(p / 1e9) * 1_000_000 + 0.5)

    fp_aabb = fp(p_nano(2, 2, 1, 1))
    fp_bbaa = fp(p_nano(1, 1, 1, 1))
    assert base["kn_fp"].tolist() == [fp_aabb + fp_bbaa, fp_aabb, 0, 0]
    assert base["n_bigrams"].tolist() == [2, 1, 0, 0]

    scale = (kneser_ney_logprob(ds, broadcast_limit=0).to_pandas()
             .sort_values("doc_id").reset_index(drop=True)
             .astype(base.dtypes.to_dict()))
    pd.testing.assert_frame_equal(scale, base)


def test_stage_cache_reuses_and_stays_standalone(ray_session, sf_dir):
    """The session-scoped model-stage cache must hand back the SAME
    materialized dataset on a second request (one scoring pass per
    session) while distinct stages/sf keys stay separate."""
    import opennre_ray.pipelines.queries as Q

    Q._STAGE_CACHE.clear()
    a = Q._scored_candidates(sf_dir)
    b = Q._scored_candidates(sf_dir)
    assert a is b
    # pair-level consumers reuse the scored entry (pre-score columns
    # are retained), not a second front-half pass
    p = Q._pair_instances(sf_dir)
    assert p is a
    # a different stage key gets its own entry
    t = Q._predicted_triples(sf_dir)
    assert t is not a
    assert {k[1] for k in Q._STAGE_CACHE} >= {
        "scored:wiki80_cnn_softmax", "pred_triples"}
    Q._STAGE_CACHE.clear()
