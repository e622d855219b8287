"""Property tests for the Python ↔ DuckDB oracle contract.

Every value-oracled query rests on a handful of scalar functions computing
IDENTICALLY in both engines (md5-derived 64-bit hashes, the Rabin-Karp
fold, whitespace tokenization). Hypothesis hammers those equivalences on
adversarial ASCII inputs so oracle drift fails here before it fails in the
driver's hash compare.
"""

import duckdb

from hypothesis import given, settings, strategies as st

from opennre_ray.functions.dedup import _word_hash64, simhash64
from opennre_ray.functions.packing import hash_split  # noqa: F401  (import check)

# words of printable ASCII sans whitespace; texts join them with spaces
_word = st.text(
    st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=8).filter(lambda w: "'" not in w)
_text = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(_word)
def test_word_hash64_matches_duckdb(w):
    c = duckdb.connect()
    got = c.execute(
        "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", [w]).fetchone()[0]
    c.close()
    assert got == _word_hash64(w)


@settings(max_examples=40, deadline=None)
@given(_text)
def test_simhash_matches_duckdb(text):
    c = duckdb.connect()
    sql = r"""
    WITH words AS (
      SELECT w FROM (SELECT unnest(regexp_split_to_array(?, '\s+')) AS w)
      WHERE w <> ''),
    hashed AS (SELECT ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
               FROM words),
    bits AS (
      SELECT i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
      FROM hashed, range(64) t(i) GROUP BY i)
    SELECT COALESCE(SUM(CASE WHEN acc > 0 THEN (1::UBIGINT << i)
                        ELSE 0::UBIGINT END), 0)::UBIGINT FROM bits
    """
    got = c.execute(sql, [text]).fetchone()[0]
    c.close()
    assert int(got) == simhash64(text)


@settings(max_examples=40, deadline=None)
@given(_text)
def test_rolling_hash_matches_duckdb(text):
    c = duckdb.connect()
    sql = """
    SELECT CASE WHEN ? = '' THEN 0::UBIGINT
    ELSE list_reduce(
      list_prepend(0::HUGEINT,
        list_transform(split(?, ''), c -> unicode(c)::HUGEINT)),
      (a, b) -> (a * 257 + b) % 2305843009213693951
    )::UBIGINT END
    """
    got = c.execute(sql, [text, text]).fetchone()[0]
    MOD = (1 << 61) - 1
    h = 0
    for b in text.encode():
        h = (h * 257 + b) % MOD
    c.close()
    assert int(got) == h


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=-10**12, max_value=10**12))
def test_split_draw_matches_duckdb(key):
    import hashlib
    c = duckdb.connect()
    got = c.execute(
        "SELECT ('0x' || substr(md5(?::BIGINT::VARCHAR), 1, 8))::UBIGINT",
        [key]).fetchone()[0]
    c.close()
    assert int(got) == int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


@settings(max_examples=40, deadline=None)
@given(_text)
def test_tokenization_matches_duckdb(text):
    """Python str.split() == DuckDB split-then-filter on ASCII text — the
    convention every docs_* oracle uses."""
    c = duckdb.connect()
    got = c.execute(
        r"SELECT list_filter(regexp_split_to_array(?, '\s+'), "
        r"x -> x <> '')", [text]).fetchone()[0]
    c.close()
    assert list(got) == text.split()


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**8))
def test_exp_grid_matches_duckdb(x):
    """floor(exp(excess/1e7)·1e6 + 0.5) — the docs_doremi_weights score
    grid — must agree between Python libm (math.exp) and DuckDB's
    vectorized exp over the whole excess range the query can produce
    (excess ≤ ~1e8 micro ⇒ exp argument ≤ 10). A divergence near a
    .5 rounding boundary would otherwise only surface as a full-query
    hash mismatch."""
    import math
    from opennre_ray.pipelines.queries import DOREMI_ETA_DEN
    c = duckdb.connect()
    got = c.execute(f"""
        SELECT CAST(floor(exp({x}::HUGEINT::DOUBLE
                              / {DOREMI_ETA_DEN * 1_000_000}.0)
                          * 1000000 + 0.5) AS HUGEINT)
        """).fetchone()[0]
    c.close()
    want = int(math.floor(
        math.exp(x / (DOREMI_ETA_DEN * 1_000_000.0)) * 1_000_000 + 0.5))
    assert int(got) == want


@settings(max_examples=60, deadline=None)
@given(st.one_of(
    st.integers(min_value=0, max_value=10**22),
    # adversarial: exact squares and their neighbors, where floor(sqrt)
    # off-by-one errors from the double conversion would surface
    st.integers(min_value=0, max_value=10**11).flatmap(
        lambda r: st.sampled_from([r * r, max(r * r - 1, 0), r * r + 1]))))
def test_integer_sqrt_matches_duckdb(x):
    """The floor(sqrt(x::DOUBLE)) + adjust HUGEINT expression used by the
    docs_burrows_delta oracle == math.isqrt for the full radicand range
    the query can produce (sum of squared deviations ≤ ~8e21). x is
    embedded as a LITERAL: the Python client binds ints > 2^63 through
    DOUBLE, which would corrupt the radicand before the cast (the oracle
    itself computes x natively in HUGEINT, so binding never applies)."""
    import math
    c = duckdb.connect()
    got = c.execute(f"""
        SELECT s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN 1 ELSE 0 END)
                  - (CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END)
        FROM (SELECT {x}::HUGEINT AS x,
                     CAST(floor(sqrt({x}::HUGEINT::DOUBLE)) AS HUGEINT)
                         AS s0)
        """).fetchone()[0]
    c.close()
    assert int(got) == math.isqrt(x)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", max_size=8), st.text(alphabet="abc", max_size=8))
def test_dist_le1_matches_levenshtein(a, b):
    """The O(len) ≤1-edit fast path must agree with the capped DP for
    every pair (None ⇔ distance > 1) — it is the hot verify of the
    blocked string self-join."""
    from opennre_ray.functions.dedup import _dist_le1, levenshtein

    d = levenshtein(a, b, cap=1)
    got = _dist_le1(a, b)
    if d <= 1:
        assert got == d
    else:
        assert got is None
