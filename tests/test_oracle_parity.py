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
