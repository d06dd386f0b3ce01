"""Cross-engine parity of the shared hashing primitives.

The entire dedup/fingerprint oracle story rests on shared_hash.py emitting
byte-identical values in Spark and DuckDB; these property tests drive both
engines over generated corpora (including whitespace-edge and short-doc
shapes the fixed testdata never hits).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from insar_spark.functions import shared_hash as SH

WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
TEXT = st.lists(WORD, min_size=1, max_size=40).map(" ".join)


def _both_engines(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a, b = SH.perm_params(8, seed=42)
    sh = SH.shingle_hashes_col(F.col("text"), 3)
    tokh = F.transform(SH.tokens_col(F.col("text")), SH.h60_col)
    got = (
        df.select(
            "doc_id",
            sh.alias("shash"),
            SH.minhash_sig_col(sh, a, b).alias("sig"),
            SH.simhash_col(tokh).alias("simhash"),
            SH.winnow_col(sh, 4).alias("fps"),
        )
        .orderBy("doc_id")
        .toPandas()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(texts)))
    A = "[" + ",".join(map(str, a)) + "]"
    B = "[" + ",".join(map(str, b)) + "]"
    shs = SH.sql_shingle_hashes("text", 3)
    tks = (
        f"list_transform({SH.SQL_TOKENS.format(text='text')}, "
        f"_t -> {SH.sql_h60('_t')})"
    )
    exp = con.execute(
        f"""
WITH s AS (SELECT doc_id, {shs} AS shash, {tks} AS tokh FROM d)
SELECT doc_id, shash,
  list_transform(range(0, 8), j -> list_min(list_transform(shash,
    h -> ({A}[j+1] * (h % {SH.P31}) + {B}[j+1]) % {SH.P31}))) AS sig,
  {SH.sql_simhash('tokh')} AS simhash,
  {SH.sql_winnow('shash', 4)} AS fps
FROM s ORDER BY doc_id"""
    ).df()
    return got, exp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_hash_primitives_cross_engine(spark, texts):
    got, exp = _both_engines(spark, texts)
    for col in ("shash", "sig", "simhash", "fps"):
        for i in range(len(texts)):
            sv, dv = got[col][i], exp[col][i]
            sl = list(sv) if hasattr(sv, "__iter__") else sv
            dl = list(dv) if hasattr(dv, "__iter__") else dv
            assert sl == dl, (col, i, texts[i])


def test_hash_edge_shapes(spark):
    """Deterministic edge corpus: shorter than shingle/window sizes,
    single-char tokens, repeated tokens."""
    texts = ["x", "a b", "a a a a a a a a", "one two", "w " * 3 + "w"]
    texts = [t.strip() for t in texts]
    got, exp = _both_engines(spark, texts)
    for col in ("shash", "sig", "simhash", "fps"):
        for i in range(len(texts)):
            sv, dv = got[col][i], exp[col][i]
            sl = list(sv) if hasattr(sv, "__iter__") else sv
            dl = list(dv) if hasattr(dv, "__iter__") else dv
            assert sl == dl, (col, i, texts[i])


def test_h60_matches_known_md5(spark):
    """Anchor: the shared 60-bit hash equals int(md5_hex[:15], 16)."""
    import hashlib

    vals = ["hello", "a", "zz9"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", SH.h60_col(F.col("s")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_hash_range_is_60_bits(spark):
    con = duckdb.connect()
    mx = con.execute(
        "SELECT max(" + SH.sql_h60("x") + ") FROM (SELECT 'q'||range::VARCHAR x FROM range(500))"
    ).fetchone()[0]
    assert 0 < mx < (1 << 60)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
