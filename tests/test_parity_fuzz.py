"""Cross-engine parity fuzz: the oracle queries assume Spark and DuckDB
agree on split/regex/md5/json semantics. Feed both engines the same
seeded-random awkward strings and require identical results — if an
assumption drifts (e.g. split's trailing-empty behavior), this fails
before the driver's gate does."""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
    text as X,
)

ALPHABET = string.ascii_letters + string.digits + "   .,;!?#()[]-_の的了"


@pytest.fixture(scope="module")
def samples():
    rng = random.Random(1234)
    out = []
    for _ in range(150):
        n = rng.randint(0, 60)
        out.append("".join(rng.choice(ALPHABET) for _ in range(n)))
    # adversarial shapes
    out += ["", " ", "  ", "a ", " a", "a  b", "\tx", "a b ", "the the the"]
    return out


def _duck(samples, expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(samples)))
    return [r[0] for r in con.execute(f"SELECT {expr} FROM t ORDER BY i").fetchall()]


def _spark(spark, samples, col):
    df = spark.createDataFrame(list(enumerate(samples)), "i INT, s STRING")
    return [r.v for r in df.select(col.alias("v")).orderBy("i").collect()]


def test_token_count_parity(spark, samples):
    got = _spark(spark, samples, F.size(F.split("s", " ")))
    want = _duck(samples, "len(string_split(s, ' '))")
    assert got == want


def test_md5_fingerprint_parity(spark, samples):
    got = _spark(spark, samples, X.fingerprint("s"))
    want = _duck(
        samples, "md5(trim(regexp_replace(lower(s), '\\s+', ' ', 'g')))"
    )
    assert got == want


def test_word_token_regex_parity(spark, samples):
    got = _spark(spark, samples, F.size(X.word_tokens("s")))
    want = _duck(
        samples,
        r"len(regexp_extract_all(s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))",
    )
    assert got == want


def test_length_parity(spark, samples):
    """length() counts CHARACTERS (not bytes) in both engines, incl.
    multibyte CJK."""
    got = _spark(spark, samples, F.length("s"))
    want = _duck(samples, "length(s)")
    assert got == want


def test_levenshtein_parity(spark, samples):
    """er_match scores candidates by levenshtein on both engines.
    PARITY HOLDS FOR ASCII ONLY: DuckDB computes edit distance over
    UTF-8 BYTES while Spark uses codepoints, so multibyte strings
    diverge (pinned below) — oracle queries must keep levenshtein
    inputs ASCII (er_match's customer names are)."""
    ascii_samples = [x.encode("ascii", "ignore").decode() for x in samples]
    pairs = list(zip(ascii_samples, list(ascii_samples[1:]) + [ascii_samples[0]]))
    df = spark.createDataFrame(list(enumerate(pairs)), "i INT, p STRUCT<a: STRING, b: STRING>")
    got = [r.v for r in df.select(F.levenshtein("p.a", "p.b").alias("v")).orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", [(i, a, b) for i, (a, b) in enumerate(pairs)])
    want = [r[0] for r in con.execute("SELECT levenshtein(a, b) FROM t ORDER BY i").fetchall()]
    assert got == want
    # pin the known multibyte divergence so a behavior change surfaces:
    # 'の' is 3 UTF-8 bytes — DuckDB counts 3 edits, Spark counts 1.
    s_lev = (
        spark.createDataFrame([("の", "")], "a STRING, b STRING")
        .select(F.levenshtein("a", "b").alias("v"))
        .collect()[0]
        .v
    )
    d_lev = con.execute("SELECT levenshtein('の', '')").fetchone()[0]
    assert s_lev == 1 and d_lev == 3


def test_md5_lane_parse_parity(spark, samples):
    """table_fingerprint's 60-bit lane: Spark conv(hex,16,10) must
    equal DuckDB's ('0x'||hex)::BIGINT on both lanes."""
    lane = lambda a: F.conv(F.substring(F.md5("s"), a, 15), 16, 10).cast("long")  # noqa: E731
    got = _spark(spark, samples, lane(1)) + _spark(spark, samples, lane(17))
    want = _duck(samples, "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)") + _duck(
        samples, "CAST(('0x' || substr(md5(s), 17, 15)) AS BIGINT)"
    )
    assert got == want


def test_printf_float_format_parity(spark):
    """%.2f formatting (fingerprint row strings): PARITY HOLDS FOR
    VALUES THAT ARE ALREADY 2-DECIMAL (prices in cents — the
    table_fingerprint contract). Doubles whose shortest repr has a
    halfway digit beyond 2 places (2.675, -0.125) DIVERGE: Java
    formats via shortest-repr HALF_UP (2.68) while C printf rounds
    the exact binary half-even (2.67) — pinned below."""
    import random

    rng = random.Random(77)
    vals = [round(rng.uniform(-1e6, 1e6), 2) for _ in range(300)]
    vals += [0.0, -0.5, 1234.5, 1e-9]
    df = spark.createDataFrame(list(enumerate(vals)), "i INT, x DOUBLE")
    got = [r.v for r in df.select(F.format_string("%.2f", "x").alias("v")).orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    want = [r[0] for r in con.execute("SELECT printf('%.2f', x) FROM t ORDER BY i").fetchall()]
    assert got == want
    # pin the halfway divergence (do NOT feed such values to the
    # fingerprint row string):
    s_fmt = (
        spark.createDataFrame([(2.675,)], "x DOUBLE")
        .select(F.format_string("%.2f", "x").alias("v"))
        .collect()[0]
        .v
    )
    d_fmt = con.execute("SELECT printf('%.2f', 2.675::DOUBLE)").fetchone()[0]
    assert s_fmt == "2.68" and d_fmt == "2.67"


def test_fold_parity(spark):
    """ewma_value's recursion: F.aggregate left fold must equal
    DuckDB list_reduce element-for-element on random double series."""
    import random

    rng = random.Random(99)
    seqs = [[round(rng.uniform(-100, 100), 2) for _ in range(rng.randint(1, 40))] for _ in range(60)]
    df = spark.createDataFrame(list(enumerate(seqs)), "i INT, v ARRAY<DOUBLE>")
    ew = F.aggregate(
        F.slice(F.col("v"), 2, F.size("v") - 1),
        F.element_at(F.col("v"), 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    got = [r.y for r in df.select(ew.alias("y")).orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, v DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(seqs)))
    want = [
        r[0]
        for r in con.execute(
            "SELECT list_reduce(v, (acc, x) -> 0.3e0*x + 0.7e0*acc) FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == want
