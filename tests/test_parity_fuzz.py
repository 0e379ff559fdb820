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
