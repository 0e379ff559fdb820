"""Unit pins for operators/curation.py: hand-computed repetition
ratios, planted contamination, and exact greedy-packing bins."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
    contamination,
    pack_greedy,
    top_gram_fraction,
    with_repetition_stats,
)


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a b"),  # 4 toks {a,b}; bigrams aa aa ab
            Row(doc_id=1, text="x y z"),  # all distinct
            Row(doc_id=2, text="solo"),  # < 2 tokens → gram frac 0
        ]
    )
    got = {
        r.doc_id: r
        for r in with_repetition_stats(df, "text", n=2).collect()
    }
    assert got[0].n_tokens == 4
    assert abs(got[0].dup_word_frac - 0.5) < 1e-12  # 1 - 2/4
    assert abs(got[0].dup_gram_frac - (1 - 2 / 3)) < 1e-12
    assert got[1].dup_word_frac == 0.0 and got[1].dup_gram_frac == 0.0
    assert got[2].dup_word_frac == 0.0 and got[2].dup_gram_frac == 0.0


def test_top_gram_fraction_and_short_doc_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a a a b"), Row(doc_id=1, text="solo")]
    )
    rows = top_gram_fraction(df, "doc_id", "text", n=2).collect()
    assert {r.doc_id for r in rows} == {0}  # 1-token doc has no bigrams
    r = rows[0]
    assert r.n_grams == 3 and r.top_gram_count == 2  # "a a" twice
    assert abs(r.top_gram_frac - round(2 / 3, 6)) < 1e-12


def test_contamination_planted_overlap(spark):
    leak = "the quick brown fox jumps"
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words {leak} outro tail"),
            Row(doc_id=2, text="completely disjoint text with no overlap"),
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=100, text=leak)])
    rows = contamination(train, bench, n=3).collect()
    assert [r.doc_id for r in rows] == [1]
    r = rows[0]
    # leak contributes its 3 distinct trigrams; doc 1 has 7 distinct
    assert r.n_shared_grams == 3 and r.n_grams == 7
    assert abs(r.contamination_frac - round(3 / 7, 6)) < 1e-12


def test_pack_greedy_bins_and_partitioned_reset(spark):
    df = spark.createDataFrame(
        [
            Row(src="a", doc_id=0, tok=300),
            Row(src="a", doc_id=1, tok=300),  # starts at 300 → pack 0
            Row(src="a", doc_id=2, tok=300),  # starts at 600 → pack 1
            Row(src="b", doc_id=3, tok=600),  # new partition resets → 0
            Row(src="b", doc_id=4, tok=10),  # starts at 600 → pack 1
        ]
    )
    got = {
        r.doc_id: r.pack_id
        for r in pack_greedy(
            df, "tok", 512, order_col="doc_id", part_col="src"
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 0, 4: 1}


def test_repetition_filter_composes_scan_side(spark, sf_dir):
    """The HOF metrics must compose into a pushed filter (no shuffle
    in the plan before the filter)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    d = T(spark, sf_dir, "documents")
    plan = (
        with_repetition_stats(d, "text")
        .filter(F.col("dup_word_frac") < 0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pii_redaction_hand_cases(spark):
    """Planted emails/phones are scrubbed to placeholders; clean text
    is untouched; phone digits inside an email's local part are not
    double-counted (emails removed before phone matching)."""
    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.text import (
        pii_counts,
        redact_pii,
    )

    rows = [
        (1, "write to alice.smith+x@mail.example.org today"),
        (2, "call 555-0199 or 555-0200"),
        (3, "clean text, nothing to see"),
        (4, "dual: bob@x.io and 123-4567"),
        (5, "tricky 123-4567@a.bc local part looks like a phone"),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    emails, phones = pii_counts("t")
    out = {
        r.i: (r.s, r.ne, r.np)
        for r in df.select("i", redact_pii("t").alias("s"), emails.alias("ne"), phones.alias("np")).collect()
    }
    assert out[1] == ("write to <EMAIL> today", 1, 0)
    assert out[2] == ("call <PHONE> or <PHONE>", 0, 2)
    assert out[3] == ("clean text, nothing to see", 0, 0)
    assert out[4] == ("dual: <EMAIL> and <PHONE>", 1, 1)
    assert out[5][1] == 1 and out[5][2] == 0  # email eaten first


def test_temperature_mixture_flattens_and_nests(spark):
    """sqrt-temperature mixing: (a) budget shares are flatter than raw
    proportions (head source's share drops, tail's rises); (b) nested-
    sample property — every doc kept at budget B is kept at B' > B."""
    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
        temperature_mixture,
    )

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = (
        temperature_mixture(df, "source", "doc_id", budget=200)
        .select("source", "n", "w_micro", "tw", "target")
        .distinct()
        .collect()
    )
    by_src = {r.source: r for r in plan}
    raw_head = by_src["head"].n / 1000.0                      # 0.9
    mixed_head = by_src["head"].w_micro / by_src["head"].tw   # sqrt-flattened
    assert mixed_head < raw_head
    assert (by_src["tail"].w_micro / by_src["tail"].tw) > 0.1

    kept = lambda b: {  # noqa: E731
        r.doc_id
        for r in temperature_mixture(df, "source", "doc_id", budget=b)
        .filter(F.col("keep"))
        .collect()
    }
    small, big = kept(200), kept(600)
    assert small <= big and len(small) < len(big)


def test_slice_packs_conservation_and_straddle(spark):
    """Hand-computed: window 10, docs of 4/8/10/3 tokens in one shard.
    Stream offsets 0/4/12/22 → doc2 straddles packs 0-1, doc4 straddles
    packs 2(?) — verify spans exactly and that every token lands in
    exactly one span."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
        slice_packs,
    )

    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 10), (4, 3)], "doc_id long, tok int"
    )
    got = {
        (r.doc_id, r.pack_id): (r.seg_off, r.seg_len)
        for r in slice_packs(df, "tok", 10).collect()
    }
    assert got == {
        (1, 0): (0, 4),        # tokens 0-3
        (2, 0): (0, 6),        # tokens 4-9
        (2, 1): (6, 2),        # tokens 10-11 → straddle into pack 1
        (3, 1): (0, 8),        # tokens 12-19
        (3, 2): (8, 2),        # tokens 20-21
        (4, 2): (0, 3),        # tokens 22-24
    }
    assert sum(l for _, l in got.values()) == 25  # conservation


def test_dsir_scores_rank_target_alike_above_disjoint(spark):
    """DSIR importance scores (operators/curation.py::dsir_scores):
    a pool document written in the target domain's bigram vocabulary
    must outscore one with disjoint vocabulary — and the
    target-vocabulary doc's score is positive (its buckets carry
    target mass) while the disjoint doc's is negative (its buckets
    carry pool-only mass). Counts are pinned too: n_grams is the raw
    bigram occurrence count."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
        dsir_scores,
    )

    target_text = "solar flux telemetry beacon " * 6
    disjoint_text = "gravel permit invoice ledger " * 6
    target = spark.createDataFrame(
        [(100 + i, target_text.strip()) for i in range(4)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, target_text.strip()), (2, disjoint_text.strip())],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in dsir_scores(train, target, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2}
    # 24 tokens -> 23 bigram occurrences per doc
    assert got[1].n_grams == 23 and got[2].n_grams == 23
    assert got[1].score > got[2].score
    assert got[1].score > 0 > got[2].score
