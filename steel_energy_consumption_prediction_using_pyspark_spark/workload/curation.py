"""Corpus-curation workload: repetition metrics, decontamination,
sequence packing, and data-quality summaries (operators/curation.py,
operators/quality.py) — all DuckDB-oracle-checked.

Oracle-parity notes:
- word n-grams are generated identically on both sides from
  `split(text, ' ')` / `string_split(text, ' ')` (trailing empty
  fields preserved by both, pinned in tests);
- every fraction is exact-int division cast to double, rounded with
  identical arithmetic on both sides;
- DuckDB `range(a, b)` is end-exclusive and lists are 1-indexed —
  gram i concatenates ws[i] .. ws[i+n-1], matching shingles_from's
  sequence(1, size-n+1) indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
    curation as C,
)
from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
    quality as Q,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

PACK_WINDOW = 512  # tokens per context window in pack_windows
_BENCH_MOD = 10  # doc_id % 10 == 0 plays the benchmark corpus


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition report per language: average
    duplicate-word fraction, duplicate-bigram fraction (both per-row
    HOFs — no shuffle before the final roll-up) and average
    top-bigram mass fraction (two doc-keyed map-side-combinable
    shuffles). Docs shorter than 2 tokens carry dup_gram_frac = 0 and
    are absent from the top-gram side (left join → 0-filled)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    rep = C.with_repetition_stats(d, "text", n=2).select(
        "doc_id",
        "lang",
        F.round("dup_word_frac", 6).alias("dw"),
        F.round("dup_gram_frac", 6).alias("dg"),
    )
    top = C.top_gram_fraction(d, "doc_id", "text", n=2).select(
        "doc_id", "top_gram_frac"
    )
    joined = rep.join(top, "doc_id", "left").fillna({"top_gram_frac": 0.0})
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dw"), 6).alias("avg_dup_word_frac"),
            F.round(F.avg("dg"), 6).alias("avg_dup_bigram_frac"),
            F.round(F.avg("top_gram_frac"), 6).alias("avg_top_bigram_frac"),
        )
        .orderBy("lang")
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark 3-gram decontamination: documents with
    doc_id % 10 == 0 play the benchmark corpus; the 20 most
    contaminated training docs (shared-distinct-gram count, doc_id
    tiebreak) are reported. The benchmark gram set is broadcast, so
    the training side never shuffles (operators/curation.py)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = d.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        C.contamination(train, bench, n=3)
        .orderBy(F.desc("n_shared_grams"), F.asc("doc_id"))
        .limit(20)
    )


def q_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing per source shard: route each doc to the
    512-token context window its token stream starts in (prefix-sum
    packing, operators/curation.py::pack_greedy), then report packs
    and utilization per source. partitionBy(source) keeps the window
    sort per-shard — the distributable shape."""
    d = T(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("tok")
    )
    packed = C.pack_greedy(
        d, "tok", PACK_WINDOW, order_col="doc_id", part_col="source"
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
            (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
            F.round(
                F.sum("tok") / ((F.max("pack_id") + 1) * PACK_WINDOW), 6
            ).alias("utilization"),
        )
        .orderBy("source")
    )


def q_dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule summary over orders: the same rule→counter
    compilation the streaming observe gate uses
    (operators/quality.py::rule_metrics), run as a plain aggregate so
    the counters are oracle-checkable. One map-side-combinable pass."""
    o = T(spark, sf_dir, "orders")
    rules = {
        "price_positive": F.col("o_totalprice") > 0,
        "status_known": F.col("o_orderstatus").isin("P", "O", "F"),
        "status_open": F.col("o_orderstatus") == "O",
        "date_pre_2000": F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"),
    }
    return o.agg(*Q.rule_metrics(rules))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling (operators/relational.py::
    weighted_hash_sample): longer documents kept with probability
    min(1, (n_chars/2000)·0.5), decided content-addressed by doc_id —
    corpus rebalancing that is a pure function of the data, so the
    oracle reproduces the exact row set. Output: per-lang survivor
    counts + kept char mass."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        weighted_hash_sample,
    )

    d = T(spark, sf_dir, "documents")
    weight = F.col("n_chars") / F.lit(2000.0)
    kept = weighted_hash_sample(d, "doc_id", weight, base_rate=0.5)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        .orderBy("lang")
    )


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample: exactly 3 documents
    per (lang, source) cell, chosen by the content-addressed
    multiplicative hash order (row_number over hash, ties impossible —
    the hash of a unique key is unique mod 2³²·collision-odds; the id
    itself tiebreaks). The inspect-a-few-per-stratum primitive for
    corpus QA dashboards: unlike LIMIT-per-group via raw order, the
    chosen rows are stable across partitionings, reruns, and engines.
    One shuffle (the window partition key)."""
    d = T(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "source", F.col("rn").cast("long").alias("rn"), "doc_id", "n_chars")
        .orderBy("lang", "source", "rn")
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit (operators/text.py::redact_pii/pii_counts):
    emails and phone-shaped spans scrubbed to typed placeholders — the
    mandatory pretraining hygiene pass, a pure codegen'd
    regexp_replace chain riding the scan. The fixture corpus is
    synthetic and PII-free, so the query PLANTS deterministic PII
    (email on keys ≡0 mod 37, phone on ≡0 mod 41 — some docs get
    both) with identical SQL on the oracle side; the per-lang audit
    (docs touched, emails/phones redacted, chars removed) is then
    value-checked, proving detection AND reconstruction byte-for-byte."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.text import (
        pii_counts,
        redact_pii,
    )

    d = T(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 37 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 41 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    aug = d.select("doc_id", "lang", planted.alias("t"))
    emails, phones = pii_counts("t")
    audited = aug.select(
        "lang",
        emails.alias("ne"),
        phones.alias("np"),
        (F.length("t") - F.length(redact_pii("t"))).alias("chars_removed"),
    )
    return (
        audited.groupBy("lang")
        .agg(
            F.sum((F.col("ne") + F.col("np") > 0).cast("long")).alias("docs_with_pii"),
            F.sum("ne").cast("long").alias("emails_redacted"),
            F.sum("np").cast("long").alias("phones_redacted"),
            F.sum("chars_removed").cast("long").alias("chars_removed"),
        )
        .orderBy("lang")
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """√n temperature mixture sampling (operators/curation.py::
    temperature_mixture): per-source budget share ∝ √n at budget 2000
    over documents, membership by deterministic hash. The whole plan
    is integer arithmetic (micro-unit weights, floor division, integer
    hash threshold), so the oracle is bit-exact — including the share
    column, a single double division of identical integer operands."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
        temperature_mixture,
    )

    d = T(spark, sf_dir, "documents")
    out = temperature_mixture(d, "source", "doc_id", budget=2000)
    flr6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        out.groupBy("source")
        .agg(
            F.first("n").alias("n_docs"),
            flr6(F.first("w_micro") / F.first("tw").cast("double")).alias("share"),
            F.first("target").alias("target"),
            F.sum(F.col("keep").cast("long")).alias("n_sampled"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).cast("bigint").alias("sampled_chars"),
        )
        .orderBy("source")
    )


def q_pack_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-slice span table (operators/curation.py::
    slice_packs): per-source token streams cut into 2048-token packs,
    one row per (doc, pack) overlap with in-doc segment offsets —
    what a pretraining loader actually consumes. n_chars stands in
    for the token count (same integer contract). Reduced per source:
    pack count, overlap rows, straddling docs, and exact conservation
    (sum of segment lengths == sum of tokens — the slicing loses
    nothing)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.curation import (
        slice_packs,
    )

    d = T(spark, sf_dir, "documents")
    spans = slice_packs(d, "n_chars", 2048, order_col="doc_id", part_col="source")
    per_doc = spans.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"), F.sum("seg_len").alias("doc_len")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_segs").cast("bigint").alias("n_segments"),
            F.sum((F.col("n_segs") > 1).cast("long")).alias("n_straddling"),
            F.sum("doc_len").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


RESERVOIR_K = 200


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE weighted sampling without replacement
    (Efraimidis & Spirakis 2006) — the complement of
    `weighted_sample`'s per-row Bernoulli (fixed RATE): every document
    draws a deterministic pseudo-uniform u from a Knuth multiplicative
    hash of its id and competes with key ln(u)/w (order-equivalent to
    the classic u^{1/w}); the global top-K by key IS an exact weighted
    reservoir. Weight = n_chars/1000, so long documents win
    proportionally more slots. The sample is a pure function of the
    data — reproducible across engines, partitionings and reruns —
    which is what makes corpus ablations comparable.

    Scale shape: the keying is one codegen'd projection, and top-K is
    TakeOrderedAndProject (per-partition heaps + a K-row merge), never
    a global sort. Output: per-lang slot counts + char mass of the
    K=200 sample."""
    d = T(spark, sf_dir, "documents")
    m = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    u = (m.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col("n_chars").cast("double") / F.lit(1000.0)
    sample = (
        d.select("doc_id", "lang", "n_chars", (F.log(u) / w).alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(RESERVOIR_K)
    )
    return (
        sample.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("char_mass"),
        )
        .orderBy("lang")
    )


CHAR_BUDGET = 200_000


def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: take documents in descending
    quality order (doc_id tiebreak) until the cumulative character
    budget is spent — the greedy knapsack every 'best N tokens for
    this training run' decision reduces to. The running total rides
    operators/relational.py::distributed_prefix_sum (range partition +
    bounded offset collect — NO single-partition global window), and
    the weights are integers so the prefix sum is exact in any
    association. Output: per-lang selection counts, char mass, and the
    worst quality admitted."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        distributed_prefix_sum,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.text import (
        quality_score,
    )

    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "n_chars", quality_score("text").alias("q")
    )
    cum = distributed_prefix_sum(
        scored,
        [F.col("q").desc(), F.col("doc_id").asc()],
        "n_chars",
        out_col="cum_chars",
    )
    sel = cum.filter(F.col("cum_chars") <= CHAR_BUDGET)
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_chars").cast("bigint").alias("char_mass"),
            F.round(F.min("q"), 2).alias("worst_quality"),
        )
        .orderBy("lang")
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/curation.py::dsir_scores; Xie
    et al. 2023): 'src0' documents play the target domain, the rest
    the raw pool; every pool document gets the hashed-bigram
    log-importance-ratio score and the top-20 (rounded score desc,
    doc_id tiebreak — both engines sort the ROUNDED value) are the
    documents importance resampling would pull toward the target
    mixture. The per-bucket λ table (≤256 rows) is broadcast; the
    pool side streams through one scan + one groupBy(doc) shuffle."""
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    target = d.filter(F.col("source") == "src0")
    train = d.filter(F.col("source") != "src0")
    scores = C.dsir_scores(train, target, "text", "doc_id", n_buckets=256)
    return (
        scores.join(train.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


QUERIES = {
    "dsir_select": q_dsir_select,
    "weighted_reservoir": q_weighted_reservoir,
    "budget_select": q_budget_select,
    "temperature_mix": q_temperature_mix,
    "pack_slices": q_pack_slices,
    "repetition": q_repetition,
    "decontaminate": q_decontaminate,
    "pack_windows": q_pack_windows,
    "dq_summary": q_dq_summary,
    "weighted_sample": q_weighted_sample,
    "group_sample": q_group_sample,
    "pii_scrub": q_pii_scrub,
}

# Word n-grams in DuckDB: 1-indexed list slots, end-exclusive range.
_G2 = (
    "SELECT doc_id, lang, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS gram "
    "FROM w, UNNEST(range(1, len(ws))) AS t(i)"
)
_G3 = (
    "SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' "
    "|| ws[CAST(i+2 AS INT)] AS gram "
    "FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)"
)

from steel_energy_consumption_prediction_using_pyspark_spark.operators.text import (  # noqa: E402
    DEFAULT_STOPWORDS as _QS_STOPWORDS,
)

_Q_TOKS = "string_split(text, ' ')"
_Q_STOPS = ", ".join(f"'{w}'" for w in _QS_STOPWORDS)
# quality_score's exact SQL twin (same formula as the text_quality
# oracle; e0 literals force DOUBLE arithmetic in DuckDB)
_QUALITY_SQL = f"""(
    (CASE WHEN len({_Q_TOKS}) >= 20 AND len({_Q_TOKS}) <= 5000
          THEN 1.0e0 ELSE 0.0e0 END) * 0.4e0
  + (CASE WHEN len(list_filter({_Q_TOKS}, w -> w IN ({_Q_STOPS})))
               / CAST(len({_Q_TOKS}) AS DOUBLE) >= 0.01e0
           AND len(list_filter({_Q_TOKS}, w -> w IN ({_Q_STOPS})))
               / CAST(len({_Q_TOKS}) AS DOUBLE) <= 0.7e0
          THEN 1.0e0 ELSE 0.0e0 END) * 0.3e0
  + (CASE WHEN CAST(list_sum(list_transform({_Q_TOKS}, w -> length(w)))
                    AS DOUBLE) / len({_Q_TOKS}) >= 2.0e0
           AND CAST(list_sum(list_transform({_Q_TOKS}, w -> length(w)))
                    AS DOUBLE) / len({_Q_TOKS}) <= 12.0e0
          THEN 1.0e0 ELSE 0.0e0 END) * 0.3e0
)"""

ORACLES = {
    "dsir_select": """
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS ws
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        g AS (
            SELECT doc_id, source,
                   CAST(CAST(concat('0x', substr(md5(
                       ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
                   ), 1, 8)) AS UBIGINT) AS BIGINT) % 256 AS b
            FROM w, UNNEST(range(1, len(ws))) AS t(i)
        ),
        tc AS (SELECT b, count(*) AS ct FROM g WHERE source = 'src0'
               GROUP BY b),
        sc AS (SELECT b, count(*) AS cs FROM g WHERE source <> 'src0'
               GROUP BY b),
        tot AS (SELECT (SELECT sum(ct) FROM tc) AS st,
                       (SELECT sum(cs) FROM sc) AS ss),
        spine AS (SELECT CAST(b AS BIGINT) AS b FROM range(0, 256) AS r(b)),
        lam AS (
            SELECT spine.b,
                   ln(CAST((COALESCE(tc.ct, 0) + 1) * (tot.ss + 256)
                           AS DOUBLE)
                      / CAST((COALESCE(sc.cs, 0) + 1) * (tot.st + 256)
                             AS DOUBLE)) AS lam
            FROM spine LEFT JOIN tc USING (b) LEFT JOIN sc USING (b), tot
        ),
        sel AS (
            SELECT g.doc_id, g.source,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   sum(lam.lam) AS score
            FROM g JOIN lam ON g.b = lam.b
            WHERE g.source <> 'src0'
            GROUP BY 1, 2
        )
        SELECT doc_id, source, n_grams, round(score, 6) AS score
        FROM sel ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 20
    """,
    "budget_select": f"""
        WITH t AS (
            SELECT doc_id, lang, n_chars, {_QUALITY_SQL} AS q
            FROM documents
        ),
        c AS (
            SELECT *, CAST(sum(n_chars) OVER (ORDER BY q DESC, doc_id)
                           AS BIGINT) AS cum
            FROM t
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_selected,
               CAST(sum(n_chars) AS BIGINT) AS char_mass,
               round(min(q), 2) AS worst_quality
        FROM c WHERE cum <= {CHAR_BUDGET}
        GROUP BY lang ORDER BY lang
    """,
    "weighted_reservoir": """
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   ln((((doc_id * 2654435761) % 4294967296) + 0.5e0)
                      / 4294967296e0)
                   / (n_chars / 1000e0) AS k
            FROM documents
        ),
        sample AS (
            SELECT * FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 200
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS char_mass
        FROM sample GROUP BY lang ORDER BY lang
    """,
    "temperature_mix": """
        WITH counts AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        plan AS (
            SELECT source, n,
                   CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5e0) AS BIGINT) AS w_micro
            FROM counts
        ),
        tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM plan),
        p2 AS (
            SELECT source, n, w_micro, tw,
                   least(n, (2000 * w_micro) // tw) AS target
            FROM plan, tot
        ),
        p3 AS (SELECT *, (target * 4294967296) // n AS thr FROM p2),
        s AS (
            SELECT d.source, d.n_chars, p3.n, p3.w_micro, p3.tw, p3.target,
                   ((d.doc_id % 2147483648) * 2654435761) % 4294967296 < p3.thr AS keep
            FROM documents d JOIN p3 USING (source)
        )
        SELECT source,
               CAST(max(n) AS BIGINT) AS n_docs,
               floor(max(w_micro) / CAST(max(tw) AS DOUBLE) * 1000000 + 0.5e0)
                   / 1000000 AS share,
               CAST(max(target) AS BIGINT) AS target,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
        FROM s GROUP BY source ORDER BY source
    """,
    "pack_slices": """
        WITH s AS (
            SELECT source, doc_id, CAST(n_chars AS BIGINT) AS tok,
                   CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_chars AS BIGINT) AS st
            FROM documents WHERE n_chars > 0
        ),
        spans AS (
            SELECT source, doc_id, tok, st, CAST(p AS BIGINT) AS pack_id,
                   greatest(st, CAST(p AS BIGINT) * 2048) AS g0,
                   least(st + tok, (CAST(p AS BIGINT) + 1) * 2048) AS g1
            FROM s, unnest(range(st // 2048, (st + tok - 1) // 2048 + 1)) AS t(p)
        ),
        per_doc AS (
            SELECT source, doc_id,
                   CAST(count(*) AS BIGINT) AS n_segs,
                   CAST(sum(g1 - g0) AS BIGINT) AS doc_len
            FROM spans GROUP BY source, doc_id
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_segs) AS BIGINT) AS n_segments,
               CAST(sum(CASE WHEN n_segs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
               CAST(sum(doc_len) AS BIGINT) AS total_tokens
        FROM per_doc GROUP BY source ORDER BY source
    """,
    "repetition": f"""
        WITH w AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        ),
        rep AS (
            SELECT doc_id, lang,
                   round(1e0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                             / CAST(len(ws) AS DOUBLE), 6) AS dw,
                   CASE WHEN len(ws) >= 2 THEN
                       round(1e0 - CAST(len(list_distinct(
                                 list_transform(range(1, len(ws)),
                                     i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)])))
                             AS DOUBLE)
                           / CAST(len(ws) - 1 AS DOUBLE), 6)
                   ELSE 0.0 END AS dg
            FROM w
        ),
        g AS ({_G2}),
        cnt AS (
            SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
        ),
        top AS (
            SELECT doc_id,
                   round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
                       AS top_gram_frac
            FROM cnt GROUP BY doc_id
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(dw), 6) AS avg_dup_word_frac,
               round(avg(dg), 6) AS avg_dup_bigram_frac,
               round(avg(coalesce(top_gram_frac, 0.0)), 6)
                   AS avg_top_bigram_frac
        FROM rep LEFT JOIN top USING (doc_id)
        GROUP BY lang ORDER BY lang
    """,
    "decontaminate": f"""
        WITH w AS (SELECT doc_id, NULL AS lang, string_split(text, ' ') AS ws
                   FROM documents),
        g0 AS ({_G3}),
        g AS (SELECT DISTINCT doc_id, gram FROM g0),
        b AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
        t AS (SELECT * FROM g WHERE doc_id % {_BENCH_MOD} <> 0),
        totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                   FROM t GROUP BY doc_id),
        hits AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
                 FROM t JOIN b USING (gram) GROUP BY t.doc_id)
        SELECT doc_id, n_grams, n_shared_grams,
               round(CAST(n_shared_grams AS DOUBLE)
                     / CAST(n_grams AS DOUBLE), 6) AS contamination_frac
        FROM hits JOIN totals USING (doc_id)
        ORDER BY n_shared_grams DESC, doc_id ASC LIMIT 20
    """,
    "pack_windows": f"""
        WITH t AS (
            SELECT source, doc_id, len(string_split(text, ' ')) AS tok
            FROM documents
        ),
        c AS (
            SELECT source, tok,
                   sum(tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
            FROM t
        ),
        p AS (
            SELECT source, tok,
                   CAST(floor((cum - tok) / {PACK_WINDOW}.0) AS BIGINT)
                       AS pack_id
            FROM c
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS total_tokens,
               CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
               round(CAST(sum(tok) AS DOUBLE)
                     / ((max(pack_id) + 1) * {PACK_WINDOW}), 6)
                   AS utilization
        FROM p GROUP BY source ORDER BY source
    """,
    "pii_scrub": r"""
        WITH aug AS (
            SELECT lang,
                   text
                   || CASE WHEN doc_id % 37 = 0
                           THEN ' contact user' || doc_id || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 41 = 0
                           THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS t
            FROM documents
        ),
        audited AS (
            SELECT lang,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
                   len(regexp_extract_all(
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\d{3}-\d{4}')) AS np,
                   length(t) - length(
                       regexp_replace(
                           regexp_replace(t,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\d{3}-\d{4}', '<PHONE>', 'g')) AS chars_removed
            FROM aug
        )
        SELECT lang,
               CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
               CAST(sum(ne) AS BIGINT) AS emails_redacted,
               CAST(sum(np) AS BIGINT) AS phones_redacted,
               CAST(sum(chars_removed) AS BIGINT) AS chars_removed
        FROM audited GROUP BY lang ORDER BY lang
    """,
    "group_sample": """
        SELECT lang, source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
        FROM (
            SELECT lang, source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296 ASC,
                                doc_id ASC
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 3
        ORDER BY lang, source, rn
    """,
    "weighted_sample": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296
              < CAST(floor(least(1.0e0, (n_chars / 2000.0e0) * 0.5e0)
                           * 4294967296e0) AS BIGINT)
        GROUP BY lang ORDER BY lang
    """,
    "dq_summary": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_price_positive,
               CAST(sum(CASE WHEN NOT (o_orderstatus IN ('P', 'O', 'F'))
                        THEN 1 ELSE 0 END) AS BIGINT) AS bad_status_known,
               CAST(sum(CASE WHEN NOT (o_orderstatus = 'O') THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_status_open,
               CAST(sum(CASE WHEN NOT (o_orderdate < TIMESTAMP '2000-01-01')
                        THEN 1 ELSE 0 END) AS BIGINT) AS bad_date_pre_2000
        FROM orders
    """,
}
