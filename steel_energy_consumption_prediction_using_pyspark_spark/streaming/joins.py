"""Stream-stream joins (SURVEY.md §2.10 extension).

The classic funnel/attribution primitive: pair each event with the
follow-up events of another type from the same user within a time
bound. The SAME code runs batch (self equi-join + range predicate,
SQL-expressible, oracle-checked) and streaming (Spark's stream-stream
inner join: both sides watermarked, the time-range condition bounds
the buffered state on each side — without it state grows forever).

Scale notes: the join key is (user_id); Spark shuffles both sides on
it once (stream-stream joins require copartitioning on the equi-key).
The time-range conjunct is evaluated post-match and, on streams,
drives state eviction: side A keeps rows until watermark passes
`ts + within`, side B until watermark passes `ts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_pair_join(
    lead: DataFrame,
    follow: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join `lead` events to strictly-later `follow` events of the
    same user arriving within `within`. Both inputs may be batch or
    streaming DataFrames of the events schema (event_id, ts, user_id,
    event_type, value, props)."""
    if lead.isStreaming:
        lead = lead.withWatermark("ts", watermark)
    if follow.isStreaming:
        follow = follow.withWatermark("ts", watermark)
    a = lead.select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
        F.col("event_id").alias("a_id"),
    )
    b = follow.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("b_type"),
        F.col("value").alias("b_value"),
        F.col("event_id").alias("b_id"),
    )
    cond = (
        (a.a_user == b.b_user)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond, "inner")


def static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment join — the canonical streaming lookup:
    each (micro-)batch of the stream side joins the STATIC dimension
    snapshot. No watermark and no join state: stream-static inner
    joins are stateless in Structured Streaming (the static side is
    re-planned per batch, so a dim refresh is picked up on the next
    trigger). The dim is broadcast — at 1000 executors this is the
    map-side hash join every enrichment pipeline wants; if the dim
    outgrows broadcast, pre-bucket both sides on the key instead.
    Works identically on batch inputs (same code path, SQL-expressible
    → oracle-checked by `stream_enrich`; stream≡batch parity pinned in
    tests/test_streaming.py)."""
    d = dim.select(F.col(dim_key).alias(on), "c_mktsegment")
    return events.join(F.broadcast(d), on, "inner")


def enriched_segment_totals(events: DataFrame, dim: DataFrame) -> DataFrame:
    """static_enrich → per-segment event counts and value mass (the
    aggregate that makes the enrichment observable and comparable)."""
    return (
        static_enrich(events, dim)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def funnel_pairs(events: DataFrame, within: str = "30 minutes") -> DataFrame:
    """click→purchase conversion pairs within the attribution window,
    aggregated per user: pair count and attributed revenue."""
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    pairs = time_bounded_pair_join(clicks, purchases, within=within)
    return pairs.groupBy(F.col("a_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("b_value"), 2).alias("attributed_value"),
    )


def time_bounded_left_join(
    lead: DataFrame,
    follow: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of :func:`time_bounded_pair_join` — the
    conversion-funnel shape that also emits NON-converting lead events
    (b_* columns NULL). On streams this is the join type with the
    strictest state contract: Spark only allows stream-stream outer
    joins when the outer side is watermarked AND the join condition
    time-bounds the match window, because an unmatched left row can
    only be emitted once the watermark proves no future match can
    arrive (at watermark > a_ts + within). Until that proof, the row
    sits in the join state — the time bound is what keeps state (and
    result latency) finite. Batch mode is the plain left join and is
    oracle-checked by `stream_left_join`; the emit-on-watermark
    semantics are pinned in tests/test_streaming.py."""
    if lead.isStreaming:
        lead = lead.withWatermark("ts", watermark)
    if follow.isStreaming:
        follow = follow.withWatermark("ts", watermark)
    a = lead.select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_id").alias("a_id"),
    )
    b = follow.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
        F.col("event_id").alias("b_id"),
    )
    cond = (
        (a.a_user == b.b_user)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond, "left_outer")


def time_bounded_full_join(
    lead: DataFrame,
    follow: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER variant completing the stream-stream join matrix
    (inner → :func:`time_bounded_pair_join`, left →
    :func:`time_bounded_left_join`): the two-feed RECONCILIATION
    shape, where unmatched rows on BOTH sides are the signal —
    lead-only rows are lost conversions, follow-only rows are orphan
    attributions (a purchase with no qualifying lead). Spark supports
    stream-stream full outer joins (3.1+) under the same contract as
    left outer, applied to both sides: each side watermarked and the
    join condition time-bounding the match window, so either side's
    unmatched row is emitted null-extended exactly when the watermark
    proves no future partner can arrive. State on each side is
    bounded by watermark + `within` — identical eviction math to the
    one-sided case, just enforced symmetrically."""
    if lead.isStreaming:
        lead = lead.withWatermark("ts", watermark)
    if follow.isStreaming:
        follow = follow.withWatermark("ts", watermark)
    a = lead.select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_id").alias("a_id"),
    )
    b = follow.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
        F.col("event_id").alias("b_id"),
    )
    cond = (
        (a.a_user == b.b_user)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr(f"INTERVAL {within}"))
    )
    return a.join(b, cond, "full_outer")


def reconciliation_stats(events: DataFrame, within: str = "30 minutes") -> DataFrame:
    """Two-feed reconciliation accounting per user over the full
    funnel join: matched pairs, lead-only clicks (no purchase inside
    the window), follow-only purchases (no qualifying click — the
    attribution leak an inner or left join cannot see) and the orphan
    value they carry."""
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    j = time_bounded_full_join(clicks, purchases, within=within)
    return j.groupBy(
        F.coalesce(F.col("a_user"), F.col("b_user")).alias("user_id")
    ).agg(
        F.count(
            F.when(F.col("a_id").isNotNull() & F.col("b_id").isNotNull(), 1)
        ).alias("n_pairs"),
        F.count_distinct(
            F.when(F.col("b_id").isNull(), F.col("a_id"))
        ).alias("n_lead_only"),
        F.count_distinct(
            F.when(F.col("a_id").isNull(), F.col("b_id"))
        ).alias("n_follow_only"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("a_id").isNull(), F.col("b_value"))),
                F.lit(0.0),
            ),
            2,
        ).alias("orphan_value"),
    )


def conversion_stats(events: DataFrame, within: str = "30 minutes") -> DataFrame:
    """click→purchase conversion accounting per user over the left
    funnel join: leads, converted leads, pairs, attributed value —
    the unmatched rows are the point (inner joins can't see the
    non-converting clicks a funnel report is about)."""
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    j = time_bounded_left_join(clicks, purchases, within=within)
    return j.groupBy(F.col("a_user").alias("user_id")).agg(
        F.count_distinct(F.col("a_id")).alias("n_leads"),
        F.count_distinct(
            F.when(F.col("b_id").isNotNull(), F.col("a_id"))
        ).alias("n_converted_leads"),
        F.count(F.col("b_id")).alias("n_pairs"),
        F.round(F.coalesce(F.sum("b_value"), F.lit(0.0)), 2).alias(
            "attributed_value"
        ),
    )
