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
