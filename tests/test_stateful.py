"""Custom stateful streaming operator (applyInPandasWithState)."""

import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.streaming.stateful import (
    running_totals_per_user,
)
from steel_energy_consumption_prediction_using_pyspark_spark.streaming.windows import (
    read_events_stream,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


def test_running_totals_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = running_totals_per_user(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a key several times across batches — the
    # LAST emission per key is the final state; with availableNow over
    # one file there is one batch, so rows are final.
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table("state_out").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def _protobuf_available() -> bool:
    # The transformWithState state-server protocol speaks protobuf from
    # a separate Python driver worker; without the package the query
    # crashes at init (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    # compat.ensure_protobuf wires the gcloud-SDK pure-Python fallback
    # onto sys.path/PYTHONPATH when no distribution is installed (it
    # already ran via session.get_session before the JVM started, so
    # worker processes inherit the path too).
    from steel_energy_consumption_prediction_using_pyspark_spark.compat import (
        ensure_protobuf,
    )

    return ensure_protobuf()


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (absent in this env)",
)
def test_type_counts_transform_with_state_match_batch(spark, sf_dir):
    """transformWithStateInPandas MapState operator ≡ batch
    groupBy(user, type).count(). Typed state needs the RocksDB state
    store (HDFS-backed provider has no column families) — set for this
    query only, restored after."""
    from steel_energy_consumption_prediction_using_pyspark_spark.streaming.stateful import (
        type_counts_per_user,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = type_counts_per_user(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)
    got = {
        (r.user_id, r.event_type): r.cnt
        for r in spark.table("tws_out").collect()
    }
    want = {
        (r.user_id, r.event_type): r.cnt
        for r in T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
