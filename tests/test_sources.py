"""IO layer: CSV ingest with raw reference headers, explicit-schema
fast path, parquet/bucketed sinks."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
    read_csv,
)
from steel_energy_consumption_prediction_using_pyspark_spark.sources.steel import (
    steel_energy,
)
from steel_energy_consumption_prediction_using_pyspark_spark.sources.writers import (
    write_bucketed_table,
    write_csv,
    write_parquet,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

# The raw CSV header of the reference input (Steel_industry_data.csv:1)
# — dotted and parenthesized names that Catalyst accessors choke on.
RAW_HEADER = (
    "date,Usage_kWh,Lagging_Current_Reactive.Power_kVarh,"
    "Leading_Current_Reactive_Power_kVarh,CO2(tCO2),"
    "Lagging_Current_Power_Factor,Leading_Current_Power_Factor,"
    "NSM,WeekStatus,Day_of_week,Load_Type"
)


@pytest.fixture(scope="module")
def raw_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "steel_raw.csv"
    rows = [
        "01/01/2018 00:00,3.17,2.95,0.0,0.0,73.21,100.0,0,Weekday,Monday,Light_Load",
        "01/01/2018 00:15,4.0,4.46,0.0,0.0,66.77,100.0,900,Weekday,Monday,Light_Load",
    ]
    p.write_text(RAW_HEADER + "\n" + "\n".join(rows) + "\n")
    return str(p)


def test_csv_ingest_normalizes_reference_names(spark, raw_csv):
    """The reference renames dotted/parenthesized columns by hand
    (SteelPred.py:139-146); our ingest does it systematically."""
    df = read_csv(spark, raw_csv)
    assert "Lagging_Current_Reactive_Power_kVarh" in df.columns
    assert "CO2" in df.columns
    assert not any("." in c or "(" in c for c in df.columns)
    # inferSchema reproduced the reference's types (SURVEY §1.2)
    dtypes = dict(df.dtypes)
    assert dtypes["Usage_kWh"] == "double"
    assert dtypes["NSM"] == "int"
    assert dtypes["date"] == "string"


def test_csv_explicit_schema_fast_path(spark, raw_csv):
    schema = StructType(
        [
            StructField("date", StringType()),
            StructField("Usage_kWh", DoubleType()),
            StructField("Lagging_Current_Reactive.Power_kVarh", DoubleType()),
            StructField("Leading_Current_Reactive_Power_kVarh", DoubleType()),
            StructField("CO2(tCO2)", DoubleType()),
            StructField("Lagging_Current_Power_Factor", DoubleType()),
            StructField("Leading_Current_Power_Factor", DoubleType()),
            StructField("NSM", IntegerType()),
            StructField("WeekStatus", StringType()),
            StructField("Day_of_week", StringType()),
            StructField("Load_Type", StringType()),
        ]
    )
    df = read_csv(spark, raw_csv, schema=schema)
    assert df.count() == 2
    assert "CO2" in df.columns  # normalization applies after schema


def test_parquet_roundtrip(spark, tmp_path):
    df = steel_energy(spark, 96)
    path = str(tmp_path / "steel.parquet")
    write_parquet(df, path, coalesce_to=1)
    back = spark.read.parquet(path)
    assert back.count() == 96
    assert back.columns == df.columns


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy enables partition pruning: a filter on the partition
    key must scan only that directory."""
    df = steel_energy(spark, 96 * 7)
    path = str(tmp_path / "by_ws")
    write_parquet(df, path, partition_by=["WeekStatus"])
    back = spark.read.parquet(path).filter(F.col("WeekStatus") == "Weekend")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert back.count() > 0
    assert "PartitionFilters" in plan and "WeekStatus" in plan


def test_csv_roundtrip(spark, tmp_path):
    df = steel_energy(spark, 96)
    path = str(tmp_path / "steel_csv")
    write_csv(df.coalesce(1), path)
    back = read_csv(spark, path)
    assert back.count() == 96


def test_bucketed_join_no_shuffle(spark, tmp_path, sf_dir):
    """Two tables bucketed on the same key join without an Exchange —
    THE co-location tool for repeated 100 TB joins."""
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8
    )
    write_bucketed_table(
        li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8
    )
    # Disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (at real scale neither side broadcasts anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert joined.count() > 0
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_jsonl_roundtrip_explicit_schema(spark, tmp_path):
    """JSONL write → read with an explicit schema: values survive and
    the schema is pinned (no inference scan, no sampled-type drift)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
        read_jsonl,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.writers import (
        write_jsonl,
    )

    df = steel_energy(spark, 96).select("date", "Usage_kWh", "NSM", "Load_Type")
    path = str(tmp_path / "docs.jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    # file sources force nullable=True; names+types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC write → read preserves rows; filters push to the ORC scan."""
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
        read_orc,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.writers import (
        write_orc,
    )

    df = steel_energy(spark, 96)
    path = str(tmp_path / "steel.orc")
    write_orc(df, path)
    back = read_orc(spark, path).filter(F.col("NSM") > 43200)
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert back.count() == df.filter(F.col("NSM") > 43200).count()
    assert "PushedFilters" in plan and "NSM" in plan


def test_csv_ingest_roundtrip_schema(spark, sf_dir):
    """S1 driver query: the parquet->csv->inferSchema round trip must
    come back with normalized names and the right inferred types."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.core import (
        _orders_csv,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
        read_csv,
    )

    df = read_csv(spark, _orders_csv(spark, sf_dir))
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    # Integer width depends on the observed key range (int at sf0.001,
    # bigint at larger SFs) — both are lossless for the fixture keys.
    assert types.pop("Order_Key") in ("int", "bigint")
    assert types == {"Order_Priority": "string", "Total_Price": "double"}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A column added mid-lifetime must surface across the whole
    directory under merge_schema=True (nulls for older files), and the
    evolved column must still be filterable with pushdown."""
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
        read_parquet,
    )

    path = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)

    df = read_parquet(spark, path, merge_schema=True)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}
    assert read_parquet(spark, path, merge_schema=True).filter(
        "score > 5"
    ).count() == 1


def test_dirty_ingestion_accounts_every_corruption_class(spark, sf_dir):
    """PERMISSIVE dirty ingestion (round 6, VERDICT r5 #3): corrupt
    counts are nonzero and EXACT — they equal the deterministic
    corruption predicate's cardinality on the source table — and every
    class lands where Spark's PERMISSIVE contract says: CSV keeps
    parsed fields of bad rows (priority groups populated), JSON
    truncation nulls the whole record (NULL-priority group)."""
    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.workload.core import (
        q_csv_dirty,
        q_jsonl_corrupt,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    o = T(spark, sf_dir, "orders")
    n_csv_bad = o.filter(
        (F.col("o_orderkey") % 7 == 3) | (F.col("o_orderkey") % 7 == 5)
    ).count()
    csv_rows = q_csv_dirty(spark, sf_dir).collect()
    assert sum(r.n_corrupt for r in csv_rows) == n_csv_bad > 0
    assert all(r.o_orderpriority is not None for r in csv_rows)
    assert sum(r.n_rows for r in csv_rows) == o.count()

    n_trunc = o.filter(F.col("o_orderkey") % 11 == 7).count()
    n_badtype = o.filter(F.col("o_orderkey") % 11 == 3).count()
    js_rows = q_jsonl_corrupt(spark, sf_dir).collect()
    assert sum(r.n_corrupt for r in js_rows) == n_trunc + n_badtype > 0
    null_grp = [r for r in js_rows if r.o_orderpriority is None]
    assert len(null_grp) == 1 and null_grp[0].n_rows == n_trunc
    assert null_grp[0].n_clean == 0
    # bad lines are surfaced: every group with corruption has a sample
    assert all(
        (r.n_corrupt == 0) == (r.sample_bad is None) for r in js_rows
    )
