from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import types as T

from datapipelineetl_spark.sinks import serde


def test_envelope_roundtrip_and_projection(spark):
    df = spark.createDataFrame([(1, "a", 2.5, "lineage.csv")], ["id", "name", "v", "input_file"])
    env = serde.to_envelope(df, key="7", exclude=["input_file"])
    assert env.columns == ["key", "value"]
    row = env.collect()[0]
    assert row.key == "7"
    assert json.loads(row.value) == {"id": 1, "name": "a", "v": 2.5}

    # schema-as-projection on read: undeclared keys dropped, missing → null
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("missing", T.StringType())]
    )
    back = serde.from_envelope(env, schema).collect()[0]
    assert back.id == 1 and back.missing is None


def test_write_routed_parquet_partitions_by_feed(spark, tmp_path):
    """K2: topic→index routing as feed-partitioned parquet — each feed
    lands in its own partition directory (the engine-native form of the
    Logstash conditional outputs, logstash.conf:21-46)."""
    df = spark.createDataFrame(
        [("csv", 1), ("csv", 2), ("xmlt", 3)], ["feed", "v"]
    )
    out = str(tmp_path / "routed")
    serde.write_routed_parquet(df, out)
    dirs = {p.name for p in (tmp_path / "routed").iterdir() if p.is_dir()}
    assert {"feed=csv", "feed=xmlt"} <= dirs
    # partition pruning: reading one feed touches only its directory
    got = spark.read.parquet(out).filter("feed = 'csv'")
    assert sorted(r.v for r in got.collect()) == [1, 2]


def test_constant_column_batch_key(spark):
    """C11: Kafka key = lit(batch_id) (mypy/preprocessproduce.py:71)."""
    from datapipelineetl_spark.operators import cleaning

    df = spark.createDataFrame([(1,)], ["v"])
    out = cleaning.constant_column(df, "key", "42").collect()[0]
    assert out.key == "42"


def test_kafka_write_plan_dry_run(spark):
    """K1 dry-run: write_kafka's writer config is pinned without a broker
    (VERDICT r2 item 7) — correct format + topic/servers options, and the
    envelope validation rejects non-envelope frames client-side."""
    env = serde.to_envelope(spark.createDataFrame([(1, "a")], ["id", "s"]), key="7")
    plan = serde.kafka_write_plan(
        env, "cell_metrics", "broker1:9092,broker2:9092", **{"kafka.acks": "all"}
    )
    assert plan["format"] == "kafka"
    assert plan["options"]["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert plan["options"]["topic"] == "cell_metrics"
    assert plan["options"]["kafka.acks"] == "all"

    raw = spark.createDataFrame([(1, "a")], ["id", "s"])
    with pytest.raises(ValueError, match="value"):
        serde.kafka_write_plan(raw, "t", "b:9092")
    with pytest.raises(ValueError, match="topic"):
        serde.kafka_write_plan(env, "", "b:9092")


def test_write_kafka_reaches_source_resolution(spark):
    """K1 classpath boundary: write_kafka builds a real kafka-format writer —
    in this jar-less env the save fails at DataSource lookup with the kafka
    provider name, proving the writer (not our validation) is what stops it."""
    env = serde.to_envelope(spark.createDataFrame([(1,)], ["id"]))
    with pytest.raises(Exception, match="(?i)kafka"):
        serde.write_kafka(env, "t", "b:9092")


def test_write_es_bulk_format_and_idempotent_ids(spark, tmp_path):
    """The ES bulk sink must emit byte-valid _bulk input: alternating
    action/source JSON lines, _id carried from the id column (the
    idempotent-replay handle), and every source line parseable with the
    row's fields."""
    import json

    out = str(tmp_path / "bulk")
    df = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta", 4.5)], ["k", "name", "score"]
    )
    serde.write_es_bulk(df, out, index="metrics", id_col="k")
    lines = [
        ln
        for f in sorted(Path(out).glob("part-*"))
        for ln in Path(f).read_text().splitlines()
        if ln
    ]
    assert len(lines) == 4  # action+source per row
    actions = [json.loads(ln) for ln in lines[0::2]]
    sources = [json.loads(ln) for ln in lines[1::2]]
    assert all(a["index"]["_index"] == "metrics" for a in actions)
    assert {a["index"]["_id"] for a in actions} == {"1", "2"}
    by_id = {a["index"]["_id"]: s for a, s in zip(actions, sources)}
    assert by_id["1"] == {"k": 1, "name": "alpha", "score": 3.5}
    assert by_id["2"]["name"] == "beta"


def test_write_es_bulk_escapes_and_null_ids(spark, tmp_path):
    """Quoted ids must stay valid JSON (action line built with to_json,
    not concatenation), and NULL ids must fall back to the no-_id
    action instead of silently dropping the row."""
    import json

    out = str(tmp_path / "bulk2")
    df = spark.createDataFrame(
        [('doc"1', "alpha"), (None, "beta")], ["k", "name"]
    )
    serde.write_es_bulk(df, out, index="metrics", id_col="k")
    lines = [
        ln
        for f in sorted(Path(out).glob("part-*"))
        for ln in Path(f).read_text().splitlines()
        if ln
    ]
    assert len(lines) == 4  # both rows shipped
    actions = [json.loads(ln) for ln in lines[0::2]]  # all parse cleanly
    sources = [json.loads(ln) for ln in lines[1::2]]
    by_name = {s["name"]: a["index"] for a, s in zip(actions, sources)}
    assert by_name["alpha"]["_id"] == 'doc"1'
    assert "_id" not in by_name["beta"]  # null id → ES-assigned id


def test_streaming_es_bulk_sink_replay_idempotent(spark, tmp_path):
    """Streaming ES Bulk sink: each micro-batch lands as a batch_id=N
    bulk-file directory; checkpoint-loss replay overwrites instead of
    duplicating, and actions keep their _id idempotency handles."""
    import json
    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "bulk")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema("k long, v string").parquet(src)
        serde.streaming_es_bulk_sink(stream, out, index="metrics", checkpoint=ck, id_col="k")

    drain()
    files = sorted(Path(out).glob("batch_id=*/part-*.txt"))
    assert files and all("batch_id=0" in str(f) for f in files)
    lines = [l for f in files for l in f.read_text().splitlines() if l]
    assert len(lines) == 4  # 2 rows × (action + source)
    actions = [json.loads(l) for l in lines[0::2]]
    assert {a["index"]["_id"] for a in actions} == {"1", "2"}
    assert all(a["index"]["_index"] == "metrics" for a in actions)
    # replay: wipe checkpoint, drain again — rewritten, not duplicated
    shutil.rmtree(ck)
    drain()
    lines2 = [
        l
        for f in sorted(Path(out).glob("batch_id=*/part-*.txt"))
        for l in f.read_text().splitlines()
        if l
    ]
    assert len(lines2) == 4
