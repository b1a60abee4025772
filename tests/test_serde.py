from __future__ import annotations

import json

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
