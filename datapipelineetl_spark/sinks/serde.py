"""Kafka message-envelope serde (SURVEY.md §2.2 K1, §2.4 C12).

The reference serializes every row to one JSON string —
``to_json(struct(*cols))`` — and publishes to a per-feed topic with an
optional constant key (mypy/preprocessproduce.py:68-80, mypy/streaming.py:129,
mypy/xmlonly.py:121, mypy/xmlhard.py:112). The inverse (``from_json`` with a
declared schema) implements the reference's schema-as-projection semantics:
JSON keys absent from the schema are silently dropped (SURVEY.md §1.2).

The actual Kafka write is the same DataFrame with
``.write.format("kafka").option("topic", ...)`` — kept behind this interface
so tests exercise the envelope against memory/parquet sinks (no broker in
the test env).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_envelope(
    df: DataFrame,
    key=None,
    columns: Sequence[str] | None = None,
    exclude: Sequence[str] = (),
) -> DataFrame:
    """Serialize rows to the Kafka envelope ``(key string, value string)``.

    C12 + C11 + P2: value = ``to_json(struct(*cols))``; key is a constant
    (the reference uses ``str(batch_id)`` for the CSV feed,
    mypy/preprocessproduce.py:71) or omitted; ``exclude`` implements the
    column-exclusion projection (drop lineage cols before serialize,
    mypy/streaming.py:129).
    """
    cols = [c for c in (columns or df.columns) if c not in set(exclude)]
    value = F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")
    if key is None:
        return df.select(value)
    return df.select(F.lit(str(key)).cast("string").alias("key"), value)


def from_envelope(df: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """Inverse: parse the JSON value with a declared schema and flatten.

    Schema-as-projection: keys not in ``schema`` are dropped; declared
    fields missing from the JSON come back null — exactly the reference's
    streaming-JSON read behavior (mypy/streaming.py:145-150).
    """
    return df.select(F.from_json(F.col(value_col), schema).alias("r")).select("r.*")


# Columns Spark's kafka sink understands; anything else in the frame is a
# caller bug (it would be silently dropped — or rejected — broker-side).
_KAFKA_SINK_COLS = {"key", "value", "topic", "partition", "headers"}


def kafka_write_plan(df: DataFrame, topic: str, bootstrap_servers: str, **options) -> dict:
    """Validate the envelope and return the exact writer config write_kafka
    will use — the broker-free dry-run surface (the sandbox has no Kafka
    broker or spark-sql-kafka jar, so tests pin THIS, and the classpath
    boundary is pinned separately in tests/test_serde.py).

    Raises if the frame is not a Kafka envelope: ``value`` is mandatory,
    and any column outside the sink's recognized set means the caller
    forgot ``to_envelope`` — failing client-side beats a broker-side
    surprise."""
    if not topic:
        raise ValueError("topic must be non-empty")
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    names = set(df.columns)
    if "value" not in names:
        raise ValueError(
            f"Kafka envelope requires a 'value' column; got {sorted(names)} — "
            "did you forget to_envelope()?"
        )
    extra = names - _KAFKA_SINK_COLS
    if extra:
        raise ValueError(
            f"columns {sorted(extra)} are not Kafka sink columns "
            f"({sorted(_KAFKA_SINK_COLS)}); serialize them into 'value' via to_envelope()"
        )
    return {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": bootstrap_servers,
            "topic": topic,
            **options,
        },
    }


def write_kafka(df: DataFrame, topic: str, bootstrap_servers: str, **options) -> None:
    """K1: publish an envelope DataFrame to Kafka — the reference's
    per-feed topic produce (mypy/preprocessproduce.py:68-80). Requires the
    spark-sql-kafka package on the classpath (not present in the test env;
    the writer config + validation path is covered by kafka_write_plan)."""
    plan = kafka_write_plan(df, topic, bootstrap_servers, **options)
    df.write.format(plan["format"]).options(**plan["options"]).save()


def write_routed_parquet(df: DataFrame, path: str, feed_col: str = "feed", mode: str = "append") -> None:
    """K2 engine-native: feed→index routing as a partitioned parquet sink.

    Replaces the Logstash topic→ES-index dispatch (logstash.conf:13-46) with
    ``partitionBy(feed)`` — downstream readers get partition pruning on the
    feed column for free.
    """
    df.write.mode(mode).partitionBy(feed_col).parquet(path)


def write_es_bulk(
    df: DataFrame,
    path: str,
    index: str,
    id_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """K2's last mile: write rows as Elasticsearch **Bulk-API** files —
    newline-delimited (action, source) JSON pairs, the exact byte format
    ``POST _bulk`` ingests (the reference ships rows to ES via Logstash,
    logstash.conf:13-46; this produces the same documents as replayable
    files instead of a live socket, the same pattern as
    ``kafka_write_plan`` for the absent broker). Load with e.g.::

        curl -H 'Content-Type: application/x-ndjson' \
             --data-binary @part-*.txt localhost:9200/_bulk

    ``id_col`` makes the load IDEMPOTENT (index actions carry ``_id``, so
    re-posting a file upserts instead of duplicating) — the ES-side
    equivalent of the engine's replay-safe sinks; without it ES assigns
    ids and replays duplicate. A NULL id falls back to the no-``_id``
    action for that row (``to_json`` omits null fields) — the row still
    ships, it just loses the idempotency handle; pre-filter if nulls
    should fail instead.

    Both lines are built with ``to_json`` (never string concatenation),
    so ids/index names containing quotes or backslashes stay valid JSON.

    Scale: two narrow ``to_json`` projections + one concat per row, text
    files written in parallel; no driver involvement, no per-row Python.
    """
    id_field = (
        F.col(id_col).cast("string") if id_col is not None else F.lit(None).cast("string")
    )
    action: Column = F.to_json(
        F.struct(
            F.struct(
                F.lit(index).alias("_index"), id_field.alias("_id")
            ).alias("index")
        )
    )
    source = F.to_json(F.struct(*df.columns))
    (
        df.select(F.concat(action, F.lit("\n"), source).alias("value"))
        .write.mode(mode)
        .text(path)
    )


def streaming_es_bulk_sink(
    stream: DataFrame,
    path: str,
    index: str,
    checkpoint: str,
    id_col: str | None = None,
    available_now: bool = True,
):
    """Streaming form of :func:`write_es_bulk`: each micro-batch lands
    as Bulk-API files under ``path/batch_id=N/`` — the engine-native
    replacement for the reference's always-on Kafka→Logstash→ES leg
    (logstash.conf:1-46), with BOTH replay defenses stacked: the
    batch-id directory is overwritten on replay (file-level
    exactly-once, same scheme as ``idempotent_parquet_sink``) and, with
    ``id_col``, the bulk actions carry ``_id`` so even a double-POST to
    ES upserts instead of duplicating.

    Ship with any file forwarder (the operational shape the reference's
    Logstash pipeline occupies); each ``batch_id=N`` directory is one
    atomic replayable unit.

    Scale: per batch, write_es_bulk's two narrow ``to_json``
    projections — no driver involvement, no Python.
    """
    import os as _os  # noqa: PLC0415

    from datapipelineetl_spark.streaming import runner as _runner  # noqa: PLC0415

    def write(df: DataFrame, epoch_id: int) -> None:
        write_es_bulk(
            df,
            _os.path.join(path, f"batch_id={epoch_id}"),
            index=index,
            id_col=id_col,
            mode="overwrite",
        )

    return _runner.run_foreach_batch(
        stream, write, checkpoint, available_now=available_now, skip_empty=True
    )
