"""Structured Streaming ingest: the event-driven micro-batch pipeline
re-expressed as a file-source stream.

The reference has no streaming engine — ingestion is S3-event → Lambda →
Step Functions → Glue, one file per run
(``state_machine_trigger/lambda_handler.py:85-248``).  The Spark-native
equivalent is a file-source stream with ``trigger(availableNow=True)``:
every new file in the drop directory becomes a micro-batch, the same
per-file semantics without the AWS control plane, with checkpointed
exactly-once sink writes.

``windowed_event_counts`` adds the standard late-data pattern (watermark +
tumbling window) the reference's users would need for streaming analytics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def micro_batch_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    output_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    file_format: str = "csv",
    options: dict | None = None,
) -> StreamingQuery:
    """Drop-directory ingest: each new file is processed exactly once
    (checkpointed), transformed, and appended to a Parquet lake path.

    Runs with ``availableNow`` so it drains all pending files then stops —
    the batch-pipeline contract, but restart-safe and incremental.
    """
    reader = (
        spark.readStream.format(file_format)
        .schema(schema)
        .options(**(options or {"header": "true"}))
    )
    df = reader.load(source_dir)
    if transform is not None:
        df = transform(df)
    return (
        df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", output_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    timestamp_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts over a streaming DataFrame.

    Late rows beyond the watermark are dropped and window state is evicted —
    bounded state at any scale."""
    return (
        events.withWatermark(timestamp_col, watermark)
        .groupBy(F.window(F.col(timestamp_col), window_duration), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal partial sums are exact → order-independent across
            # micro-batches (a double sum would drift with batch order)
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def stateful_user_totals(events: DataFrame, id_col: str = "user_id",
                         value_col: str = "value") -> DataFrame:
    """Custom stateful streaming operator: per-user running totals kept in
    ``applyInPandasWithState`` group state across micro-batches.

    Each update emits the user's cumulative (n_events, total_value) so
    far; state is one tiny tuple per user — bounded by |users|, not by
    stream length — and survives batch boundaries via the checkpoint.
    This is the extension point for stateful logic Spark's built-in
    windows can't express (custom session rules, decaying counters,
    cross-event sequences)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy(id_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(
    events: DataFrame, id_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (SPARK-49564, the successor to
    ``applyInPandasWithState``): state lives in named typed handles
    (ValueState here; ListState/MapState/timers available), the
    processor is a class with an explicit lifecycle, and state survives
    micro-batch boundaries exactly like the GroupState twin above — the
    parity test drives both over the same batches.

    Scale shape is identical to the old API: one shuffle on the grouping
    key per micro-batch, state partitioned with the key, Arrow-batched
    pandas on the executors."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # Output key column mirrors the grouping column's name AND type —
    # a hardcoded "user_id long" would break for any other id_col.
    id_type = events.schema[id_col].dataType.simpleString()

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {id_col: [key[0]], "n_events": [n],
                 "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(id_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=(
            f"`{id_col}` {id_type}, n_events long, total_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    timestamp_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Exactly-once semantics over an at-least-once stream: drop replayed
    rows by key across micro-batch boundaries (file redelivery, source
    retries — the reference's S3-event ingest redelivers on Lambda retry).

    Two modes, one state-size trade:
    - ``watermark=None``: global ``dropDuplicates`` — exact forever, state
      grows with |keys| (right for bounded key spaces or replay-window
      drains);
    - with ``timestamp_col`` + ``watermark``:
      ``dropDuplicatesWithinWatermark`` — state is evicted once the
      watermark passes a key's event time, so state stays bounded by the
      redelivery window instead of stream length.  The right default at
      100 TB/day: redeliveries arrive within minutes, not days.
    """
    if watermark is not None:
        if timestamp_col is None:
            raise ValueError("watermarked dedup needs timestamp_col")
        return events.withWatermark(timestamp_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def streaming_upsert_totals(
    events: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    id_col: str = "user_id",
    value_col: str = "value",
) -> StreamingQuery:
    """Streaming upsert sink (the foreachBatch SCD1 pattern): every
    micro-batch is reduced to per-key partials map-side, then MERGEd into
    a running totals table inside ``foreachBatch`` — the streaming twin of
    ``operators/entitymatch.merge_into_primary`` (reference
    ``etl_consume_entity_match.py`` MERGE semantics, applied continuously).

    Totals accumulate in decimals, so the final table is EXACTLY the batch
    aggregate regardless of how the stream was cut into micro-batches —
    no float drift from batch-boundary summation order.  State lives in
    the table itself (restart-safe via the checkpoint + idempotent batch
    ids), not in executor memory; per batch the work is one partial
    aggregate of the batch plus a |keys|-sized merge, the standard
    streaming-upsert cost shape.  On a Delta/Iceberg catalog the
    read-union-overwrite inside ``_merge`` becomes a transactional
    ``MERGE INTO`` with the identical per-batch plan."""
    from pyspark.sql import functions as F

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        sess = batch_df.sparkSession
        partial = batch_df.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(20,2)")
            .alias("total_value"),
        )
        if sess.catalog.tableExists(table_name):
            merged = (
                sess.table(table_name)
                .unionByName(partial)
                .groupBy(id_col)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").cast("decimal(20,2)").alias("total_value"),
                )
                .localCheckpoint()
            )
        else:
            merged = partial.localCheckpoint()
        merged.write.mode("overwrite").format("parquet").saveAsTable(table_name)

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------------- kafka
#
# A 100 TB training-data pipeline usually lands from a bus, not a drop
# directory.  Spark's Kafka source lives in a separate jar
# (spark-sql-kafka-0-10) that this container does not ship, so the
# reader is GATED: the option mapping is pure and unit-testable
# offline, and the entry point refuses by name when the provider class
# is absent instead of surfacing Spark's opaque
# "Failed to find data source: kafka".


class KafkaSourceUnavailable(RuntimeError):
    """spark-sql-kafka-0-10 jar is not on the classpath."""


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka source provider class is loadable."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_reader_options(
    bootstrap_servers: str,
    topics: list[str] | str | None = None,
    *,
    subscribe_pattern: str | None = None,
    assign: dict | None = None,
    starting_offsets: str | dict = "earliest",
    ending_offsets: str | dict | None = None,
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
    kafka_options: dict | None = None,
) -> dict:
    """The ``spark.readStream.format('kafka')`` option map (pure —
    unit-testable without the jar).  Exactly one of ``topics`` /
    ``subscribe_pattern`` / ``assign`` selects the subscription mode;
    dict offsets serialize to the JSON form Spark expects;
    ``kafka_options`` pass through under the ``kafka.`` prefix."""
    import json as _json

    chosen = [
        x
        for x in (topics, subscribe_pattern, assign)
        if x is not None and x != []
    ]
    if len(chosen) != 1:
        raise ValueError(
            "exactly one of topics / subscribe_pattern / assign must be "
            "given"
        )
    opts: dict = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics is not None:
        opts["subscribe"] = (
            topics if isinstance(topics, str) else ",".join(topics)
        )
    elif subscribe_pattern is not None:
        opts["subscribePattern"] = subscribe_pattern
    else:
        opts["assign"] = _json.dumps(assign)
    opts["startingOffsets"] = (
        starting_offsets
        if isinstance(starting_offsets, str)
        else _json.dumps(starting_offsets)
    )
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets
            if isinstance(ending_offsets, str)
            else _json.dumps(ending_offsets)
        )
    opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    for k, v in (kafka_options or {}).items():
        key = k if k.startswith("kafka.") else f"kafka.{k}"
        opts[key] = str(v)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str] | str | None = None,
    *,
    value_schema: StructType | str | None = None,
    value_format: str = "json",
    include_headers: bool = False,
    **kwargs,
) -> DataFrame:
    """A streaming DataFrame over Kafka records.

    ``value_format='json'`` with a ``value_schema`` parses the value
    bytes via ``from_json`` into a ``data`` struct column alongside the
    record metadata (key/topic/partition/offset/timestamp);
    ``value_format='raw'`` keeps ``value`` as binary.  Refuses by name
    when the Kafka jar is absent — add
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``
    to the session and this entry point activates unchanged."""
    if not kafka_available(spark):
        raise KafkaSourceUnavailable(
            "the Kafka source (spark-sql-kafka-0-10 jar) is not on the "
            "classpath; start the session with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version> "
            "to enable read_kafka_stream"
        )
    opts = kafka_reader_options(bootstrap_servers, topics, **kwargs)
    reader = spark.readStream.format("kafka").options(**opts)
    if include_headers:
        reader = reader.option("includeHeaders", "true")
    df = reader.load()
    if value_format == "raw":
        return df
    if value_format != "json":
        raise ValueError(
            f"value_format must be json|raw, got {value_format!r}"
        )
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value_str"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        *(["headers"] if include_headers else []),
    )
    if value_schema is not None:
        out = out.withColumn(
            "data", F.from_json("value_str", value_schema)
        ).drop("value_str")
    return out


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str] | str | None = None,
    *,
    ending_offsets: str | dict = "latest",
    value_schema: StructType | str | None = None,
    value_format: str = "json",
    **kwargs,
) -> DataFrame:
    """The BATCH twin of :func:`read_kafka_stream`
    (``spark.read.format('kafka')`` — bounded [starting, ending)
    offsets; the backfill shape).  Same option mapping, same named
    refusal when the jar is absent."""
    if not kafka_available(spark):
        raise KafkaSourceUnavailable(
            "the Kafka source (spark-sql-kafka-0-10 jar) is not on the "
            "classpath; start the session with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version> "
            "to enable read_kafka_batch"
        )
    opts = kafka_reader_options(
        bootstrap_servers, topics, ending_offsets=ending_offsets, **kwargs
    )
    df = spark.read.format("kafka").options(**opts).load()
    if value_format == "raw":
        return df
    if value_format != "json":
        raise ValueError(
            f"value_format must be json|raw, got {value_format!r}"
        )
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value_str"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    if value_schema is not None:
        out = out.withColumn(
            "data", F.from_json("value_str", value_schema)
        ).drop("value_str")
    return out
