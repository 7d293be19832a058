"""Canary: ``read_events`` must survive BOTH events-fixture encodings.

The driver's testdata generator has shipped the events ``ts`` column two
ways across rounds: int64 nanoseconds-since-epoch and native parquet
``timestamp[us]``.  Round 3 was zeroed because the reader assumed one
encoding.  This test writes a tiny events table in each encoding, reads
both through :func:`normalize_event_ts` / ``read_events``, and asserts
dtype ``timestamp`` plus identical values — so a driver-side fixture
regeneration can never silently break the engine again.
"""

from __future__ import annotations

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from aws_insurancelake_etl_spark.queries.util import normalize_event_ts, read_events

_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)
_MICROS = [
    int((_EPOCH + datetime.timedelta(minutes=i)).timestamp() * 1_000_000)
    for i in range(5)
]


def _base_cols() -> dict:
    return {
        "event_id": pa.array(range(5), type=pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "event_type": pa.array(["click", "view", "click", "purchase", "view"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], type=pa.float64()),
        "props": pa.array(['{"a":1}'] * 5),
    }


def _write_events(tmp: str, ts_array: pa.Array, sub: str) -> str:
    sf_dir = os.path.join(tmp, sub)
    os.makedirs(sf_dir)
    cols = _base_cols()
    table = pa.table({"event_id": cols["event_id"], "ts": ts_array, **{
        k: v for k, v in cols.items() if k != "event_id"
    }})
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_read_events_handles_both_ts_encodings(spark):
    with tempfile.TemporaryDirectory(prefix="events-canary-") as tmp:
        nanos_dir = _write_events(
            tmp, pa.array([m * 1000 for m in _MICROS], type=pa.int64()), "nanos"
        )
        micros_dir = _write_events(
            tmp, pa.array(_MICROS, type=pa.timestamp("us")), "micros"
        )

        df_nanos = read_events(spark, nanos_dir)
        df_micros = read_events(spark, micros_dir)

        for df in (df_nanos, df_micros):
            assert dict(df.dtypes)["ts"] == "timestamp"

        rows_nanos = sorted(
            (r.event_id, r.ts) for r in df_nanos.select("event_id", "ts").collect()
        )
        rows_micros = sorted(
            (r.event_id, r.ts) for r in df_micros.select("event_id", "ts").collect()
        )
        assert rows_nanos == rows_micros
        # unix_micros (used by the events queries) must typecheck on the result
        assert df_micros.selectExpr("unix_micros(ts) AS um").count() == 5


def test_normalize_event_ts_is_idempotent(spark):
    with tempfile.TemporaryDirectory(prefix="events-canary2-") as tmp:
        micros_dir = _write_events(
            tmp, pa.array(_MICROS, type=pa.timestamp("us")), "micros"
        )
        df = read_events(spark, micros_dir)
        again = normalize_event_ts(df)
        assert dict(again.dtypes)["ts"] == "timestamp"
        assert again.count() == 5
