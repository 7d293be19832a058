"""Data lineage event log.

The reference logs one DynamoDB item per pipeline operation — ordered
sequence number, dataset, operation name, spec JSON, row/column counts, and a
``numericaudit`` control-total event summing every numeric column
(``lib/glue_scripts/lib/datalineage.py:60-89,135-145``).  Here the same
events append to a local JSONL file (or stay in memory), i.e. an ordinary
lake table a cluster deployment would write as Parquet/Delta.

The numeric audit is a single ``df.agg`` over all decimal/double columns —
one job, map-side partial aggregation, no shuffle of raw data.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LineageLog:
    def __init__(
        self,
        execution_id: str = "local-run",
        dataset: str = "",
        path: str | None = None,
    ) -> None:
        self.execution_id = execution_id
        self.dataset = dataset
        self.path = path
        self.seq = 0
        self.events: list[dict[str, Any]] = []

    def update(self, operation: str, df: DataFrame | None = None, **info: Any) -> None:
        self.seq += 1
        event: dict[str, Any] = {
            "execution_id": self.execution_id,
            "dataset": self.dataset,
            "seq": self.seq,
            "operation": operation,
            "time": time.time(),
            **info,
        }
        if df is not None:
            event["column_count"] = len(df.columns)
        self.events.append(event)
        if self.path:
            with open(self.path, "a", encoding="utf-8") as handle:
                handle.write(json.dumps(event, default=str) + "\n")

    def numeric_audit_observed(
        self, df: DataFrame, operation: str = "numericaudit"
    ):
        """Single-pass numeric audit via ``df.observe``: returns
        (instrumented_df, finish) — attach the returned DataFrame to the
        job that was going to run anyway (the cleanse write), then call
        ``finish()`` after that action to log the audit event.  Unlike
        :meth:`numeric_audit` this costs ZERO extra passes: the metrics
        accumulate inside the write job itself, which at 100 TB is the
        difference between scanning the stage output once and twice
        (the cache only mitigates the second scan while it fits
        executor memory)."""
        from pyspark.sql import Observation

        numeric_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float", "decimal", "integer", "long", "short")
        ]
        obs = Observation(f"{operation}-{id(df)}")
        instrumented = df.observe(
            obs,
            F.count(F.lit(1)).alias("__row_count"),
            *[F.sum(F.col(c)).alias(c) for c in numeric_cols],
        )

        def finish() -> dict[str, Any]:
            row = obs.get
            totals = {c: row[c] for c in numeric_cols}
            self.update(operation, df=df, row_count=row["__row_count"],
                        column_sums=totals)
            return {"row_count": row["__row_count"], "column_sums": totals}

        return instrumented, finish

    def numeric_audit(self, df: DataFrame, operation: str = "numericaudit") -> dict[str, Any]:
        """Row count + per-numeric-column sums as one aggregate job."""
        numeric_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float", "decimal", "integer", "long", "short")
        ]
        aggs = [F.count(F.lit(1)).alias("__row_count")] + [
            F.sum(F.col(c)).alias(c) for c in numeric_cols
        ]
        row = df.agg(*aggs).collect()[0].asDict()
        totals = {c: row[c] for c in numeric_cols}
        self.update(operation, df=df, row_count=row["__row_count"], column_sums=totals)
        return {"row_count": row["__row_count"], "column_sums": totals}
