"""Custom Python DataSource: per-day transaction collections.

The reference scans one MongoDB collection per day from a driver loop
(`data_processor.py:103-134`, loop at `:172`). This Spark 4 Python
DataSource replaces that pattern at the SOURCE layer: each day in the
requested range becomes one input partition, so

- the date range prunes at PLANNING time (days outside [start, end]
  are never opened — the driver loop's manual pruning, now free),
- days read in PARALLEL across executors (the loop read serially),
- downstream code sees one DataFrame with a ``day`` column, exactly
  the date-partitioned layout the engine recommends for 100 TB.

Usage::

    spark.dataSource.register(CandyTransactionsDataSource)
    df = (spark.read.format("candy_transactions")
          .option("path", "/data/dataset_5")
          .option("start", "20240201").option("end", "20240210").load())

The same class is the template for a real MongoDB/change-stream
source: ``partitions()`` would enumerate collections/shards and
``read()`` would pull one cursor each.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TRANSACTIONS_DDL = (
    "transaction_id int, customer_id int, timestamp string, "
    "items array<struct<product_id: int, product_name: string, qty: int>>, "
    "day string"
)


class _DayPartition(InputPartition):
    def __init__(self, day: str, path: str) -> None:
        self.day = day
        self.path = path


class CandyTransactionsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("candy_transactions requires option 'path'")
        self.start = options.get("start", "00000000")
        self.end = options.get("end", "99999999")

    def partitions(self) -> Sequence[InputPartition]:
        """One partition per day file inside [start, end] — date-range
        pruning at planning time, parallel reads at execution time."""
        parts = []
        for p in sorted(glob.glob(os.path.join(self.root, "transactions_*.json"))):
            day = os.path.basename(p)[len("transactions_") : -len(".json")]
            if self.start <= day <= self.end:
                parts.append(_DayPartition(day, p))
        if not parts:
            raise ValueError(
                f"no transactions_*.json in {self.root!r} within "
                f"[{self.start}, {self.end}]"
            )
        return parts

    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        with open(partition.path) as f:
            docs = json.load(f)
        for d in docs:
            items = d.get("items") or []
            yield (
                d.get("transaction_id"),
                d.get("customer_id"),
                d.get("timestamp"),
                [
                    (
                        it.get("product_id"),
                        it.get("product_name"),
                        it.get("qty"),
                    )
                    for it in items
                ],
                partition.day,
            )


def _read_day_rows(path: str, day: str) -> list[tuple]:
    with open(path) as f:
        docs = json.load(f)
    return [
        (
            d.get("transaction_id"),
            d.get("customer_id"),
            d.get("timestamp"),
            [
                (it.get("product_id"), it.get("product_name"), it.get("qty"))
                for it in (d.get("items") or [])
            ],
            day,
        )
        for d in docs
    ]


class CandyTransactionsStreamReader(SimpleDataSourceStreamReader):
    """Structured-Streaming face of the same source: each day
    collection is one committed offset range, arriving as its own
    microbatch — the shape of a Mongo change-stream / daily-drop
    ingestion. Offsets are day indexes into the sorted file list, so
    ``readBetweenOffsets`` can replay any committed range exactly
    (checkpoint recovery is deterministic); ``read`` advances one day
    per batch. A real change-stream source swaps the file read for a
    resume-token cursor — offsets and replay keep the same contract."""

    def __init__(self, options: dict) -> None:
        root = options.get("path")
        if not root:
            raise ValueError("candy_transactions requires option 'path'")
        start = options.get("start", "00000000")
        end = options.get("end", "99999999")
        self.days: list[tuple[str, str]] = []
        for p in sorted(glob.glob(os.path.join(root, "transactions_*.json"))):
            day = os.path.basename(p)[len("transactions_") : -len(".json")]
            if start <= day <= end:
                self.days.append((day, p))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = int(start["index"])
        if i >= len(self.days):
            return iter(()), {"index": i}
        day, path = self.days[i]
        return iter(_read_day_rows(path, day)), {"index": i + 1}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        rows: list[tuple] = []
        for day, path in self.days[int(start["index"]) : int(end["index"])]:
            rows.extend(_read_day_rows(path, day))
        return iter(rows)


class CandyTransactionsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "candy_transactions"

    def schema(self) -> str:
        return TRANSACTIONS_DDL

    def reader(self, schema) -> CandyTransactionsReader:
        return CandyTransactionsReader(self.options)

    def simpleStreamReader(self, schema) -> CandyTransactionsStreamReader:
        return CandyTransactionsStreamReader(self.options)
