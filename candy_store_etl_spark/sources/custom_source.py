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
        yield from _read_day_rows(partition.path, partition.day)


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
    ingestion. The offset is the LAST PROCESSED DAY STRING (not a list
    index): the directory is re-listed on every ``read`` call, so
    files dropped while the query runs are picked up live, and
    ``readBetweenOffsets`` replays a committed (start, end] day range
    deterministically even if the listing has since grown. Like any
    monotonic-drop ingestion, a file BACKFILLED with a day earlier
    than the committed offset is skipped — replay old days with a
    fresh checkpoint (start/end options), the same contract as a
    resume-token change-stream cursor."""

    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("candy_transactions requires option 'path'")
        self.start = options.get("start", "00000000")
        self.end = options.get("end", "99999999")

    def _list_days(self) -> list[tuple[str, str]]:
        days = []
        for p in sorted(glob.glob(os.path.join(self.root, "transactions_*.json"))):
            day = os.path.basename(p)[len("transactions_") : -len(".json")]
            if self.start <= day <= self.end:
                days.append((day, p))
        return days

    def initialOffset(self) -> dict:
        return {"last_day": "00000000"}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        last = start["last_day"]
        for day, path in self._list_days():
            if day > last:
                return iter(_read_day_rows(path, day)), {"last_day": day}
        return iter(()), {"last_day": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for day, path in self._list_days():
            if start["last_day"] < day <= end["last_day"]:
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
