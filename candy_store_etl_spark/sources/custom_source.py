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
    "transaction_id long, customer_id int, timestamp string, "
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
        parts = [
            _DayPartition(day, p)
            for day, p in _list_day_files(self.root, self.start, self.end)
        ]
        if not parts:
            raise ValueError(
                f"no transactions_*.json in {self.root!r} within "
                f"[{self.start}, {self.end}]"
            )
        return parts

    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        yield from _read_day_rows(partition.path, partition.day)


def _list_day_files(root: str, start: str, end: str) -> list[tuple[str, str]]:
    """Sorted (day, path) pairs for transactions_*.json within
    [start, end] — the ONE definition of which files constitute the
    dataset, shared by the batch planner and the stream reader."""
    days = []
    for p in sorted(glob.glob(os.path.join(root, "transactions_*.json"))):
        day = os.path.basename(p)[len("transactions_") : -len(".json")]
        if start <= day <= end:
            days.append((day, p))
    return days


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
    files dropped while the query runs are picked up live. Each batch
    ingests exactly ONE day, so a committed (start, end] range always
    denotes the single day ``end`` — ``readBetweenOffsets`` replays
    that day's file alone, which stays byte-identical to the original
    batch even if the listing has since grown (a day BACKFILLED inside
    the range after commit is NOT retroactively added to the replay).
    Like any monotonic-drop ingestion, a backfilled day at-or-before
    the committed offset is skipped by ``read`` — replay old days with
    a fresh checkpoint (start/end options), the same contract as a
    resume-token change-stream cursor."""

    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("candy_transactions requires option 'path'")
        self.start = options.get("start", "00000000")
        self.end = options.get("end", "99999999")

    def initialOffset(self) -> dict:
        return {"last_day": "00000000"}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        last = start["last_day"]
        for day, path in _list_day_files(self.root, self.start, self.end):
            if day > last:
                return iter(_read_day_rows(path, day)), {"last_day": day}
        return iter(()), {"last_day": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # each batch commits exactly one day (see read), so the range
        # identifies the single day `end`; replaying only it keeps
        # recovery byte-identical to the original batch even if files
        # were backfilled inside (start, end) after the commit
        for day, path in _list_day_files(self.root, self.start, self.end):
            if day == end["last_day"]:
                return iter(_read_day_rows(path, day))
        return iter(())


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
