"""Token-budget sequence packing — the batch-assembly stage of a
training-data pipeline: documents are concatenated (in a fixed,
reproducible order) into fixed-budget training sequences, and each
document needs to know which sequence it landed in and at what token
offset.

Packing is a sequential recurrence (a document's placement depends on
how full the current sequence is), so it cannot be a window function —
but it is embarrassingly parallel ACROSS shards. The operator runs one
Arrow-batched grouped-map per hash shard (the same execution shape as
operators/allocation.py): shard count scales with the cluster, each
shard's scan is a single ordered pass, and no shard ever sees another
shard's state. At 100 TB you raise ``n_shards`` to O(cores); the
per-shard pass stays memory-bounded because only (doc_id, n_toks)
enters the grouped map — never the text.

Greedy next-fit policy (the standard pre-training packer): documents
are taken in doc_id order; if the current sequence cannot fit the next
document, a new sequence starts. A document longer than the budget
occupies a sequence of its own. Deterministic given the order, which
is why the order is the stable (shard, doc_id) key and not arrival
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("shard", IntegerType(), False),
        StructField("n_toks", LongType(), False),
        StructField("seq_id", LongType(), False),
        StructField("seq_offset", LongType(), False),
    ]
)


def pack_documents(sized_docs: DataFrame, *, budget: int) -> DataFrame:
    """Assign each document a (seq_id, seq_offset) within its shard.

    ``sized_docs`` must carry ``doc_id`` (long), ``shard`` (int) and
    ``n_toks`` (long). Sequences are numbered per shard from 0 in
    doc_id order; ``seq_offset`` is the token position where the
    document starts inside its sequence.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        sizes = pdf["n_toks"].to_numpy()
        seq_ids = np.zeros(len(pdf), dtype=np.int64)
        offsets = np.zeros(len(pdf), dtype=np.int64)
        seq, fill = 0, 0
        for i, n in enumerate(sizes):
            if fill > 0 and fill + n > budget:
                seq, fill = seq + 1, 0
            seq_ids[i], offsets[i] = seq, fill
            fill += n
        pdf["seq_id"] = seq_ids
        pdf["seq_offset"] = offsets
        return pdf[["doc_id", "shard", "n_toks", "seq_id", "seq_offset"]]

    return sized_docs.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)
