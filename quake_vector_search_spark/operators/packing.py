"""Sequence packing: batch documents into fixed-token-budget training
sequences — the step between a cleaned corpus and a dataloader.

Exact greedy bin packing is inherently sequential (every bin boundary
depends on the running remainder), which makes it both unscalable and
engine-specific. This operator uses PREFIX-SUM PACKING instead: within
a deterministic shard, documents are laid on a contiguous tape in
(doc_id) order and the tape is cut every ``capacity`` tokens —
bin = floor(pre_cumsum / capacity). Properties:

- one window (prefix sum) per shard — linear, one shuffle, no
  sequential state, identical on any engine/partitioning (the DuckDB
  oracle computes the same formula);
- every bin except a shard's last holds ≥ capacity − max_doc_tokens
  and < capacity + max_doc_tokens worth of starts — i.e. fill error is
  bounded by the largest document, the same bound practical packers
  accept (documents that straddle a cut are assigned to the bin where
  they start; trainers then truncate or roll the tail);
- shards are independent, so 100 TB packs with full parallelism:
  shard = a deterministic PORTABLE hash bucket of doc_id (the md5
  construction sampling.py uses, so the oracle shards identically);
  ``n_shards`` is sized so a shard's token mass ≫ capacity, keeping
  per-shard remainder waste negligible.

Token counts use the same whitespace tokenizer as text.py's token
stats (swap in a real tokenizer's counts column at will — the packing
only needs (doc_id, n_tokens)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(docs: DataFrame, capacity: int,
                   n_shards: int = 8,
                   id_col: str = "doc_id",
                   tokens_col: str | None = None,
                   text_col: str = "text") -> DataFrame:
    """Assign every document a (shard, bin) training-sequence slot.

    Returns (id, n_tokens, shard, bin, bin_start_offset) where
    bin_start_offset is the document's token offset inside its bin's
    tape segment. Deterministic: pure function of (ids, token counts,
    capacity, n_shards).
    """
    if tokens_col is None:
        toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        docs = docs.withColumn("n_tokens", toks)
        tokens_col = "n_tokens"
    tag = F.concat_ws(":", F.lit("pack"), F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(F.md5(tag), 1, 15), 16, 10)
             .cast("long") % n_shards)
    w = (Window.partitionBy("shard").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    pre = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (docs.select(F.col(id_col), F.col(tokens_col).alias("n_tokens"))
            .withColumn("shard", shard)
            .withColumn("_pre", pre)
            .select(id_col, "n_tokens", "shard",
                    F.floor(F.col("_pre") / capacity).alias("bin"),
                    (F.col("_pre") % capacity).alias("bin_start_offset")))


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-(shard, bin) fill report: docs per bin, token mass, fill
    ratio vs capacity. The tail bin of each shard under-fills; every
    other bin's mass is within one max-document of capacity."""
    return (packed.groupBy("shard", "bin")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("tokens"))
            .withColumn("fill_ratio",
                        F.round(F.col("tokens") / F.lit(capacity), 6)))
