"""Streaming ingest into the IVF index (SURVEY.md §3.3 / §7.6).

The reference interleaves point inserts/deletes with queries in a
single-threaded loop (run_demo cadence, ipynb c2:71-81). The streaming
re-expression: a micro-batch stream of (vec_id, embedding) rows driven
through ``foreachBatch``, each batch routed with the same nearest-
coarse→nearest-base policy via IVFIndex.insert — exactly-once per epoch
because foreachBatch sees each micro-batch exactly once under the
default checkpointing contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from quake_vector_search_spark.operators.ivf import IVFIndex


def ingest_stream(index: IVFIndex, vectors_stream: DataFrame,
                  checkpoint_dir: str):
    """Attach a vector stream to the index. Returns the StreamingQuery;
    caller owns lifecycle (processAllAvailable/stop)."""
    id_col, vec_col = index.id_col, index.vec_col

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.select(id_col, vec_col).collect()
        if not rows:
            return
        ids = [r[0] for r in rows]
        vecs = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
        index.insert(ids, vecs)

    return (vectors_stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(handle_batch)
            .start())
