"""Streaming query serving: an online ANN query stream over the index.

The reference's workload IS an online stream — 500 queries arriving one
at a time, interleaved with DML (run_demo loop, ipynb c2:57-84). The
Structured-Streaming re-expression: queries arrive as a micro-batch
stream of (query_id, embedding) rows; each micro-batch runs the normal
APS → pruned-scan → top-k search (ipynb c1:147-168 semantics,
operators/ivf.py) and appends its results to a parquet sink,
exactly-once per epoch under foreachBatch's checkpointing contract.

Because APS scoring is a pure function of the query and the index's
centroid/size state (hit counters feed maintenance, not scoring), the
streamed answer for a query is IDENTICAL to the batch answer against
the same index version — pinned by test_streaming.py. Combined with
ingest_stream, this is the full online loop of the reference: queries
and inserts as two concurrent streams over one index, maintenance
rewriting versions between epochs.

Scale: each micro-batch is one driver-side APS (NumPy over the
broadcast-sized centroids table) plus one distributed pruned scan; at
1000 executors the scan parallelism is the per-batch probe-set size,
so throughput scales with batch size, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quake_vector_search_spark.operators.ivf import IVFIndex


def search_stream(index: IVFIndex, queries_stream: DataFrame,
                  results_dir: str, checkpoint_dir: str,
                  k: int = 10, target_recall: float = 0.9,
                  max_probe: int = 64,
                  query_id_col: str = "query_id",
                  query_vec_col: str = "embedding",
                  policy: str = "reference",
                  route_cells: int | None = None,
                  compressed: bool = False,
                  oversample: int = 16):
    """Attach a query stream to the index; each micro-batch's top-k
    results land in ``results_dir`` as parquet rows
    (query_id, vec_id, dist|sim, rank, epoch_id). Returns the
    StreamingQuery; caller owns lifecycle (processAllAvailable/stop).

    ``policy`` passes through to IVFIndex.search — serving can run
    under the fitted calibrated probing rule (round 7). Calibrate
    EAGERLY before attaching the stream (build(calibrate=True) /
    maintain(recalibrate=True)): the implicit auto-fit would otherwise
    run its brute-force pass inside the first micro-batch.
    ``route_cells`` passes through too, so a deployment serving under
    a ROUTED fit (calibrate(route_cells=N)) works — without it every
    micro-batch would refuse on the restriction mismatch.

    ``compressed=True`` (round 7) serves through the IVF+PQ hybrid
    (``knn_ivf_pq``) against whichever codes sidecar the index's
    current version carries (plain/OPQ/IVFADC/LOPQ — flavor
    auto-detected from the sidecar meta): the probed partitions'
    8-byte codes are scanned instead of full vectors, then candidates
    rerank exactly. At 100 TB this is the serving configuration — the
    per-batch scan moves m bytes/vector instead of 4·d. Sidecar
    lifecycle is the streaming one: maintenance republishes re-encode
    it, ``ingest_stream`` keeps it current for streamed inserts.
    ``route_cells`` composes with the compressed path too (the hybrid
    shares search()'s routed scoring and restriction-matching rule).
    """
    from quake_vector_search_spark.operators.quantization import (
        knn_ivf_pq,
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if compressed:
            out, _meta = knn_ivf_pq(
                index,
                batch_df.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(query_vec_col).alias(index.vec_col)),
                k=k, target_recall=target_recall,
                max_probe=max_probe, oversample=oversample,
                policy=policy, route_cells=route_cells)
        else:
            out, _meta = index.search(
                batch_df, k=k, target_recall=target_recall,
                max_probe=max_probe, query_id_col=query_id_col,
                query_vec_col=query_vec_col, policy=policy,
                route_cells=route_cells)
        (out.withColumn("epoch_id", F.lit(int(epoch_id)))
         .write.mode("append").parquet(results_dir))

    return (queries_stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(handle_batch)
            .start())
