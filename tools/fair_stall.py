"""Measure ingest micro-batch stall while an async maintain() runs a
long EXECUTOR stage, under FIFO vs FAIR scheduling (round 15, VERDICT
r14 #3 done-criterion). The maintain is monkeypatch-prefixed with a
cluster-saturating stage (32 tasks x ~2.5s on 8 slots — executor
sleep, not driver sleep); batch latency is read from the streaming
query's recentProgress triggerExecution durations.

Round 16 (VERDICT r15 #3): optional TASKS and TASK_S args vary the
saturating stage's GRANULARITY at constant total work (default
32 x 2.5 s = 80 task-seconds). FAIR has no preemption — an ingest
batch's p50 is floored by the remaining time of the shortest
in-flight maintain task — so finer maintain tasks are the only lever
that can recover the idle-window p50 the round-15 measurement gave
up (0.85 -> 2.61 s). ``python fair_stall.py FAIR 128 0.625`` measures
that arm.

Usage: python fair_stall.py FIFO|FAIR [TASKS TASK_S]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

mode = sys.argv[1]
assert mode in ("FIFO", "FAIR")
BURN_TASKS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BURN_TASK_S = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.scheduler.mode", mode)
         .config("spark.ui.enabled", "false")
         .appName(f"qvss-stall-{mode}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import quake_vector_search_spark.operators.maintenance as maint_mod
from quake_vector_search_spark.operators.ivf import IVFIndex
from quake_vector_search_spark.operators.workload import make_dataset
from quake_vector_search_spark.streaming.ingest import (
    finish_async_maintenance,
    ingest_stream,
)

tmp = tempfile.mkdtemp()
corpus = make_dataset(spark, 8_000, d=32, n_clusters=8, seed=5)
idx = IVFIndex.build(corpus, os.path.join(tmp, "ivf"),
                     coarse_k=4, base_k=4)

real_maintain = maint_mod.maintain


def heavy_maintain(index_, **kw):
    # saturate the executors from INSIDE the maintain thread:
    # BURN_TASKS x BURN_TASK_S on 8 slots (default 32 x 2.5 s =
    # ~10 s of full occupancy; granularity arms hold the product
    # constant)
    def burn(it):
        time.sleep(BURN_TASK_S)
        yield from it

    (index_.spark.sparkContext.range(0, BURN_TASKS,
                                     numSlices=BURN_TASKS)
     .mapPartitions(burn).count())
    return real_maintain(index_, **kw)


maint_mod.maintain = heavy_maintain

rng = np.random.default_rng(7)
vdir, ckpt = os.path.join(tmp, "v"), os.path.join(tmp, "c")
os.makedirs(vdir, exist_ok=True)
for k in range(14):  # cadence 2 -> heavy maintain after batch 2
    rows = [(int(50_000 + 2 * k + j),
             rng.normal(size=32).astype(float).tolist())
            for j in range(2)]
    (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
     .coalesce(1).write.mode("append").parquet(vdir))
vstream = (spark.readStream
           .schema("vec_id long, embedding array<float>")
           .option("maxFilesPerTrigger", 1).parquet(vdir))
t0 = time.time()
q = ingest_stream(idx, vstream, ckpt, encode_pq=False,
                  maintain_every_n_batches=2, maintain_async=True)
q.processAllAvailable()
drain_s = time.time() - t0
prog = [json.loads(p.json) for p in q.recentProgress]
q.stop()
while getattr(idx, "_async_maint", None):
    finish_async_maintenance(idx)
durs = sorted(p["durationMs"]["triggerExecution"] / 1000.0
              for p in prog if p["numInputRows"] > 0)
p50 = durs[len(durs) // 2]
p95 = durs[min(len(durs) - 1, int(0.95 * len(durs)))]
live = idx.read_corpus().where("vec_id >= 50000").count()
print(json.dumps({"mode": mode, "burn_tasks": BURN_TASKS,
                  "burn_task_s": BURN_TASK_S, "batches": len(durs),
                  "batch_p50_s": round(p50, 2),
                  "batch_p95_s": round(p95, 2),
                  "batch_max_s": round(durs[-1], 2),
                  "drain_s": round(drain_s, 2),
                  "rows_exactly_once": live == 28}))
