"""Vector-search queries (SURVEY.md O1-O3, O15, E14).

Oracle strategy: DuckDB's `list_distance` / `list_cosine_similarity`
over DOUBLE[] casts match our float64 kernels; distances rounded to 6
digits on both sides before hashing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.operators.knn import cosine_topk, knn_bruteforce
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

N_QUERIES = 5   # query vectors: the first N rows of the embeddings table
K = 10

_IVF_CACHE: dict[str, object] = {}


def _ivf_index(spark, sf_dir):
    """Build (once per process per sf_dir) an IVF index over the
    embeddings table in a scratch dir."""
    import atexit
    import glob
    import os
    import re
    import shutil

    from quake_vector_search_spark.operators.ivf import IVFIndex
    if sf_dir not in _IVF_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        # pid-scoped scratch: the cache dict is process-local but the
        # DIRECTORY was global — two concurrent harness processes (a
        # full sweep + a single-query check) would rmtree each other's
        # live index out from under running queries (observed: 3
        # FileNotFoundException failures in an sf0.01 sweep)
        pid_dir = f"/tmp/qvss_ivf_{os.getpid()}"
        workdir = os.path.join(
            pid_dir, sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(workdir, ignore_errors=True)
        # this process cleans its own dir on exit, and sweeps dirs
        # orphaned by dead pids (a kill -9'd harness can't atexit) so
        # /tmp doesn't accumulate a full index copy per past run
        atexit.register(shutil.rmtree, pid_dir, ignore_errors=True)
        for stale in glob.glob("/tmp/qvss_ivf_*"):
            m = re.fullmatch(r"/tmp/qvss_ivf_(\d+)", stale)
            if not m or int(m.group(1)) == os.getpid():
                continue
            if not os.path.exists(f"/proc/{m.group(1)}"):
                shutil.rmtree(stale, ignore_errors=True)
        _IVF_CACHE[sf_dir] = IVFIndex.build(emb, workdir,
                                            coarse_k=16, base_k=4)
    return _IVF_CACHE[sf_dir]


@register("knn_brute_l2", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_brute_l2(spark, sf_dir):
    """Exact L2 top-{K} for the first {N} embedding vectors vs the whole
    corpus (reference exact_topk, ipynb c1:212-215)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = knn_bruteforce(emb, queries, k=K)
    return out.withColumn("dist", F.round("dist", 6))


@register("knn_cosine", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qvec AS DOUBLE[])) AS sim
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_cosine(spark, sf_dir):
    """Exact cosine top-{K} (similarity DESC) — the embedding-similarity
    primitive for near-dup detection (E12) and ANN baselines (E14)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = cosine_topk(emb, queries, k=K)
    return out.withColumn("sim", F.round("sim", 6))


# Reuse the brute-force SQL: at target_recall=1.0 the APS cumulative-
# probability cutoff only triggers at the full partition set (softmax
# sums to 1), so the IVF path probes everything and must return exactly
# the brute-force answer — an oracle-checked end-to-end exercise of
# build → APS → partition-pruned scan → local/global top-k.
@register("ivf_search_fullprobe", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def ivf_search_fullprobe(spark, sf_dir):
    """IVF search (O5-O11) at target_recall=1.0 → full probe set →
    results must equal brute force (reference search, ipynb c1:147-168)."""
    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out, _meta = idx.search(queries, k=K, target_recall=1.0,
                            max_probe=1_000_000_000)
    return out.withColumn("dist", F.round("dist", 6))


@register("ivf_search_adaptive", sql=f"""
SELECT vec_id AS query_id, TRUE AS k_rows_ok, TRUE AS sorted_ok,
       TRUE AS recall_ge_08
FROM embeddings WHERE vec_id < {N_QUERIES} ORDER BY vec_id
""")
def ivf_search_adaptive(spark, sf_dir):
    """IVF search with adaptive nprobe at target_recall=0.9 (the
    reference's demo config, ipynb c2:38). Approximate by design, so
    the exact result set is not SQL-expressible — instead the driver
    hash-checks PROPERTY ENCODINGS computed genuinely on the Spark
    side (the gen_dataset_pinned technique): per query, exactly k
    result rows, distances non-decreasing in rank, and recall@{K}
    vs in-frame brute force ≥ 0.8 (measured ≥ 0.9 at the driver's
    sf0.01; the APS cutoff targets 0.9 estimated recall)."""
    from quake_vector_search_spark.operators.evaluation import recall_at_k

    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    found, _meta = idx.search(queries, k=K, target_recall=0.9)
    exact = knn_bruteforce(emb, queries, k=K)
    rec = recall_at_k(found, exact, K)
    dists_by_rank = F.expr(
        "transform(array_sort(collect_list(struct(rank, dist))), "
        "s -> s.dist)")
    per = (found.groupBy("query_id")
           .agg((F.count("*") == K).alias("k_rows_ok"),
                (F.expr("array_sort(transform(array_sort("
                        "collect_list(struct(rank, dist))), s -> s.dist))")
                 == dists_by_rank).alias("sorted_ok")))
    return (per.join(rec, "query_id")
            .select("query_id", "k_rows_ok", "sorted_ok",
                    (F.col("recall") >= 0.8).alias("recall_ge_08"))
            .orderBy("query_id"))


@register("kmeans_clusters", sql="""
SELECT (SELECT COUNT(*) FROM embeddings) AS n_rows, CAST(8 AS INT) AS k,
       TRUE AS rerun_stable, TRUE AS assignment_is_argmin,
       TRUE AS sizes_sum_matches
""")
def kmeans_clusters(spark, sf_dir):
    """Seeded distributed k-means (O4, reference kmeans ipynb c1:22-36):
    k=8, 8 iterations, seed 42 over the embeddings table. Lloyd's is
    iterative, so the centroids themselves are not SQL-expressible —
    the driver instead hash-checks property encodings, each computed
    genuinely here: (a) a seeded rerun reproduces bit-identical
    centroids (the deterministic seeded-sample init); (b) every row's
    assigned cluster is its argmin-distance centroid, re-verified
    through an INDEPENDENT Catalyst expression path (zip_with/aggregate
    distances vs the BLAS mapInPandas path, 1e-9 tolerance for the
    x²+y²−2xy vs Σ(x−y)² ulp gap); (c) cluster sizes sum to the corpus
    row count — with n_rows cross-checked against DuckDB's COUNT(*)."""
    import numpy as np

    from quake_vector_search_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=8, iters=8, seed=42)
    rerun = kmeans_fit(emb, k=8, iters=8, seed=42)
    rerun_stable = bool(np.array_equal(centroids, rerun))
    assigned = assign_clusters(emb, centroids, out_col="cluster_id")
    cents_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dists = F.expr(
        "transform(_cents, c -> aggregate("
        "zip_with(cast(embedding as array<double>), c, "
        "(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x))")
    checked = (assigned.withColumn("_cents", cents_lit)
               .withColumn("_d", dists)
               .select("cluster_id",
                       (F.expr("element_at(_d, cast(cluster_id + 1 as int))")
                        <= F.expr("array_min(_d)") + 1e-9).alias("_ok")))
    agg = checked.agg(
        F.count("*").alias("n_rows"),
        F.min("_ok").alias("argmin_ok"),
        F.countDistinct("cluster_id").alias("n_used")).head()
    sizes_sum = int(agg["n_rows"])
    n_rows = emb.count()
    return spark.createDataFrame(
        [(int(n_rows), 8, rerun_stable, bool(agg["argmin_ok"]),
          sizes_sum == n_rows)],
        "n_rows long, k int, rerun_stable boolean, "
        "assignment_is_argmin boolean, sizes_sum_matches boolean")


@register("aps_partition_scores", sql="""
SELECT TRUE AS probs_sum_1, TRUE AS sorted_desc, TRUE AS nprobe_in_range,
       TRUE AS nprobe_minimal, TRUE AS nprobe_monotone
""")
def aps_partition_scores(spark, sf_dir):
    """APS partition scoring + adaptive nprobe choice (O8/O9, reference
    _partition_scores / _choose_nprobe ipynb c1:127-145) for the first
    query vector, driver-checked via property encodings computed
    genuinely from the live scores (the softmax VALUES themselves are
    hash-checked by the sibling aps_scores_distributed row): softmax
    probabilities sum to 1 and arrive sorted descending; the chosen
    nprobe is in [1, P], is the MINIMAL prefix whose cumulative
    probability reaches the 0.9 target, and is monotone non-decreasing
    across targets 0.5 → 0.9 → 0.99."""
    import numpy as np
    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = np.array(
        emb.where(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64)
    _order, probs_sorted = idx.partition_scores(q[None, :])
    p = probs_sorted[0]
    n_parts = p.shape[0]
    nprobes = [int(idx.choose_nprobe(probs_sorted, target_recall=t,
                                     max_probe=64)[0])
               for t in (0.5, 0.9, 0.99)]
    nprobe = nprobes[1]
    cum = np.cumsum(p)
    probs_sum_1 = bool(abs(float(p.sum()) - 1.0) < 1e-9)
    sorted_desc = bool(np.all(np.diff(p) <= 1e-15))
    nprobe_in_range = bool(1 <= nprobe <= n_parts)
    nprobe_minimal = bool(
        (nprobe == min(n_parts, 64) or cum[nprobe - 1] >= 0.9 - 1e-12)
        and (nprobe == 1 or cum[nprobe - 2] < 0.9))
    nprobe_monotone = bool(nprobes[0] <= nprobes[1] <= nprobes[2])
    return spark.createDataFrame(
        [(probs_sum_1, sorted_desc, nprobe_in_range, nprobe_minimal,
          nprobe_monotone)],
        "probs_sum_1 boolean, sorted_desc boolean, "
        "nprobe_in_range boolean, nprobe_minimal boolean, "
        "nprobe_monotone boolean")


@register("ivf_recall_eval", sql=f"""
SELECT vec_id AS query_id, TRUE AS adaptive_recall_valid,
       TRUE AS adaptive_recall_ge_08, CAST(1.0 AS DOUBLE) AS fullprobe_recall
FROM embeddings WHERE vec_id < {N_QUERIES} ORDER BY vec_id
""")
def ivf_recall_eval(spark, sf_dir):
    """Recall@k evaluation (O12, reference ipynb c1:164-167): adaptive
    IVF results joined against brute-force ground truth — the
    reference's only self-test, as a query. Property-encoded for the
    driver: per query, the adaptive recall@{K} is a valid fraction in
    [0, 1] and ≥ 0.8, and the FULL-probe recall is exactly 1.0 (the
    full probe set must reproduce brute force bit-for-bit — computed
    genuinely by a second search at target_recall=1.0)."""
    from quake_vector_search_spark.operators.evaluation import recall_at_k

    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    exact = knn_bruteforce(emb, queries, k=K)
    adaptive, _ = idx.search(queries, k=K, target_recall=0.9)
    full, _ = idx.search(queries, k=K, target_recall=1.0,
                         max_probe=1_000_000_000)
    rec_a = recall_at_k(adaptive, exact, K) \
        .withColumnRenamed("recall", "recall_a")
    rec_f = recall_at_k(full, exact, K) \
        .withColumnRenamed("recall", "fullprobe_recall")
    return (rec_a.join(rec_f, "query_id")
            .select("query_id",
                    ((F.col("recall_a") >= 0.0)
                     & (F.col("recall_a") <= 1.0))
                    .alias("adaptive_recall_valid"),
                    (F.col("recall_a") >= 0.8)
                    .alias("adaptive_recall_ge_08"),
                    F.round("fullprobe_recall", 6)
                    .alias("fullprobe_recall"))
            .orderBy("query_id"))


@register("ivf_dml_roundtrip", sql="""
SELECT 'deleted_absent' AS invariant, CAST(0 AS BIGINT) AS value
UNION ALL SELECT 'dup_ids', 0
UNION ALL SELECT 'inserted_present', 20
UNION ALL SELECT 'live_count_delta', 10
UNION ALL SELECT 'sizes_match_live', 1
""")
def ivf_dml_roundtrip(spark, sf_dir):
    """DML + maintenance invariants (O6/O7/O13/O14) as a query: build a
    scratch index, insert 20 seeded vectors, delete 10 existing ids,
    run maintenance, and emit the set-invariant checks the reference's
    id2loc bookkeeping guarantees positionally (ipynb c1:92-125,
    170-210) — re-expressed as anti-join/count invariants whose
    expected values are data-independent constants (+20 inserts − 10
    deletes, zero resurrections, zero duplicate ids, driver sizes in
    sync with the visible corpus), so the oracle is a literal table
    and the driver hash-checks every computed value."""
    import os
    import shutil

    import numpy as np

    from quake_vector_search_spark.operators.ivf import IVFIndex
    from quake_vector_search_spark.operators.maintenance import maintain

    emb = load_table(spark, sf_dir, "embeddings")
    workdir = os.path.join("/tmp/qvss_dmlq",
                           sf_dir.strip("/").replace("/", "_"))
    shutil.rmtree(workdir, ignore_errors=True)
    idx = IVFIndex.build(emb, workdir, coarse_k=8, base_k=4)
    n0 = idx.read_corpus().count()
    rng = np.random.default_rng(7)
    d = len(idx.centroids[0])
    new_ids = list(range(10_000_000, 10_000_020))
    idx.insert(new_ids, rng.normal(size=(20, d)))
    dead = [int(x) for x in range(0, 10)]
    idx.delete(dead)
    maintain(idx)
    live = idx.read_corpus()
    n_live = live.count()
    checks = [
        ("deleted_absent",
         int(live.where(F.col(idx.id_col).isin(dead)).count())),
        ("dup_ids",
         int(live.groupBy(idx.id_col).count()
             .where(F.col("count") > 1).count())),
        ("inserted_present",
         int(live.where(F.col(idx.id_col).isin(new_ids)).count())),
        ("live_count_delta", int(n_live - n0)),            # +20 -10 = 10
        ("sizes_match_live", int(int(idx.sizes.sum()) == n_live)),
    ]
    return spark.createDataFrame(checks, ["invariant", "value"])


@register("knn_filtered", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.label % 2 = 0
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_filtered(spark, sf_dir):
    """Filtered (hybrid) search — a capability the reference lacks
    (SURVEY.md §2.2): kNN restricted by a relational predicate. In
    Spark this is just predicate-then-search: the filter reaches the
    parquet scan (PushedFilters) BEFORE any distance work, so
    selectivity directly cuts the scan — no post-filtering of an
    over-fetched candidate list like serving-time vector DBs do."""
    from quake_vector_search_spark.api import knn

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    filtered = emb.where(F.col("label") % 2 == 0)
    out = knn(filtered, queries, k=K)
    return out.withColumn("dist", F.round("dist", 6))


@register("knn_with_payload", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT r.query_id, r.vec_id, ROUND(r.dist, 6) AS dist,
       CAST(r.rank AS INT) AS rank, doc.lang, doc.source,
       CAST(doc.n_chars AS BIGINT) AS n_chars
FROM r JOIN documents doc ON doc.doc_id = r.vec_id
WHERE r.rank <= {K}
""")
def knn_with_payload(spark, sf_dir):
    """Retrieve-then-fetch (the RAG serving shape): kNN over the
    embedding index, then a broadcast join fetches each hit's document
    payload. The payload join touches only nq·k rows — never the
    corpus — so payload width is free at any scale."""
    from quake_vector_search_spark.api import knn

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "source", "n_chars")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    hits = knn(emb, queries, k=K).withColumn("dist", F.round("dist", 6))
    return hits.join(docs, hits.vec_id == docs.doc_id) \
               .select("query_id", "vec_id", "dist", "rank",
                       "lang", "source", "n_chars")


@register("knn_sq8_rerank", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_sq8_rerank(spark, sf_dir):
    """SQ8-quantized kNN with exact rerank (beyond-reference: §2.2
    lists quantization as absent). Scan happens on uint8 codes (4×
    less bandwidth at scale); 4× candidate oversampling + full-precision
    rerank recovers the exact answer — oracle IS brute force."""
    from quake_vector_search_spark.operators.quantization import knn_sq8

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = knn_sq8(emb, queries, k=K, oversample=4)
    return out.withColumn("dist", F.round("dist", 6))


@register("knn_pq_rerank", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_pq_rerank(spark, sf_dir):
    """Product-quantized kNN with ADC scan + exact rerank
    (beyond-reference: §2.2 lists PQ as absent). The scan reads m=8
    byte codes per vector — 32× less bandwidth than float32 at d=64 —
    scores them with per-query lookup tables, and reranks the
    oversampled candidates at full precision; oracle IS brute force."""
    from quake_vector_search_spark.operators.quantization import knn_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    # Oversample scales with corpus size (k·oversample ≈ n/2): a true
    # neighbor only needs to ADC-rank in the top HALF to survive into
    # the exact rerank, which has held at every sf tested — but PQ
    # gives no hard bound for any fixed candidate fraction, so this is
    # empirical robustness, not a guarantee. If a future sf ever
    # flakes the hash gate, knn_pq_recall_guard (extra_queries)
    # reports the per-query recall that makes the miss attributable.
    # The bandwidth economics are measured in bench.py, not here.
    n = emb.count()
    out = knn_pq(emb, queries, k=K, m=8, ksub=256,
                 oversample=max(16, -(-n // (2 * K))))
    return out.withColumn("dist", F.round("dist", 6))


@register("q_balanced_sample", sql="""
WITH counts AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
), m AS (
  SELECT MIN(n) AS min_n FROM counts
), ranked AS (
  SELECT vec_id, label,
         row_number() OVER (
           PARTITION BY label
           ORDER BY CAST(concat('0x', substr(md5(concat('43', ':',
                    CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT)
                    % 10000 ASC,
                    vec_id ASC) AS rk
  FROM embeddings
)
SELECT r.vec_id, r.label
FROM ranked r, m WHERE r.rk <= m.min_n
""")
def q_balanced_sample(spark, sf_dir):
    """Balanced class downsampling (training-pipeline): every label
    reduced to the minority-class count by portable-hash ranking —
    operators/sampling.py::balanced_downsample. Deterministic across
    engines/partitionings; one shuffle on the class key."""
    from quake_vector_search_spark.operators.sampling import (
        balanced_downsample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = balanced_downsample(emb, class_col="label", id_col="vec_id",
                              seed=43)
    return out.select("vec_id", "label")


_PQ_SIDECAR_CACHE: dict = {}


@register("ivf_pq_search_fullprobe", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def ivf_pq_search_fullprobe(spark, sf_dir):
    """IVF + PQ hybrid at target_recall=1.0: both pruning axes (APS
    row pruning × PQ byte pruning) composed — the codes sidecar is
    partition-pruned by the probe set, scanned via ADC lookup tables,
    and the oversampled candidates rerank at full precision. Full probe
    + rerank must equal brute force (the oracle)."""
    from quake_vector_search_spark.operators.quantization import (
        build_pq_sidecar,
        knn_ivf_pq,
    )

    idx = _ivf_index(spark, sf_dir)
    key = (sf_dir, idx.version)
    if key not in _PQ_SIDECAR_CACHE:
        _PQ_SIDECAR_CACHE[key] = build_pq_sidecar(idx, m=8, ksub=256,
                                                  seed=99)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    # corpus-scaled oversample: see knn_pq_rerank — empirically robust
    # at every sf tested (no hard PQ bound; misses are attributable
    # via knn_pq_recall_guard's per-query recall)
    n = emb.count()
    out, _meta = knn_ivf_pq(idx, queries, k=K, target_recall=1.0,
                            max_probe=1_000_000_000,
                            oversample=max(16, -(-n // (2 * K))),
                            books=_PQ_SIDECAR_CACHE[key])
    return out.withColumn("dist", F.round("dist", 6))


@register("knn_dot", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_inner_product(CAST(e.embedding AS DOUBLE[]),
                            CAST(q.qvec AS DOUBLE[])) AS score
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(score, 6) AS score,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_dot(spark, sf_dir):
    """Exact maximum-inner-product top-{K} (E14): the third retrieval
    metric next to L2 and cosine — unnormalized-embedding scoring."""
    from quake_vector_search_spark.operators.knn import dot_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = dot_topk(emb, queries, k=K)
    return out.withColumn("score", F.round("score", 6))


@register("emb_label_centroids", sql="""
SELECT e.label, g.i AS dim_pos,
       ROUND(AVG(CAST(e.embedding[g.i + 1] AS DOUBLE)), 6) AS centroid_val,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM embeddings e
CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
GROUP BY e.label, g.i
""")
def emb_label_centroids(spark, sf_dir):
    """Per-class embedding centroids (training-data analysis: class
    prototypes, drift monitoring, seeding clustering): posexplode the
    vector column and aggregate per (label, dimension). One shuffle on
    the (label, dim) key with map-side partial averages — at 100 TB
    the shuffle carries labels x 64 partial sums per task, not
    vectors. DuckDB oracle indexes each dimension via a generated
    series (1-based list indexing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.select("label",
                       F.posexplode("embedding").alias("dim_pos", "v"))
            .groupBy("label", "dim_pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6)
                  .alias("centroid_val"),
                 F.count("*").alias("n_vectors")))


@register("emb_nearest_centroid", sql="""
WITH cent AS (
  SELECT e.label, g.i AS dim_pos,
         AVG(CAST(e.embedding[g.i + 1] AS DOUBLE)) AS c
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
  GROUP BY e.label, g.i
), dims AS (
  SELECT e.vec_id, e.label AS true_label, g.i AS dim_pos,
         CAST(e.embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
), dists AS (
  SELECT d.vec_id, d.true_label, cent.label AS cand_label,
         SUM((d.v - cent.c) * (d.v - cent.c)) AS d2
  FROM dims d JOIN cent ON cent.dim_pos = d.dim_pos
  GROUP BY d.vec_id, d.true_label, cent.label
), ranked AS (
  SELECT vec_id, true_label, cand_label AS pred_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, cand_label ASC) AS rn
  FROM dists
), best AS (
  SELECT vec_id, true_label, pred_label FROM ranked WHERE rn = 1
)
SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
FROM best GROUP BY true_label, pred_label
""")
def emb_nearest_centroid(spark, sf_dir):
    """Nearest-centroid classification confusion matrix — the Rocchio
    inference shape, fully relational: centroids from one aggregate,
    per-(vector, candidate-label) distances from a dimension-position
    join, argmin via min_by with a (d2, label) tie-break, then the
    confusion rollup. No UDF, no driver loop; every stage is a keyed
    shuffle with map-side partials, so it scales to any corpus whose
    label x dim centroid table stays broadcastable (it always does).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("dim_pos", "v0")) \
        .withColumn("v", F.col("v0").cast("double")).drop("v0")
    cent = (dims.groupBy(F.col("true_label").alias("cand_label"),
                         "dim_pos")
            .agg(F.avg("v").alias("c")))
    diff = F.col("v") - F.col("c")
    dists = (dims.join(F.broadcast(cent), "dim_pos")
             .groupBy("vec_id", "true_label", "cand_label")
             .agg(F.sum(diff * diff).alias("d2")))
    best = (dists.groupBy("vec_id", "true_label")
            .agg(F.min_by("cand_label",
                          F.struct("d2", "cand_label")).alias("pred_label")))
    return (best.groupBy("true_label", "pred_label")
            .agg(F.count("*").alias("n")))
