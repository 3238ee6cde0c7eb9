"""Invariants for the training-pipeline QA operators: profiling,
gap-fill resample, balanced downsampling."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quake_vector_search_spark.operators.profiling import profile
from quake_vector_search_spark.operators.sampling import (
    balanced_downsample,
)
from quake_vector_search_spark.operators.timeseries import resample_ffill

# Fast-lane exclusion (round 10, VERDICT r9 #7): this module is
# end-to-end heavy; `pytest -m "not slow"` skips it.
pytestmark = pytest.mark.slow


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame([
        Row(a=1, b="x"), Row(a=1, b=None), Row(a=2, b="y"),
    ])
    got = {r.col_name: r for r in profile(df).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_null == 0
    assert got["a"].n_distinct == 2
    assert got["a"].min_value == "1" and got["a"].max_value == "2"
    assert got["b"].n_null == 1 and got["b"].n_distinct == 2


def test_resample_ffill_fills_gaps(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 0, 0, 30)
    df = spark.createDataFrame([
        # key 'a': events in bucket 0 and bucket 3 → buckets 1,2 filled
        Row(ts=base, event_type="a", value=1.0),
        Row(ts=base + dt.timedelta(minutes=45), event_type="a", value=2.0),
        Row(ts=base, event_type="b", value=5.0),
    ])
    out = resample_ffill(df, every_seconds=900)
    rows = {(r.event_type, r.bucket.minute): r for r in out.collect()}
    # full spine: 4 buckets (0,15,30,45 min) × 2 keys
    assert len(rows) == 8
    assert rows[("a", 0)].n == 1 and rows[("a", 0)].sum_value_ffill == 1.0
    assert rows[("a", 15)].n == 0 and rows[("a", 15)].sum_value_ffill == 1.0
    assert rows[("a", 45)].n == 1 and rows[("a", 45)].sum_value_ffill == 2.0
    # key b: only bucket 0 observed, value carried to the end
    assert rows[("b", 45)].n == 0 and rows[("b", 45)].sum_value_ffill == 5.0


def test_balanced_downsample_equalizes_classes(spark):
    rows = [Row(vec_id=i, label=0) for i in range(20)] + \
           [Row(vec_id=100 + i, label=1) for i in range(7)] + \
           [Row(vec_id=200 + i, label=2) for i in range(13)]
    df = spark.createDataFrame(rows)
    out = balanced_downsample(df, class_col="label", id_col="vec_id")
    counts = {r.label: r.n for r in
              out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 7, 1: 7, 2: 7}
    # deterministic: a second run keeps exactly the same rows
    ids1 = sorted(r.vec_id for r in out.collect())
    ids2 = sorted(r.vec_id for r in
                  balanced_downsample(df, class_col="label",
                                      id_col="vec_id").collect())
    assert ids1 == ids2


def test_connected_components_chain_and_singletons(spark):
    from quake_vector_search_spark.operators.dedup import (
        connected_components,
    )
    nodes = spark.createDataFrame([(i,) for i in range(7)], ["doc_id"])
    # chain 4-3, 3-2, 2-1 (diameter 3, needs multiple rounds); pair 5-6
    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (5, 6)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_connected_components_empty_pairs(spark):
    from quake_vector_search_spark.operators.dedup import (
        connected_components,
    )
    nodes = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 2}


def test_star_components_match_label_propagation(spark):
    """large-star/small-star must reach the same fixpoint as min-label
    propagation on a graph with a long chain (diameter stress — the
    case the star variant exists for), a triangle, and singletons."""
    import random

    from quake_vector_search_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    rng = random.Random(5)
    chain = [(i, i + 1) for i in range(10, 30)]          # diameter 20
    tri = [(100, 101), (101, 102), (102, 100)]
    rand = [(rng.randrange(200, 240), rng.randrange(200, 240))
            for _ in range(30)]
    pairs = spark.createDataFrame(chain + tri + rand,
                                  ["doc_a", "doc_b"])
    node_ids = sorted({x for p in chain + tri + rand for x in p}
                      | {0, 1})                           # singletons
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    ref = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    got = {r.doc_id: r.cluster_id
           for r in connected_components_star(nodes, pairs).collect()}
    assert got == ref
    assert got[29] == 10 and got[0] == 0


def test_star_components_empty_pairs(spark):
    from quake_vector_search_spark.operators.dedup import (
        connected_components_star,
    )
    nodes = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in connected_components_star(nodes, pairs).collect()}
    assert got == {1: 1, 2: 2}


def test_cms_estimates_dominate_true_counts(spark):
    """Count-min guarantee: est ≥ true count for EVERY item, with
    equality when an item's row has no collisions; estimates are
    deterministic across reruns."""
    from quake_vector_search_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )
    rows = [(f"w{i % 50}",) for i in range(1000)] + [("rare",)]
    items = spark.createDataFrame(rows, ["item"])
    sk = cms_sketch(items, "item", depth=4, width=64)
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(sk, items, "item",
                                 depth=4, width=64).collect()}
    true = {r["item"]: r["n"]
            for r in items.groupBy("item")
            .agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(true)
    assert all(est[w] >= true[w] for w in true)
    # total sketch mass per row equals the stream length
    per_row = (sk.groupBy("j").agg(F.sum("c").alias("s")).collect())
    assert all(r["s"] == len(rows) for r in per_row)
    est2 = {r["item"]: r["est_count"]
            for r in cms_estimate(sk, items, "item",
                                  depth=4, width=64).collect()}
    assert est2 == est


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from quake_vector_search_spark.operators.sampling import (
        weighted_sample,
    )
    rows = ([(i, 1e-6) for i in range(100)]
            + [(1000 + i, 1e6) for i in range(5)])
    df = spark.createDataFrame(rows, ["id", "w"])
    got = weighted_sample(df, "w", n=5, id_col="id", seed=9)
    ids = sorted(r["id"] for r in got.collect())
    # the 5 heavy rows dominate: P(light row wins) ~ 1e-12 per draw
    assert ids == [1000, 1001, 1002, 1003, 1004]
    again = sorted(r["id"]
                   for r in weighted_sample(df, "w", n=5, id_col="id",
                                            seed=9).collect())
    assert again == ids
    # without-replacement: n distinct rows even when weights tie
    uni = spark.createDataFrame([(i, 1.0) for i in range(50)],
                                ["id", "w"])
    samp = [r["id"] for r in
            weighted_sample(uni, "w", n=10, id_col="id",
                            seed=3).collect()]
    assert len(samp) == len(set(samp)) == 10


def test_packing_invariants(spark):
    """Prefix-sum packing: offsets are consistent (offset = pre-cumsum
    mod capacity), every non-tail bin's token mass deviates from
    capacity by less than the largest document, and assignment is a
    pure function of the input."""
    from quake_vector_search_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )
    rows = [(i, "tok " * (5 + (i * 7) % 40)) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cap = 100
    packed = pack_documents(docs, capacity=cap, n_shards=4)
    rs = packed.collect()
    assert len(rs) == 200
    max_doc = max(r["n_tokens"] for r in rs)
    # per (shard, bin): recompute tape positions and check offsets
    by_shard = {}
    for r in sorted(rs, key=lambda r: (r["shard"], r["doc_id"])):
        pre = by_shard.get(r["shard"], 0)
        assert r["bin"] == pre // cap, r
        assert r["bin_start_offset"] == pre % cap, r
        by_shard[r["shard"]] = pre + r["n_tokens"]
    stats = packing_stats(packed, cap).collect()
    last_bin = {r["shard"]: max(s["bin"] for s in stats
                                if s["shard"] == r["shard"])
                for r in stats}
    for s in stats:
        if s["bin"] != last_bin[s["shard"]]:
            assert abs(s["tokens"] - cap) < max_doc, s
    again = sorted((r["doc_id"], r["shard"], r["bin"])
                   for r in pack_documents(docs, capacity=cap,
                                           n_shards=4).collect())
    assert again == sorted((r["doc_id"], r["shard"], r["bin"])
                           for r in rs)


def test_kmv_estimate_accuracy_and_determinism(spark):
    """KMV: exact when distinct < k; within ~3/sqrt(k) relative error
    when distinct >> k; deterministic across partitionings."""
    from quake_vector_search_spark.operators.sketch import kmv_distinct

    small = spark.createDataFrame([(i % 100,) for i in range(5000)],
                                  ["x"])
    r = kmv_distinct(small, "x", k=256).collect()[0]
    assert r["est_distinct"] == 100.0 and r["n_kept"] == 100

    big = spark.createDataFrame([(i,) for i in range(20000)], ["x"])
    r1 = kmv_distinct(big, "x", k=256).collect()[0]
    assert abs(r1["est_distinct"] - 20000) / 20000 < 3 / (256 ** 0.5)
    r2 = kmv_distinct(big.repartition(13), "x", k=256).collect()[0]
    assert (r2["est_distinct"], r2["kth_min_hash"]) == \
        (r1["est_distinct"], r1["kth_min_hash"])


def test_stratified_sample_rate_and_determinism(spark):
    from quake_vector_search_spark.operators.sampling import (
        stratified_sample,
    )
    rows = [(i, "A" if i % 3 else "B") for i in range(9000)]
    df = spark.createDataFrame(rows, ["id", "cls"])
    s = stratified_sample(df, "cls", 0.2, id_col="id", seed=5)
    got = s.groupBy("cls").count().collect()
    by = {r["cls"]: r["count"] for r in got}
    # each stratum sampled near 20% (hash-uniform, +-3% slack)
    assert abs(by["A"] / 6000 - 0.2) < 0.03
    assert abs(by["B"] / 3000 - 0.2) < 0.03
    again = {tuple(r) for r in stratified_sample(
        df.repartition(7), "cls", 0.2, id_col="id", seed=5).collect()}
    assert again == {tuple(r) for r in s.collect()}
    # narrow: no exchange in the plan
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        stratified_sample(df, "cls", 0.2, id_col="id").explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_cms_estimate_zero_for_untouched_candidate(spark):
    """A candidate absent from the sketched stream must estimate 0 when
    all its cells are empty (standard CMS semantics) — the left-join +
    coalesce path; an inner join would drop or overestimate it."""
    from quake_vector_search_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )
    items = spark.createDataFrame([("a",), ("a",), ("b",)], ["item"])
    sk = cms_sketch(items, "item", depth=4, width=4096)
    cands = spark.createDataFrame(
        [("a",), ("zz_never_seen",)], ["item"])
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(sk, cands, "item",
                                 depth=4, width=4096).collect()}
    assert set(est) == {"a", "zz_never_seen"}     # nothing dropped
    assert est["a"] >= 2
    assert est["zz_never_seen"] == 0              # width 4096, 2 keys: no collision


def test_salted_join_rejects_right_full(spark):
    from quake_vector_search_spark.operators.sampling import salted_join
    l = spark.createDataFrame([(1, "x")], ["k", "v"])
    r = spark.createDataFrame([(1, "y")], ["k", "w"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(l, r, "k", n_salt=4, how=how)
    assert salted_join(l, r, "k", n_salt=4, how="inner").count() == 1


def test_fuzzy_hamming_join_matches_bruteforce(spark):
    """Pigeonhole blocking must be lossless: blocked output == n²
    definition on a corpus with engineered near-matches."""
    from quake_vector_search_spark.operators.fuzzy import fuzzy_hamming_join
    rows = [(1, "red small widget"), (2, "red large widget"),
            (3, "blue small widget"), (4, "red small widget"),
            (5, "red small bolt ex"), (6, "green tiny ring"),
            (7, "red tiny widget")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {(r["id_a"], r["id_b"]): r["n_diff"]
           for r in fuzzy_hamming_join(df, "id", "name").collect()}
    want = {}
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1:]:
            wa, wb = na.split(" "), nb.split(" ")
            if len(wa) != len(wb):
                continue
            d = sum(1 for x, y in zip(wa, wb) if x != y)
            if d <= 1:
                want[(ia, ib)] = d
    assert got == want
    assert (1, 2) in got and got[(1, 4)] == 0 and (1, 3) in got


def test_fuzzy_hamming_join_short_strings(spark):
    """Strings with n_tokens <= max_hamming have empty chunks; their
    only agreeing chunk may be the empty one, which must stay joinable
    (regression: the empty-key filter silently dropped these pairs)."""
    from quake_vector_search_spark.operators.fuzzy import fuzzy_hamming_join
    rows = [(1, "alpha"), (2, "beta"), (3, "alpha"),
            (4, "two words"), (5, "two wards")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {(r["id_a"], r["id_b"]): r["n_diff"]
           for r in fuzzy_hamming_join(df, "id", "name",
                                       max_hamming=1).collect()}
    # every single-token pair is within distance 1; (4,5) differs in 1
    want = {(1, 2): 1, (1, 3): 0, (2, 3): 1, (4, 5): 1}
    assert got == want


def test_cluster_blocked_cosine_pairs_kmeans(spark):
    """SemDeDup recipe with real k-means cells: blocked pairs must
    equal the exhaustive pairs restricted to same-cluster, and the
    plan must be an equi-join on the cluster key (no cartesian)."""
    from quake_vector_search_spark.operators.dedup import (
        cluster_blocked_cosine_pairs,
        cosine_pairs_exhaustive,
    )
    from quake_vector_search_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from quake_vector_search_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_fit(emb, k=4, iters=4, seed=5)
    clustered = assign_clusters(emb, cents, out_col="cell")
    got = cluster_blocked_cosine_pairs(clustered, threshold=0.3,
                                       cluster_col="cell")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    cell_of = {r["vec_id"]: r["cell"]
               for r in clustered.select("vec_id", "cell").collect()}
    want = {(r["id_a"], r["id_b"]): round(r["cosine"], 6)
            for r in cosine_pairs_exhaustive(emb, threshold=0.3).collect()
            if cell_of[r["id_a"]] == cell_of[r["id_b"]]}
    gotd = {(r["id_a"], r["id_b"]): round(r["cosine"], 6)
            for r in got.collect()}
    assert gotd == want and len(gotd) > 0


def test_mixture_sample_quotas_and_determinism(spark):
    """Largest-remainder quotas, shortfall sources contribute all
    rows, unlisted sources drop, and the kept set is rerun-stable."""
    from quake_vector_search_spark.operators.sampling import (
        mixture_sample,
    )
    rows = ([(i, "a") for i in range(100)]
            + [(100 + i, "b") for i in range(100)]
            + [(200 + i, "tiny") for i in range(3)]
            + [(300 + i, "unlisted") for i in range(50)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture_sample(df, {"a": 2.0, "b": 1.0, "tiny": 1.0},
                         n_total=41, id_col="doc_id",
                         source_col="source")
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    # exact shares: a=20.5, b=10.25, tiny=10.25 -> floors 20/10/10,
    # leftover 1 goes to the largest remainder (a)
    assert counts["a"] == 21 and counts["b"] == 10
    assert counts["tiny"] == 3          # only 3 rows exist (shortfall)
    assert "unlisted" not in counts
    again = mixture_sample(df, {"a": 2.0, "b": 1.0, "tiny": 1.0},
                           n_total=41, id_col="doc_id",
                           source_col="source")
    assert (sorted(r["doc_id"] for r in out.collect())
            == sorted(r["doc_id"] for r in again.collect()))


def test_hard_negatives_excludes_same_label(spark):
    """Every mined negative must carry a label different from its
    query's, ranks must be exactly 1..k, and the result must equal the
    brute-force definition (nearest label-mismatched vectors)."""
    from quake_vector_search_spark.operators.knn import hard_negatives
    from quake_vector_search_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .withColumnRenamed("vec_id", "query_id"))
    out = hard_negatives(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    qlab = {r["query_id"]: r["label"] for r in
            queries.select("query_id", "label").collect()}
    lab = {r["vec_id"]: r["label"] for r in
           emb.select("vec_id", "label").collect()}
    for r in rows:
        assert lab[r["vec_id"]] != qlab[r["query_id"]]
    for q in qlab:
        assert sorted(r["rank"] for r in rows
                      if r["query_id"] == q) == [1, 2, 3, 4, 5]


def test_psi_drift_identical_and_shifted(spark):
    """PSI of a distribution against itself is ~0; against a shifted
    copy it is large; bucket counts conserve rows."""
    from quake_vector_search_spark.operators.profiling import psi_drift

    base = spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("v"))
    same = psi_drift(base, base, "v", n_buckets=10)
    assert abs(sum(r["psi_term"] for r in same.collect())) < 1e-12
    shifted = base.select((F.col("v") + 50).alias("v"))
    drift = psi_drift(base, shifted, "v", n_buckets=10)
    rows = drift.collect()
    assert sum(r["psi_term"] for r in rows) > 0.25   # major drift
    assert sum(r["n_ref"] for r in rows) == 1000
    assert sum(r["n_cur"] for r in rows) == 1000     # edge-clamped, not lost


def test_cosine_pairs_lsh_derives_dim(spark):
    """dim is derived from the data (no 64 hardcode): a 5-dim corpus
    must produce real pairs, and an explicit wrong dim must raise
    instead of silently returning zero pairs."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from quake_vector_search_spark.operators.dedup import (
        cosine_pairs_exhaustive,
        cosine_pairs_lsh,
    )
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 5))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1,
                     [float(x) for x in v + rng.normal(scale=1e-3,
                                                       size=5)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"])
           for r in cosine_pairs_lsh(emb, threshold=0.999).collect()}
    want = {(r["id_a"], r["id_b"])
            for r in cosine_pairs_exhaustive(emb, threshold=0.999).collect()}
    # LSH recall: every emitted pair is a true pair; the engineered
    # near-identical twins collide in every band, so all are found
    assert got == want
    assert {(2 * i, 2 * i + 1) for i in range(6)} <= got
    with pytest.raises(Exception) as ei:
        cosine_pairs_lsh(emb, threshold=0.9, dim=64).collect()
    assert "vector width" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError)


def test_cosine_pairs_lsh_null_vector_handling(spark):
    """dim inference must skip NULL vectors (F.size(NULL) = -1 would
    poison the width check); an all-NULL column raises a clear error
    instead of a confusing per-row width mismatch (round-5 ADVICE)."""
    import pytest

    from quake_vector_search_spark.operators.dedup import cosine_pairs_lsh

    schema = "vec_id long, embedding array<float>"
    # NULL-first input: dim must come from the later non-null rows
    mixed = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 0.0]), (2, [1.0, 1e-4, 0.0])], schema)
    pairs = cosine_pairs_lsh(mixed, threshold=0.999).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    # all-NULL input: clear driver-side error, not raise_error noise
    allnull = spark.createDataFrame([(0, None), (1, None)], schema)
    with pytest.raises(ValueError, match="NULL"):
        cosine_pairs_lsh(allnull, threshold=0.9)
    # empty input stays trivially empty
    empty = spark.createDataFrame([], schema)
    assert cosine_pairs_lsh(empty, threshold=0.9).count() == 0


def test_semantic_dedup_blas_twin_matches_relational(spark):
    """The BLAS assignment twin (operators/dedup.py::
    semantic_dedup_pairs) must produce the exact pair set of the
    registered relational pipeline (dedup_semantic_clustered) — same
    centroids, same argmin tie-break, measured margins far above
    kernel float noise."""
    from quake_vector_search_spark.operators.dedup import (
        semantic_dedup_pairs,
    )
    from quake_vector_search_spark.queries import (
        REGISTRY,
        load_all_query_modules,
    )
    from quake_vector_search_spark.sources import load_table

    load_all_query_modules()
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    blas = {(r["id_a"], r["id_b"], r["cluster_id"])
            for r in semantic_dedup_pairs(emb, threshold=0.45).collect()}
    rel = {(r["id_a"], r["id_b"], r["cluster_id"])
           for r in REGISTRY["dedup_semantic_clustered"]
           .fn(spark, sf).collect()}
    assert blas == rel
    assert len(blas) > 0


def test_api_round5_facade(spark):
    """Round-5 api surface: sparse_search (bm25 + tfidf), knn_graph
    strategies agree, quality_signals one-row-per-doc with all
    component columns, membership_filter keeps every true member."""
    from quake_vector_search_spark import api
    from quake_vector_search_spark.operators.sparse import (
        _terms,
        tfidf_vectors,
    )
    from quake_vector_search_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    queries = (_terms(docs.where(F.col("doc_id") < 2), "doc_id", "text")
               .distinct()
               .select(F.col("doc_id").alias("query_id"), "term"))
    bm = api.sparse_search(docs, queries, k=5, method="bm25")
    assert bm.columns == ["query_id", "doc_id", "score", "rank"]
    assert bm.where("rank = 1").count() == 2
    # a document retrieves itself highly (not necessarily rank 1:
    # BM25 length normalization can put a shorter doc containing the
    # same terms above the source doc), and scores are non-increasing
    rows = sorted(map(tuple, bm.collect()))
    by_q = {}
    for qid, did, score, rank in rows:
        by_q.setdefault(qid, []).append((rank, did, score))
    for qid, hits in by_q.items():
        hits.sort()
        assert qid in [d for _, d, _ in hits], f"doc {qid} not in own top-5"
        scores = [s for _, _, s in hits]
        assert scores == sorted(scores, reverse=True)
    tf = api.sparse_search(tfidf_vectors(docs), queries, k=5,
                           method="tfidf")
    assert tf.where("rank = 1").count() == 2

    emb = load_table(spark, sf, "embeddings")
    key = ["src", "dst", "rank"]
    g1 = {tuple(r) for r in
          api.knn_graph(emb, k=3).select(*key).collect()}
    g2 = {tuple(r) for r in
          api.knn_graph(emb, k=3, strategy="relational")
          .select(*key).collect()}
    assert g1 == g2 and len(g1) > 0

    qs = api.quality_signals(docs)
    assert qs.count() == docs.count()
    for c in ("n_tokens", "alpha_ratio", "dup_frac", "pred_lang"):
        assert c in qs.columns, c

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    kept = api.membership_filter(customer, "c_custkey",
                                 orders, "o_custkey")
    with_orders = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey", "left_semi")
    assert kept.count() >= with_orders.count()
    assert with_orders.join(kept.select("c_custkey"), "c_custkey",
                            "left_anti").count() == 0


def test_knn_graph_blas_twin_matches_relational(spark):
    """knn_graph_blocked_blas (grouped-map BLAS) must produce the
    exact edge set of the relational window form — same tie-break,
    same blocks; dist compared after round(6) (x²+y²−2xyᵀ vs
    Σ(x−y)² differ only in float noise)."""
    from quake_vector_search_spark.operators.knn import (
        knn_graph_blocked,
        knn_graph_blocked_blas,
    )
    from quake_vector_search_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    key = ["src", "dst", "block", "rank"]
    rel = knn_graph_blocked(emb, k=5)
    blas = knn_graph_blocked_blas(emb, k=5)
    rset = {tuple(r) for r in rel.select(*key).collect()}
    bset = {tuple(r) for r in blas.select(*key).collect()}
    assert rset == bset
    rd = {(r["src"], r["dst"]): round(r["dist"], 6)
          for r in rel.collect()}
    bd = {(r["src"], r["dst"]): round(r["dist"], 6)
          for r in blas.collect()}
    assert rd == bd


def test_bloom_never_false_negative(spark):
    """Bloom property (hypothesis, SURVEY §5.2 style): for ANY member
    set, every member probes maybe_present=True — false negatives are
    structurally impossible; non-members may false-positive (that's
    the m/k trade, not a bug)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from quake_vector_search_spark.operators.sketch import (
        bloom_bits,
        bloom_membership,
    )

    @settings(max_examples=5, deadline=None)
    @given(members=st.sets(st.integers(0, 10_000), min_size=1,
                           max_size=50),
           probes=st.sets(st.integers(0, 10_000), max_size=50))
    def check(members, probes):
        mdf = spark.createDataFrame([(int(x),) for x in members],
                                    "item long")
        pdf = spark.createDataFrame(
            [(int(x),) for x in members | probes], "item long")
        bits = bloom_bits(mdf, "item", m=512, k=3)
        flags = {r["item"]: r["maybe_present"] for r in
                 bloom_membership(bits, pdf, "item", m=512, k=3)
                 .collect()}
        for x in members:
            assert flags[int(x)], f"false negative for member {x}"

    check()


def test_repetition_stats_exact_cases(spark):
    """Deterministic repetition cases: an all-identical-words doc has
    1 distinct 3-gram (dup_frac = (T-1)/T); an all-unique-words doc
    has zero repeats; docs shorter than n report T=0, dup_frac=0."""
    from quake_vector_search_spark.operators.text import repetition_stats

    rows = [(0, " ".join(["spam"] * 10)),          # 8 grams, 1 distinct
            (1, " ".join(f"w{i}" for i in range(10))),  # unique
            (2, "too short")]                       # < 3 words
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_grams"] == 8 and got[0]["n_distinct"] == 1
    assert abs(got[0]["dup_frac"] - round(7 / 8, 6)) < 1e-9
    assert got[1]["n_grams"] == 8 and got[1]["dup_frac"] == 0.0
    assert got[2]["n_grams"] == 0 and got[2]["dup_frac"] == 0.0


def test_bq_encode_packs_sign_bits(spark):
    """Binary quantization: code words must be the exact sign
    bit-pattern (bit i of word w = vec[64w+i] >= 0), including the
    signed-long wrap when bit 63 is set, and dims beyond 64 spill into
    the next word."""
    from quake_vector_search_spark.operators.quantization import (
        bq_encode,
        knn_bq,
    )

    # 64-dim: all non-negative → all 64 bits set → -1 as signed long
    v_all = [1.0] * 64
    # bit 0 and bit 63 only
    v_ends = [1.0] + [-1.0] * 62 + [0.0]   # >= 0 rule: 0.0 sets the bit
    # 70-dim: second word holds bits 64..69
    v_spill = [-1.0] * 64 + [1.0] * 6
    df64 = spark.createDataFrame(
        [(0, v_all), (1, v_ends)], "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["bq_code"])
           for r in bq_encode(df64).collect()}
    assert got[0] == [-1]
    assert got[1] == [1 + (1 << 63) - (1 << 64)]   # bit0 + bit63, signed
    df70 = spark.createDataFrame(
        [(0, v_spill)], "vec_id long, embedding array<float>")
    [r] = bq_encode(df70).collect()
    assert list(r["bq_code"]) == [0, 0b111111]

    # end-to-end: BQ + corpus-scaled rerank equals brute force
    from quake_vector_search_spark.operators.knn import knn_bruteforce
    from quake_vector_search_spark.sources import load_table
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = (emb.where(F.col("vec_id") < 3)
          .withColumnRenamed("vec_id", "query_id"))
    n = emb.count()
    bq = knn_bq(emb, qs, k=5, oversample=max(16, -(-n // 10)))
    bf = knn_bruteforce(emb, qs, k=5)
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, bq.select(*key).collect())) == \
           sorted(map(tuple, bf.select(*key).collect()))


def test_psi_drift_empty_reference_raises(spark):
    """An empty (or all-NULL) reference snapshot cannot supply bucket
    edges: psi_drift must raise a clear ValueError, not crash with
    float(None) (round-5 ADVICE)."""
    import pytest

    from quake_vector_search_spark.operators.profiling import psi_drift

    cur = spark.range(10).select(F.col("id").cast("double").alias("v"))
    empty = cur.where("v < 0")
    with pytest.raises(ValueError, match="reference"):
        psi_drift(empty, cur, "v")
    # explicit edges still work with an empty reference
    rows = psi_drift(empty, cur, "v", lo=0.0, hi=10.0).collect()
    assert sum(r["n_cur"] for r in rows) == 10


def test_cosine_pairs_lsh_pandas_column_twins_agree(spark):
    """Round 6: the vectorized (NumPy matmul) signature kernel and the
    Column-expression twin must emit IDENTICAL pair sets — same
    hyperplanes, same banding, near-zero dots resolved by the same
    sequential fold."""
    from quake_vector_search_spark.operators.dedup import cosine_pairs_lsh

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(100 + i, [float(x) for x in base[i] +
                        rng.normal(scale=1e-3, size=16)])
             for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got_p = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
             for r in cosine_pairs_lsh(emb, threshold=0.45,
                                       impl="pandas").collect()}
    got_c = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
             for r in cosine_pairs_lsh(emb, threshold=0.45,
                                       impl="column").collect()}
    assert got_p == got_c
    assert len(got_p) >= 20  # the engineered twins collide


def test_cosine_pairs_lsh_bucket_cap(spark):
    """max_bucket_size drops only hot (band, key) buckets from
    candidate generation; a pair that collides in a small bucket of
    any other band still surfaces (the max_shingle_df analogue)."""
    from quake_vector_search_spark.operators.dedup import cosine_pairs_lsh

    rng = np.random.default_rng(17)
    base = rng.normal(size=(30, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(100 + i, [float(x) for x in base[i] +
                        rng.normal(scale=1e-4, size=8)])
             for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = {(r["id_a"], r["id_b"])
                for r in cosine_pairs_lsh(emb, threshold=0.999).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in cosine_pairs_lsh(emb, threshold=0.999,
                                        max_bucket_size=5).collect()}
    # capping never invents pairs, and near-identical twins (which
    # collide in EVERY band, so any small bucket suffices) survive
    assert capped <= uncapped
    assert {(i, 100 + i) for i in range(10)} <= capped
    # cap=1 kills all candidate generation
    assert cosine_pairs_lsh(emb, threshold=0.999,
                            max_bucket_size=1).count() == 0


def test_semantic_decontaminate_flags(spark):
    """Self-members flag at cosine 1.0; orthogonal rows don't; null
    vectors pass through unflagged; empty eval flags nothing."""
    from quake_vector_search_spark.operators.dedup import (
        semantic_decontaminate_flags,
    )

    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
            (2, [0.96, 0.28, 0.0]), (3, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = emb.where("vec_id = 0")
    got = {r["vec_id"]: (round(r["max_eval_cosine"], 6),
                         r["contaminated"])
           for r in semantic_decontaminate_flags(emb, ev,
                                                 threshold=0.9).collect()}
    assert got[0] == (1.0, True)
    assert got[1] == (0.0, False)
    assert got[2][1] is True and 0.95 < got[2][0] < 0.97
    assert got[3] == (0.0, False)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semantic_decontaminate_flags(emb, empty, threshold=0.5).collect()
    assert all(not r["contaminated"] for r in out) and len(out) == 4


def test_cosine_pairs_lsh_empty_arrow_batches(spark):
    """ADVICE r6: the pandas band_keys UDF must tolerate zero-row
    Arrow batches (empty partitions after a wide repartition) — the
    np.stack over an empty array list would raise otherwise."""
    from quake_vector_search_spark.operators.dedup import cosine_pairs_lsh

    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 1e-4, 0.0])]
    emb = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
           .repartition(16))
    pairs = cosine_pairs_lsh(emb, threshold=0.999).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}


def test_lsh_index_build_query_extend(spark, tmp_path):
    """Persisted incremental near-dup index lifecycle: (1) query
    answers EQUAL the in-memory minhash_lsh_pairs operator restricted
    to cross-side pairs (same banding + exact-Jaccard arithmetic);
    (2) extend() appends a batch so the NEXT batch's dups against it
    are caught without any rebuild; (3) id_col mismatch refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from quake_vector_search_spark.operators.dedup_index import (
        build_lsh_index,
        extend_lsh_index,
        query_lsh_index,
    )

    base = ("the quick brown fox jumps over the lazy dog "
            "while the cat watches from the warm windowsill")
    rows = []
    for i in range(20):
        # even ids: corpus; odd ids: batch. Make odd 2i+1 a near-dup
        # of even 2i for i < 5, distinct otherwise.
        rows.append((2 * i, f"{base} corpus variant {i} " * 2))
        if i < 5:
            rows.append((2 * i + 1, f"{base} corpus variant {i} "
                                    f"{base} corpus variant {i} edited"))
        else:
            rows.append((2 * i + 1,
                         f"completely different text number {i} "
                         f"about topic {i} with unique words w{i}a "
                         f"w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)

    path = str(tmp_path / "lsh_index")
    build_lsh_index(corpus, path)
    got = {(r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
           for r in query_lsh_index(spark, path, batch,
                                    threshold=0.5).collect()}
    # oracle: in-memory operator over the union, cross-side pairs only
    want = {(max(r["doc_a"], r["doc_b"]) if r["doc_a"] % 2 == 0
             else r["doc_a"],
             min(r["doc_a"], r["doc_b"]) if r["doc_a"] % 2 == 0
             else r["doc_b"],
             round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
            if r["doc_a"] % 2 != r["doc_b"] % 2}
    assert got == want and got  # non-empty: the 5 planted pairs found

    # extend with the batch; a later doc duplicating an ODD (appended)
    # doc must now be flagged against it
    extend_lsh_index(path, batch)
    later = spark.createDataFrame(
        [(1001, f"{base} corpus variant 3 "
                f"{base} corpus variant 3 edited")],
        "doc_id long, text string")
    hits = {r["corpus_id"]
            for r in query_lsh_index(spark, path, later,
                                     threshold=0.9).collect()}
    assert 7 in hits  # doc 7 (= 2*3+1) entered the index via extend

    with _pytest.raises(ValueError, match="id_col"):
        extend_lsh_index(path, later, id_col="other_id")


def test_lsh_index_remove_readmit_compact(spark, tmp_path):
    """CDC delete on the persisted near-dup index: (1) remove hides a
    member from queries (tombstone only — member files untouched);
    (2) a later extend of the same id RE-ADMITS it (epoch visibility:
    the re-extended row outlives the tombstone); (3) compaction
    physically drops dead rows + clears tombstones and changes NO
    answers; (4) a pre-epoch index (no epoch column, no tombstones)
    still queries — backward compatible."""
    import os

    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.dedup_index import (
        build_lsh_index,
        compact_lsh_index,
        extend_lsh_index,
        query_lsh_index,
        remove_from_lsh_index,
    )

    base = ("the quick brown fox jumps over the lazy dog "
            "while the cat watches from the warm windowsill")
    rows = []
    for i in range(8):
        rows.append((2 * i, f"{base} corpus variant {i} " * 2))
        rows.append((2 * i + 1, f"{base} corpus variant {i} "
                                f"{base} corpus variant {i} edited"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lsh_dml")
    build_lsh_index(corpus, path)

    def hits():
        return {(r["new_id"], r["corpus_id"]) for r in
                query_lsh_index(spark, path, batch,
                                threshold=0.5).collect()}

    before = hits()
    assert (1, 0) in before and (5, 4) in before
    # remove two members; their pairs disappear, others unaffected
    remove_from_lsh_index(spark, path, [0, 4])
    after_rm = hits()
    assert after_rm == {p for p in before if p[1] not in (0, 4)}
    # re-admit id 0 (same text): its pair comes back; 4 stays dead
    extend_lsh_index(path, corpus.where(F.col("doc_id") == 0))
    after_readd = hits()
    assert after_readd == {p for p in before if p[1] != 4}
    # compact: answers identical, tombstones gone, dead rows dropped
    stats = compact_lsh_index(spark, path)
    assert stats["dropped"] == 2       # dead id 4 + dead old row of 0
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    assert hits() == after_readd
    # removing after compact still works (epoch monotonicity survives)
    remove_from_lsh_index(spark, path, [0])
    assert hits() == {p for p in before if p[1] not in (0, 4)}

    # backward compat: strip the epoch column + meta key to fake a
    # pre-epoch index; queries still run (epoch read as 0)
    import json
    legacy = str(tmp_path / "lsh_legacy")
    build_lsh_index(corpus, legacy)
    sh = (spark.read.parquet(os.path.join(legacy, "shingles"))
          .drop("epoch"))
    sh.write.mode("overwrite").parquet(os.path.join(legacy, "sh2"))
    import shutil
    shutil.rmtree(os.path.join(legacy, "shingles"))
    os.replace(os.path.join(legacy, "sh2"),
               os.path.join(legacy, "shingles"))
    meta_p = os.path.join(legacy, "meta.json")
    meta = json.load(open(meta_p))
    meta.pop("epoch")
    json.dump(meta, open(meta_p, "w"))
    got = {(r["new_id"], r["corpus_id"]) for r in
           query_lsh_index(spark, legacy, batch,
                           threshold=0.5).collect()}
    assert got == before


def test_bm25_index_multi_extend_equals_oneshot(spark, tmp_path):
    """Persisted BM25 index: build on one batch, extend TWICE, query
    — scores and ranks must EXACTLY equal the one-shot bm25_topk over
    the union (stat-merge arithmetic: df partials sum, N/avg_len
    counters stay exact across batches; an empty-text doc counts in N
    but not in avg_len, in both paths)."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.sparse import (
        _terms,
        bm25_topk,
    )
    from quake_vector_search_spark.operators.sparse_index import (
        build_bm25_index,
        extend_bm25_index,
        query_bm25_index,
    )

    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(30):
        txt = " ".join(words[(i + j) % len(words)]
                       for j in range(3 + i % 4))
        rows.append((i, txt))
    rows.append((30, ""))  # empty doc: in N, not in avg_len
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "bm25_idx")
    build_bm25_index(docs.where(F.col("doc_id") % 3 == 0), path)
    extend_bm25_index(path, docs.where(F.col("doc_id") % 3 == 1))
    extend_bm25_index(path, docs.where(F.col("doc_id") % 3 == 2))

    queries = (_terms(docs.where(F.col("doc_id") < 3),
                      "doc_id", "text").distinct()
               .select(F.col("doc_id").alias("query_id"), "term"))
    got = {(r["query_id"], r["doc_id"], r["score"], r["rank"])
           for r in query_bm25_index(spark, path, queries,
                                     k=5).collect()}
    want = {(r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(docs, queries, k=5).collect()}
    assert got == want and got


def test_bm25_index_remove_then_readmit(spark, tmp_path):
    """BM25 index CDC loop: remove docs (tombstone + negative
    partials) -> scores equal an index never containing them; EXTEND
    one of the removed ids back after compact -> it scores again
    (remove/compact fully forget the doc, so re-admission is a plain
    extend); counters stay exact through the whole sequence."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.sparse import _terms
    from quake_vector_search_spark.operators.sparse_index import (
        _load_meta,
        build_bm25_index,
        compact_bm25_index,
        extend_bm25_index,
        query_bm25_index,
        remove_from_bm25_index,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [(i, " ".join(words[(i + j) % len(words)]
                         for j in range(3 + i % 4)))
            for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25_dml")
    build_bm25_index(docs, path)
    queries = (_terms(docs.where(F.col("doc_id") < 2), "doc_id",
                      "text").distinct()
               .select(F.col("doc_id").alias("query_id"), "term"))

    def answers():
        return {tuple(r) for r in
                query_bm25_index(spark, path, queries, k=8).collect()}

    # oracle: an index built on the even half only
    ref_path = str(tmp_path / "bm25_ref")
    build_bm25_index(docs.where(F.col("doc_id") % 2 == 0), ref_path)
    want = {tuple(r) for r in
            query_bm25_index(spark, ref_path, queries, k=8).collect()}

    remove_from_bm25_index(
        spark, path, docs.where(F.col("doc_id") % 2 == 1)
        .select("doc_id"))
    assert answers() == want                       # tombstone path
    stats = compact_bm25_index(spark, path)
    assert stats["dropped"] > 0
    assert answers() == want                       # compacted path
    m = _load_meta(path)
    mr = _load_meta(ref_path)
    assert (m["n_docs"], m["n_len_docs"], m["total_len"]) == \
           (mr["n_docs"], mr["n_len_docs"], mr["total_len"])
    # re-admit doc 1 after compact: plain extend, scores reappear
    extend_bm25_index(path, docs.where(F.col("doc_id") == 1))
    readd = answers()
    assert any(r[1] == 1 for r in readd)


def test_index_rebuild_clears_stale_tombstones(spark, tmp_path):
    """Rebuilding either persisted index at the same path must not
    inherit the previous index's tombstones (review finding): a stale
    tombstone would silently hide freshly-indexed members — LSH via
    the epoch rule (rebuilt epoch-0 rows read dead against a
    higher-epoch tombstone), BM25 via the anti-join (docs hidden yet
    still counted in the fresh stats)."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.dedup_index import (
        build_lsh_index,
        query_lsh_index,
        remove_from_lsh_index,
    )
    from quake_vector_search_spark.operators.sparse import _terms
    from quake_vector_search_spark.operators.sparse_index import (
        build_bm25_index,
        query_bm25_index,
        remove_from_bm25_index,
    )

    base = ("the quick brown fox jumps over the lazy dog "
            "while the cat watches from the warm windowsill")
    rows = [(0, f"{base} corpus variant zero " * 2),
            (1, f"{base} corpus variant zero "
                f"{base} corpus variant zero edited")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where(F.col("doc_id") == 0)
    batch = docs.where(F.col("doc_id") == 1)

    lpath = str(tmp_path / "lsh_rebuild")
    build_lsh_index(corpus, lpath)
    remove_from_lsh_index(spark, lpath, [0])
    assert not query_lsh_index(spark, lpath, batch, 0.5).collect()
    build_lsh_index(corpus, lpath)        # rebuild, same path
    assert query_lsh_index(spark, lpath, batch, 0.5).collect()

    bpath = str(tmp_path / "bm25_rebuild")
    queries = (_terms(batch, "doc_id", "text").distinct()
               .select(F.col("doc_id").alias("query_id"), "term"))
    build_bm25_index(corpus, bpath)
    remove_from_bm25_index(spark, bpath, [0])
    assert not query_bm25_index(spark, bpath, queries, 5).collect()
    build_bm25_index(corpus, bpath)       # rebuild, same path
    assert query_bm25_index(spark, bpath, queries, 5).collect()


def test_bm25_remove_ignores_non_members(spark, tmp_path):
    """Review finding: a CDC delete for an id that was never admitted
    (or an empty-text member) must not corrupt N — membership is
    tested against the doclens member table, which now includes
    len-0 rows for empty docs."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.sparse_index import (
        _load_meta,
        build_bm25_index,
        remove_from_bm25_index,
    )

    rows = [(0, "alpha beta gamma"), (1, "alpha delta"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25_nonmember")
    build_bm25_index(docs, path)
    assert _load_meta(path)["n_docs"] == 3
    remove_from_bm25_index(spark, path, [999, 1000])   # never admitted
    m = _load_meta(path)
    assert m["n_docs"] == 3 and m["n_len_docs"] == 2
    # removing the EMPTY member decrements N but not the length stats
    remove_from_bm25_index(spark, path, [2])
    m = _load_meta(path)
    assert m["n_docs"] == 2 and m["n_len_docs"] == 2


def test_bm25_remove_is_idempotent(spark, tmp_path):
    """ADVICE r7 (medium): CDC delivery is at-least-once, so the same
    delete can arrive twice — and a single batch can repeat an id.
    Redelivery must touch nothing: counters unchanged, no duplicate
    negative df partials, top-k scores identical to a single remove."""
    from quake_vector_search_spark.operators.sparse_index import (
        _load_meta,
        build_bm25_index,
        query_bm25_index,
        remove_from_bm25_index,
    )

    rows = [(0, "alpha beta gamma"), (1, "alpha delta"),
            (2, "beta beta gamma"), (3, "delta epsilon alpha")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25_idem")
    build_bm25_index(docs, path)
    q = spark.createDataFrame(
        [(0, "alpha"), (0, "beta")], "query_id long, term string")

    # a batch that repeats the id must count it once
    remove_from_bm25_index(spark, path, [1, 1])
    m1 = dict(_load_meta(path))
    hits1 = {(r["doc_id"], r["score"])
             for r in query_bm25_index(spark, path, q, k=10).collect()}
    assert m1["n_docs"] == 3 and m1["n_len_docs"] == 3
    assert 1 not in {d for d, _ in hits1}

    # redelivered delete (at-least-once): a no-op end to end
    remove_from_bm25_index(spark, path, [1])
    m2 = dict(_load_meta(path))
    hits2 = {(r["doc_id"], r["score"])
             for r in query_bm25_index(spark, path, q, k=10).collect()}
    assert m2 == m1
    assert hits2 == hits1


def test_lsh_index_interleaved_dml_membership(spark, tmp_path):
    """Scripted CDC interleaving on the near-dup index — build,
    extend, remove, re-admit, remove again, compact, extend — with
    the queryable membership checked against a plain Python live-set
    after EVERY step. Exercises epoch monotonicity across compaction
    (a remove after compact must still kill re-admitted rows) and
    multi-generation tombstones."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.dedup_index import (
        build_lsh_index,
        compact_lsh_index,
        extend_lsh_index,
        query_lsh_index,
        remove_from_lsh_index,
    )

    base = ("the quick brown fox jumps over the lazy dog "
            "while the cat watches from the warm windowsill")
    # docs 0..5 all near-dups of each other (same base, light edits):
    # every live member should match the probe batch
    rows = [(i, f"{base} shared variant {'edited' * (i % 2)}")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probe = spark.createDataFrame(
        [(100, f"{base} shared variant probe")],
        "doc_id long, text string")
    path = str(tmp_path / "lsh_interleave")

    def members():
        return {r["corpus_id"] for r in
                query_lsh_index(spark, path, probe,
                                threshold=0.5).collect()}

    live: set = set()
    build_lsh_index(docs.where(F.col("doc_id") < 2), path)
    live |= {0, 1}
    assert members() == live
    extend_lsh_index(path, docs.where(
        F.col("doc_id").isin(2, 3)))
    live |= {2, 3}
    assert members() == live
    remove_from_lsh_index(spark, path, [1, 2])
    live -= {1, 2}
    assert members() == live
    extend_lsh_index(path, docs.where(F.col("doc_id") == 2))
    live |= {2}                                     # re-admit
    assert members() == live
    remove_from_lsh_index(spark, path, [2])         # kill the re-admit
    live -= {2}
    assert members() == live
    compact_lsh_index(spark, path)
    assert members() == live
    extend_lsh_index(path, docs.where(
        F.col("doc_id").isin(4, 5)))
    live |= {4, 5}
    assert members() == live
    remove_from_lsh_index(spark, path, [0])         # remove post-compact
    live -= {0}
    assert members() == live


def test_bm25_index_interleaved_dml_equals_fresh(spark, tmp_path):
    """Scripted CDC interleaving on the BM25 index: after every step
    the DML'd index must score EXACTLY like a fresh index built from
    the live set — answers AND all three meta counters."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.sparse import _terms
    from quake_vector_search_spark.operators.sparse_index import (
        _load_meta,
        build_bm25_index,
        compact_bm25_index,
        extend_bm25_index,
        query_bm25_index,
        remove_from_bm25_index,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = [(i, " ".join(words[(i + j) % len(words)]
                         for j in range(2 + i % 3)))
            for i in range(12)]
    rows.append((12, ""))                 # empty doc in the mix
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = (_terms(docs.where(F.col("doc_id") == 0), "doc_id",
                      "text").distinct()
               .select(F.col("doc_id").alias("query_id"), "term"))
    path = str(tmp_path / "bm25_interleave")

    def check(live_ids, tag):
        ref = str(tmp_path / f"bm25_ref_{tag}")
        build_bm25_index(
            docs.where(F.col("doc_id").isin(*live_ids)), ref)
        want = {tuple(r) for r in
                query_bm25_index(spark, ref, queries, k=6).collect()}
        got = {tuple(r) for r in
               query_bm25_index(spark, path, queries, k=6).collect()}
        assert got == want, tag
        m, mr = _load_meta(path), _load_meta(ref)
        assert (m["n_docs"], m["n_len_docs"], m["total_len"]) == \
               (mr["n_docs"], mr["n_len_docs"], mr["total_len"]), tag

    build_bm25_index(docs.where(F.col("doc_id") < 6), path)
    live = set(range(6))
    check(live, "build")
    extend_bm25_index(path, docs.where(F.col("doc_id").isin(6, 7, 12)))
    live |= {6, 7, 12}
    check(live, "extend")
    remove_from_bm25_index(spark, path, [1, 6, 12])
    live -= {1, 6, 12}
    check(live, "remove-incl-empty")
    compact_bm25_index(spark, path)
    check(live, "compact")
    extend_bm25_index(path, docs.where(F.col("doc_id").isin(8, 9)))
    live |= {8, 9}
    check(live, "extend-post-compact")
    remove_from_bm25_index(spark, path, [8])
    live -= {8}
    check(live, "remove-post-compact")


def test_api_index_handles_roundtrip(spark, tmp_path):
    """VERDICT r7 #5: one discoverable surface over the three
    persisted index families — api.index(kind, spark, path) with the
    uniform build/query/extend/remove/compact lifecycle. Thin
    delegation: each verb must behave exactly like the per-family
    functions (whose semantics the oracle rows pin)."""
    import numpy as np

    from quake_vector_search_spark import api

    # --- near_dup (MinHash-LSH) ---
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "an entirely different document about spark engines"),
         (2, "yet another unrelated piece of text here")],
        "doc_id long, text string")
    h = api.index("near_dup", spark, str(tmp_path / "lsh")).build(docs)
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    assert h.query(probe, threshold=0.5).count() >= 1
    h.extend(spark.createDataFrame(
        [(3, "a freshly admitted corpus document")],
        "doc_id long, text string"))
    probe3 = spark.createDataFrame(
        [(101, "a freshly admitted corpus document")],
        "doc_id long, text string")
    assert h.query(probe3, threshold=0.5).count() >= 1
    h.remove([3])
    assert h.query(probe3, threshold=0.5).count() == 0
    h.compact()
    assert h.query(probe, threshold=0.5).count() >= 1

    # --- bm25 ---
    hb = api.index("bm25", spark, str(tmp_path / "bm25")).build(docs)
    q = spark.createDataFrame([(0, "fox"), (0, "dog")],
                              "query_id long, term string")
    top = hb.query(q, k=3).collect()
    assert top and top[0]["doc_id"] == 0
    hb.extend(spark.createDataFrame(
        [(3, "fox fox fox")], "doc_id long, text string"))
    assert {r["doc_id"] for r in hb.query(q, k=3).collect()} >= {0, 3}
    hb.remove([3])
    assert 3 not in {r["doc_id"] for r in hb.query(q, k=3).collect()}
    assert hb.compact()["dropped"] >= 1

    # --- vector (IVF) ---
    from quake_vector_search_spark.operators.workload import make_dataset

    corpus = make_dataset(spark, 800, d=8, n_clusters=4, seed=21)
    hv = api.index("vector", spark, str(tmp_path / "ivf")).build(
        corpus, coarse_k=2, base_k=2)
    probe_vec = np.array(
        corpus.where("vec_id = 5").select("embedding").head()[0],
        dtype=np.float64)
    got = hv.query((np.array([0]), probe_vec[None, :]), k=1,
                   target_recall=1.0, max_probe=10**9).collect()
    assert got[0]["vec_id"] == 5
    hv.extend(np.array([9001]), probe_vec[None, :] + 100.0)
    far = probe_vec[None, :] + 100.0
    got2 = hv.query((np.array([0]), far), k=1, target_recall=1.0,
                    max_probe=10**9).collect()
    assert got2[0]["vec_id"] == 9001
    hv.remove([9001])
    got3 = hv.query((np.array([0]), far), k=1, target_recall=1.0,
                    max_probe=10**9).collect()
    assert got3[0]["vec_id"] != 9001
    summary = hv.compact()
    assert "version" in summary


def test_vector_handle_extend_binds_columns_by_name(spark, tmp_path):
    """ADVICE r8: a (embedding, vec_id)-ordered DataFrame passed to
    VectorIndexHandle.extend must bind by the index's own column
    names, not positionally — the old positional bind silently
    misread the vector column as ids. Unnamed 2-col frames still
    bind positionally (id, vector); ambiguous frames raise."""
    import numpy as np
    import pytest

    from quake_vector_search_spark import api
    from quake_vector_search_spark.operators.workload import make_dataset

    corpus = make_dataset(spark, 400, d=8, n_clusters=4, seed=22)
    hv = api.index("vector", spark, str(tmp_path / "ivf_nb")).build(
        corpus, coarse_k=2, base_k=2)
    probe_vec = np.array(
        corpus.where("vec_id = 5").select("embedding").head()[0],
        dtype=np.float64)
    far = probe_vec + 50.0

    # REVERSED column order, index-native names → binds by name
    rev = spark.createDataFrame(
        [(far.tolist(), 7001)], "embedding array<double>, vec_id long")
    hv.extend(rev)
    got = hv.query((np.array([0]), far[None, :]), k=1,
                   target_recall=1.0, max_probe=10**9).collect()
    assert got[0]["vec_id"] == 7001

    # two columns, non-native names → positional (id, vector)
    far2 = probe_vec - 50.0
    pos = spark.createDataFrame(
        [(7002, far2.tolist())], "the_id long, the_vec array<double>")
    hv.extend(pos)
    got2 = hv.query((np.array([0]), far2[None, :]), k=1,
                    target_recall=1.0, max_probe=10**9).collect()
    assert got2[0]["vec_id"] == 7002

    # three columns, none matching the index's names → ambiguous
    amb = spark.createDataFrame(
        [(7003, far2.tolist(), "x")],
        "a long, b array<double>, c string")
    with pytest.raises(ValueError, match="extend"):
        hv.extend(amb)

    # EXACTLY ONE native name present (ADVICE r9): the named column
    # binds by name and the other column takes the remaining role,
    # regardless of position — (embedding, my_id) used to fall
    # through to positional and read the vector column as ids
    far3 = probe_vec + 100.0
    one_a = spark.createDataFrame(
        [(far3.tolist(), 7004)], "embedding array<double>, my_id long")
    hv.extend(one_a)
    got3 = hv.query((np.array([0]), far3[None, :]), k=1,
                    target_recall=1.0, max_probe=10**9).collect()
    assert got3[0]["vec_id"] == 7004
    far4 = probe_vec - 100.0
    one_b = spark.createDataFrame(
        [(far4.tolist(), 7005)], "my_vec array<double>, vec_id long")
    hv.extend(one_b)
    got4 = hv.query((np.array([0]), far4[None, :]), k=1,
                    target_recall=1.0, max_probe=10**9).collect()
    assert got4[0]["vec_id"] == 7005


def test_lsh_index_hot_bucket_cap(spark, tmp_path):
    """VERDICT r7 #7 skew probe: an adversarial corpus concentrating
    hundreds of members in ONE band bucket (identical boilerplate
    text → identical signature → same key in every band) must not
    blow up candidate generation when the cap is on — and docs in
    small buckets must still match through it."""
    from quake_vector_search_spark.operators.dedup_index import (
        build_lsh_index,
        query_lsh_index,
    )

    hot = [(i, "the exact same boilerplate header text repeated")
           for i in range(300)]
    cold = [(1000, "a genuinely unique document about spark engines"),
            (1001, "another unique text concerning quantization")]
    docs = spark.createDataFrame(hot + cold, "doc_id long, text string")
    path = str(tmp_path / "lsh_hot")
    build_lsh_index(docs, path)

    probe = spark.createDataFrame(
        [(5000, "the exact same boilerplate header text repeated"),
         (5001, "a genuinely unique document about spark engines")],
        "doc_id long, text string")
    # uncapped: the hot-bucket probe matches all 300 members
    full = query_lsh_index(spark, path, probe, threshold=0.9)
    by_probe = {r["new_id"] for r in full.collect()}
    assert full.where("new_id = 5000").count() == 300
    assert 5001 in by_probe
    # capped: hot-bucket candidates are DROPPED (bounded work — the
    # cap is the explicit recall trade), small buckets unaffected
    capped = query_lsh_index(spark, path, probe, threshold=0.9,
                             max_bucket_size=10)
    assert capped.where("new_id = 5000").count() == 0
    assert capped.where("new_id = 5001").count() == 1


def test_bm25_index_hot_term_cap(spark, tmp_path):
    """VERDICT r7 #7 skew probe: one stopword-class term present in
    every corpus doc must not drag the whole posting table through
    the query when the df cap is on; rare-term matches survive and
    their scores equal the cap-free scores of the same docs minus the
    dropped term's (near-zero-idf) contribution."""
    from quake_vector_search_spark.operators.sparse_index import (
        build_bm25_index,
        query_bm25_index,
    )

    rows = [(i, "the filler " + ("alpha" if i == 0 else
                                 "beta" if i == 1 else "common"))
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25_hot")
    build_bm25_index(docs, path)
    q = spark.createDataFrame(
        [(0, "the"), (0, "alpha")], "query_id long, term string")
    # uncapped: "the" matches all 200 docs → 200 candidates ranked
    full = query_bm25_index(spark, path, q, k=500)
    assert full.count() == 200
    # capped at 50: "the" (df=200) is dropped before any posting row
    # is read; only the rare term's single posting survives
    capped = query_bm25_index(spark, path, q, k=500, max_term_df=50)
    got = capped.collect()
    assert len(got) == 1 and got[0]["doc_id"] == 0


def test_dsir_selects_target_like_docs(spark):
    """DSIR semantics on a constructed fixture: raw docs written in
    the target's vocabulary must out-rank raw docs written in a
    disjoint vocabulary, exact integer weights, deterministic
    tie-break, and n_grams = unigrams + bigrams."""
    from quake_vector_search_spark.operators.sampling import (
        dsir_select,
        dsir_weights,
    )

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta alpha beta")
         for i in range(6)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma"),            # target-like
         (1, "alpha beta"),                  # target-like, shorter
         (2, "zig zag zug quux"),            # disjoint vocab
         (3, "zag zug"),                     # disjoint vocab
         (4, "alpha zig")],                  # mixed
        "doc_id long, text string")
    top2 = [r["doc_id"] for r in
            dsir_select(raw, target, n=2).collect()]
    assert set(top2) == {0, 1}
    wts = {r["doc_id"]: (r["n_grams"], r["w_micro"])
           for r in dsir_weights(raw, target).collect()}
    # n_grams = unigrams + bigrams
    assert wts[0][0] == 3 + 2 and wts[3][0] == 2 + 1
    # target-vocabulary docs carry positive weight, disjoint negative
    assert wts[0][1] > 0 > wts[2][1]
    # determinism: exact integers, identical on rerun
    wts2 = {r["doc_id"]: (r["n_grams"], r["w_micro"])
            for r in dsir_weights(raw, target).collect()}
    assert wts2 == wts


def test_dsir_sample_gumbel_properties(spark):
    """Gumbel resampling vs greedy selection: deterministic across
    reruns and seeds reproduce; different seeds can pick different
    sets (it IS sampling); heavily target-like docs still dominate
    the sample at temperature 1 on a separated fixture."""
    from quake_vector_search_spark.operators.sampling import (
        dsir_sample,
        dsir_select,
    )

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta alpha beta")
         for i in range(6)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(4)]
        + [(10 + i, "zig zag zug quux") for i in range(4)],
        "doc_id long, text string")
    s1 = sorted(r["doc_id"] for r in
                dsir_sample(raw, target, n=4, seed=7).collect())
    s1b = sorted(r["doc_id"] for r in
                 dsir_sample(raw, target, n=4, seed=7).collect())
    assert s1 == s1b                       # deterministic per seed
    # with a huge weight gap (disjoint vocab), the Gumbel noise can't
    # overturn it: all 4 target-like docs selected at T=1
    assert s1 == [0, 1, 2, 3]
    # at very high temperature the weights flatten and the hash noise
    # decides — selection differs from the greedy one for some seed
    greedy = sorted(r["doc_id"] for r in
                    dsir_select(raw, target, n=4).collect())
    flat = {tuple(sorted(r["doc_id"] for r in
                         dsir_sample(raw, target, n=4, seed=s,
                                     temperature=1e9).collect()))
            for s in range(6)}
    assert any(set(t) != set(greedy) for t in flat)


def test_vector_handle_extend_distributed(spark, tmp_path):
    """Round 10: extend(distributed=True) routes a DataFrame through
    insert_distributed (backfill path) with the same column-binding
    rules as the driver path; the admitted vector is immediately
    searchable."""
    import numpy as np
    import pytest

    from quake_vector_search_spark import api
    from quake_vector_search_spark.operators.workload import make_dataset

    corpus = make_dataset(spark, 400, d=8, n_clusters=4, seed=23)
    hv = api.index("vector", spark, str(tmp_path / "ivf_dist")).build(
        corpus, coarse_k=2, base_k=2)
    probe = np.array(
        corpus.where("vec_id = 5").select("embedding").head()[0],
        dtype=np.float64)
    far = probe + 60.0
    df = spark.createDataFrame(
        [(far.tolist(), 8001)], "embedding array<double>, my_id long")
    hv.extend(df, distributed=True)
    got = hv.query((np.array([0]), far[None, :]), k=1,
                   target_recall=1.0, max_probe=10**9).collect()
    assert got[0]["vec_id"] == 8001
    with pytest.raises(ValueError, match="single"):
        hv.extend(np.array([1]), np.zeros((1, 8)), distributed=True)
