"""Unit tests for the round-5 continuation operators: PII
detect/redact, Misra-Gries heavy hitters, deterministic shard export,
and the streaming-ingest oracle plumbing."""

import random

from pyspark.sql import functions as F

from quake_vector_search_spark.operators.pii import (
    REDACTION_RULES,
    pii_signals,
    redact,
)
from quake_vector_search_spark.operators.sketch import misra_gries


def test_pii_signals_counts_each_category(spark):
    rows = [
        (1, "reach me at a.b+x@mail.example.org or b@c.io thanks"),
        (2, "server 192.168.0.1 and 10.0.255.254 up"),
        (3, "call +44 555-0199 or +1 202 5550"),
        (4, "ref 123456789012 and short 12345678"),
        (5, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_signals(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["pii_total"] == 2
    assert got[2]["n_ip"] == 2
    assert got[3]["n_phone"] == 2
    # 9+ digit run matches once; the 8-digit run does not
    assert got[4]["n_idrun"] == 1
    assert got[5]["pii_total"] == 0 and not got[5]["has_pii"]


def test_redact_replaces_and_preserves_clean_text(spark):
    rows = [(1, "mail a@b.co ip 1.2.3.4 tel +44 555-0199 acct 987654321 end")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = redact(df).collect()[0]["text_redacted"]
    assert out == "mail <EMAIL> ip <IP> tel <PHONE> acct <ID> end"
    clean = spark.createDataFrame([(2, "nothing to hide")],
                                  "doc_id long, text string")
    assert redact(clean).collect()[0]["text_redacted"] == "nothing to hide"


def test_redact_email_wins_over_id_and_ip_rules(spark):
    # digits+dots inside an email must become one <EMAIL>, not <IP>/<ID>
    df = spark.createDataFrame([(1, "x 123456789.a@d10.ex2.com y")],
                               "doc_id long, text string")
    assert (redact(df).collect()[0]["text_redacted"]
            == "x <EMAIL> y")
    assert [p for p, _ in REDACTION_RULES][0].endswith("{2,}")


def _mg_truth_check(spark, stream, k):
    """Assert the three MG guarantees against exact counts."""
    df = spark.createDataFrame([(s,) for s in stream], "item string")
    est = {r["item"]: r["est"]
           for r in misra_gries(df, "item", k=k).collect()}
    assert len(est) <= k
    exact = {}
    for s in stream:
        exact[s] = exact.get(s, 0) + 1
    n = len(stream)
    for item, c in exact.items():
        if c * (k + 1) > n:
            assert item in est, f"true heavy hitter {item} missing"
        if item in est:
            assert est[item] <= c
            assert (c - est[item]) * (k + 1) <= n


def test_misra_gries_guarantees_random_streams(spark):
    rng = random.Random(7)
    for trial in range(3):
        # zipf-ish: item i with weight 1/(i+1)
        pop = [f"w{i}" for i in range(60)]
        weights = [1.0 / (i + 1) for i in range(60)]
        stream = rng.choices(pop, weights=weights, k=3000)
        _mg_truth_check(spark, stream, k=8)


def test_misra_gries_adversarial_order(spark):
    # all heavy items first, then a flood of distinct singletons —
    # the eviction-pressure worst case
    stream = ["hh"] * 500 + [f"u{i}" for i in range(900)]
    _mg_truth_check(spark, stream, k=4)


def test_misra_gries_fewer_items_than_k_is_exact(spark):
    stream = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
    df = spark.createDataFrame([(s,) for s in stream], "item string")
    est = {r["item"]: r["est"]
           for r in misra_gries(df, "item", k=16).collect()}
    assert est == {"a": 10, "b": 5, "c": 2}


def test_shard_export_roundtrip_and_determinism(spark, tmp_path):
    from quake_vector_search_spark.operators.export import (
        export_shards,
        shard_assign,
        shard_manifest,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id") \
        .withColumn("payload", (F.col("doc_id") * 3).cast("long"))
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_shards(df, p1, "doc_id", 8)
    # same input re-exported (different partitioning) -> same routing
    export_shards(df.repartition(13), p2, "doc_id", 8)
    m1 = shard_manifest(spark.read.parquet(p1), "doc_id",
                        ["payload"]).orderBy("shard").collect()
    m2 = shard_manifest(spark.read.parquet(p2), "doc_id",
                        ["payload"]).orderBy("shard").collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    assert sum(r["n_rows"] for r in m1) == 500
    assert len(m1) == 8  # 500 rows over 8 hash shards: all populated
    # assignment is a pure function of (id, seed): direct recompute
    back = spark.read.parquet(p1)
    want = shard_assign(df, "doc_id", 8).select("doc_id", "shard")
    got = back.select("doc_id", F.col("shard").cast("long").alias("shard"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_shard_export_narrow_assignment_plan(spark):
    from quake_vector_search_spark.operators.export import shard_assign

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = shard_assign(df, "doc_id", 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # narrow: no shuffle to assign


def test_dup_span_stats_detects_cross_doc_spans(spark):
    from quake_vector_search_spark.operators.text import dup_span_stats

    shared = "x" * 80  # identical 80-char block -> shared windows
    rows = [
        (1, shared + " unique tail one " + "a" * 30),
        (2, shared + " other ending entirely " + "b" * 30),
        (3, "completely different text with no repeats at all " + "c" * 40),
        (4, "tiny"),  # shorter than the window: one whole-text window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(df).collect()}
    assert got[1]["n_dup_windows"] >= 1  # the shared block collides
    assert got[2]["n_dup_windows"] >= 1
    assert got[3]["n_dup_windows"] == 0
    assert got[3]["dup_span_frac"] == 0.0
    assert got[4]["n_windows"] == 1
    # windows are strided: offsets 1, 21, 41, ... while a full window fits
    n1 = got[1]["n_windows"]
    text_len = len(rows[0][1])
    assert n1 == (max(text_len - 39, 1) + 19) // 20


def test_dup_span_stats_within_doc_repeat_not_counted(spark):
    from quake_vector_search_spark.operators.text import dup_span_stats

    # the same span twice in ONE doc is not a cross-doc duplicate
    rows = [(1, "z" * 40 + " middle filler words " + "z" * 40),
            (2, "some other wholly unrelated document body here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(df).collect()}
    assert got[1]["n_dup_windows"] == 0


def test_linear_quality_classifier_exact_logit(spark):
    from quake_vector_search_spark.operators.text import (
        linear_quality_classifier,
    )

    # "the cat" -> L=7, na=6, nd=0, np=0, T=2, ns=1 ('the')
    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    r = linear_quality_classifier(df).collect()[0]
    # P = T*(600*na) + 400*ns*L + (-250)*L*T = 2*3600 + 2800 - 3500
    p, q = 2 * 600 * 6 + 400 * 1 * 7 - 250 * 7 * 2, 1000 * 7 * 2
    assert r["accept"] is (p > 0)
    assert abs(r["logit"] - round(p / q, 6)) < 1e-9


def test_linear_quality_classifier_custom_weights_flip(spark):
    from quake_vector_search_spark.operators.text import (
        linear_quality_classifier,
    )

    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    r = linear_quality_classifier(
        df, weights={"alpha": -600, "stopword": -400, "bias": -100}) \
        .collect()[0]
    assert r["accept"] is False and r["logit"] < 0


def test_api_round5b_facade(spark, tmp_path):
    """Round-5 continuation api surface: pii_scrub, heavy_hitters,
    export_dataset, dup_spans, quality_classify."""
    from quake_vector_search_spark import api
    from quake_vector_search_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").limit(50)

    scrubbed = api.pii_scrub(docs)
    assert {"has_pii", "text_redacted"} <= set(scrubbed.columns)
    assert scrubbed.count() == 50

    items = docs.select(F.col("source").alias("item"))
    hh = api.heavy_hitters(items, "item", k=4)
    assert hh.count() <= 4

    manifest = api.export_dataset(docs, str(tmp_path / "ds"),
                                  "doc_id", 4)
    assert manifest.agg(F.sum("n_rows")).collect()[0][0] == 50

    ds = api.dup_spans(docs)
    assert {"n_windows", "dup_span_frac"} <= set(ds.columns)

    qc = api.quality_classify(docs)
    assert {"logit", "accept"} <= set(qc.columns)
    assert qc.count() == 50


def test_maxsim_hand_computed(spark):
    from quake_vector_search_spark.operators.multivector import (
        maxsim_topk,
    )

    # 2-dim vectors; doc 0 = {e_x, e_y}, doc 1 = {-e_x, diag}
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0]),
         (1, [-1.0, 0.0]), (1, [0.70710678, 0.70710678])],
        "doc_id long, embedding array<double>")
    # query doc 9 = {e_x, e_y}
    queries = spark.createDataFrame(
        [(9, 100, [1.0, 0.0]), (9, 101, [0.0, 1.0])],
        "query_doc long, qv_id long, qvec array<double>")
    got = {r["doc_id"]: r for r in
           maxsim_topk(corpus, queries, k=2).collect()}
    # doc 0: max cos vs e_x = 1, vs e_y = 1 -> score 2
    assert abs(got[0]["score"] - 2.0) < 1e-9 and got[0]["rank"] == 1
    # doc 1: e_x -> max(-1, .7071)= .707107; e_y -> max(0, .7071)
    assert abs(got[1]["score"] - 1.414214) < 1e-9
    assert got[1]["rank"] == 2


def test_maxsim_plan_broadcasts_queries(spark):
    from quake_vector_search_spark.operators.multivector import (
        maxsim_topk,
    )

    corpus = spark.range(0, 64).select(
        (F.col("id") / 8).cast("long").alias("doc_id"),
        F.array(F.rand(1), F.rand(2)).alias("embedding"))
    queries = spark.createDataFrame(
        [(0, 0, [0.5, 0.5])], "query_doc long, qv_id long, qvec array<double>")
    plan = maxsim_topk(corpus, queries)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_integer_path_graph(spark):
    from quake_vector_search_spark.operators.graph import (
        PR_SCALE,
        pagerank_integer,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                  "id_a long, id_b long")
    pr = {r["node"]: r["pr"] for r in pagerank_integer(pairs).collect()}
    assert set(pr) == {1, 2, 3}
    # center of the path out-ranks the endpoints; endpoints symmetric
    assert pr[2] > pr[1] and pr[1] == pr[3]
    # rank mass conserved up to floor-truncation loss
    assert 0.999 * PR_SCALE < sum(pr.values()) <= PR_SCALE


def test_pagerank_integer_partitioning_invariant(spark):
    import random

    from quake_vector_search_spark.operators.graph import (
        pagerank_integer,
    )

    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r1 = {tuple(r) for r in pagerank_integer(df).collect()}
    r2 = {tuple(r) for r in
          pagerank_integer(df.repartition(7)).collect()}
    assert r1 == r2


def test_pagerank_integer_empty_edges(spark):
    from quake_vector_search_spark.operators.graph import (
        pagerank_integer,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank_integer(empty).count() == 0


def test_hash_embed_dense_normalized_and_knn_ready(spark):
    from quake_vector_search_spark.operators.knn import knn_bruteforce
    from quake_vector_search_spark.operators.text import (
        hash_embed,
        hash_embed_dense,
    )
    from quake_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001",
                      "documents").limit(40)
    dense = hash_embed_dense(docs)
    rows = dense.collect()
    assert all(len(r["embedding"]) == 64 for r in rows)
    for r in rows[:5]:
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert abs(norm - 1.0) < 1e-6
    # dense agrees with sparse at every touched bucket
    sp = {(r["doc_id"], r["bucket"]): r["v"]
          for r in hash_embed(docs).collect()}
    some = rows[0]
    raw = [sp.get((some["doc_id"], b), 0) for b in range(64)]
    nrm = sum(x * x for x in raw) ** 0.5
    for b in range(64):
        assert abs(some["embedding"][b] - raw[b] / (nrm + 1e-12)) < 1e-9
    # feeds the knn family directly: a doc's nearest neighbor is itself
    emb = dense.withColumnRenamed("doc_id", "vec_id")
    queries = (emb.where(F.col("vec_id") < 3)
               .withColumnRenamed("vec_id", "query_id"))
    top = knn_bruteforce(emb, queries, k=1)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_cosine_exhaustive_blas_twin_matches_catalyst(spark):
    from quake_vector_search_spark.operators.dedup import (
        cosine_pairs_exhaustive,
        cosine_pairs_exhaustive_blas,
    )
    from quake_vector_search_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    key = ["id_a", "id_b", "cosine"]
    a = {tuple(r) for r in
         cosine_pairs_exhaustive(emb, 0.45)
         .withColumn("cosine", F.round("cosine", 6))
         .select(*key).collect()}
    b = {tuple(r) for r in
         cosine_pairs_exhaustive_blas(emb, 0.45)
         .withColumn("cosine", F.round("cosine", 6))
         .select(*key).collect()}
    assert a == b and len(a) > 0


def test_redact_idempotent_and_silences_signals(spark):
    """Fixpoint property: one redaction pass leaves nothing any rule
    still matches (placeholders are designed not to re-match — '>' /
    '<' terminate the local-part and digit-run classes), so
    redact(redact(x)) == redact(x) and all signal counts on redacted
    text are zero. Fuzzed over random strings from the PII alphabet."""
    import random
    import string

    rng = random.Random(23)
    alphabet = string.ascii_letters + string.digits + " @.+-_%<>(),"
    rows = [(i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 60))))
            for i in range(300)]
    # seed some real PII shapes among the noise
    rows += [(1000, "a@b.co x 1.2.3.4 +44 555-0199 987654321 end"),
             (1001, "a@b.com@c.org .x@d.org chained")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = redact(df).select("doc_id",
                             F.col("text_redacted").alias("text"))
    twice = redact(once).select("doc_id", "text_redacted")
    joined = (once.withColumnRenamed("text", "r1")
              .join(twice.withColumnRenamed("text_redacted", "r2"),
                    "doc_id"))
    assert joined.where(F.col("r1") != F.col("r2")).count() == 0
    sig = pii_signals(once)
    assert sig.agg(F.sum("pii_total")).collect()[0][0] == 0


def test_linear_classifier_matches_python_rational_reference(spark):
    """Differential: the Catalyst integer-logit path must equal an
    independent Python fractions.Fraction evaluation of the same
    linear form (exact rational, then HALF_UP to 6 places) on random
    texts — catches any drift in the P/Q factoring or _r6 rounding."""
    import random
    import string
    from fractions import Fraction

    from quake_vector_search_spark.operators.text import (
        LANG_STOPWORDS,
        QUALITY_WEIGHTS_MILLI as W,
        linear_quality_classifier,
    )

    rng = random.Random(31)
    alphabet = string.ascii_letters + string.digits + " .,!?()'\"-"
    rows = [(i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(1, 80))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           linear_quality_classifier(df).collect()}
    stop = set(LANG_STOPWORDS["en"])
    for i, text in rows:
        L = max(len(text), 1)
        na = sum(c.isalpha() and c.isascii() for c in text)
        nd = sum(c.isdigit() and c.isascii() for c in text)
        np_ = sum(c in ".,;:!?'\"()-" for c in text)
        words = text.split()
        T = max(len(words), 1)
        ns = sum(w.lower() in stop for w in words)
        P = (T * (W["alpha"] * na + W["punct"] * np_ + W["digit"] * nd)
             + W["stopword"] * ns * L + W["bias"] * L * T)
        Q = 1000 * L * T
        frac = Fraction(abs(P), Q)
        # HALF_UP at 6 places on |P|/Q, re-signed
        r6 = (2 * frac.numerator * 10**6 + frac.denominator) // (
            2 * frac.denominator) / 1e6
        want = r6 if P >= 0 else -r6
        assert got[i]["accept"] is (P > 0), (i, text)
        assert abs(got[i]["logit"] - want) < 1e-12, (i, text)


def test_ivf_range_search_prunes_and_matches_bruteforce(spark):
    from quake_vector_search_spark.operators.ivf import (
        ivf_range_search,
        partition_radii,
    )
    from quake_vector_search_spark.operators.knn import (
        range_search_bruteforce,
    )
    from quake_vector_search_spark.queries.vector_queries import (
        _ivf_index,
    )
    from quake_vector_search_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    idx = _ivf_index(spark, sf)
    emb = load_table(spark, sf, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .withColumnRenamed("vec_id", "query_id"))
    got, meta = ivf_range_search(idx, queries, radius=1.3)
    want = range_search_bruteforce(emb, queries, 1.3)
    key = ["query_id", "vec_id"]
    g = {tuple(r) for r in got.select(*key).collect()}
    w = {tuple(r) for r in want.select(*key).collect()}
    assert g == w and len(g) > 0
    # at sf0.001 every partition's covering ball can intersect every
    # query ball (16 wide partitions), so only sanity-check here...
    assert meta["avg_nprobe"] <= meta["n_partitions"]
    radii = partition_radii(idx)
    assert all(r >= 0 for r in radii.values())
    # ...and require REAL pruning at a tight radius: in 64-dim
    # near-uniform data every covering ball overlaps wide query balls
    # (dists and radii both ~1.0), so the triangle-inequality prune
    # only bites when radius << the centroid spread — exactly the
    # self-match / near-exact-dup regime
    got2, meta2 = ivf_range_search(idx, queries, radius=0.05)
    want2 = range_search_bruteforce(emb, queries, 0.05)
    g2 = {tuple(r) for r in got2.select(*key).collect()}
    w2 = {tuple(r) for r in want2.select(*key).collect()}
    assert g2 == w2 and len(g2) >= 3  # at least the self-matches
    assert meta2["avg_nprobe"] < meta2["n_partitions"]


def test_api_range_and_centrality_facades(spark):
    from quake_vector_search_spark import api
    from quake_vector_search_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = (emb.where(F.col("vec_id") < 2)
               .withColumnRenamed("vec_id", "query_id"))
    out = api.range_search(emb, queries, radius=1.3)
    assert set(out.columns) == {"query_id", "vec_id", "dist"}
    assert out.where("dist > 1.3").count() == 0
    assert out.count() >= 2  # self matches at least

    pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                  "id_a long, id_b long")
    pr = api.centrality(pairs)
    assert set(pr.columns) == {"node", "pr"} and pr.count() == 3

    ms = api.maxsim_search(
        spark.createDataFrame([(0, [1.0, 0.0])],
                              "doc_id long, embedding array<double>"),
        spark.createDataFrame([(9, 1, [1.0, 0.0])],
                              "query_doc long, qv_id long, "
                              "qvec array<double>"), k=1)
    assert ms.count() == 1


def test_hash_embed_cosine_topk_self_match_and_ranking(spark):
    from quake_vector_search_spark.operators.text import (
        hash_embed_cosine_topk,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta"), (4, "alpha beta delta")],
        "doc_id long, text string")
    queries = docs.where("doc_id = 1").select(
        F.col("doc_id").alias("query_id"), "text")
    out = hash_embed_cosine_topk(docs, queries, k=4).collect()
    by_rank = {r["rank"]: r for r in out}
    # exact-duplicate docs tie at cosine 1.0; id tie-break puts 1 first
    assert by_rank[1]["doc_id"] == 1 and by_rank[1]["cosine"] == 1.0
    assert by_rank[2]["doc_id"] == 2 and by_rank[2]["cosine"] == 1.0
    # partial overlap ranks above disjoint text
    assert by_rank[3]["doc_id"] == 4
    assert by_rank[3]["cosine"] > by_rank[4]["cosine"]


def test_mmr_rerank_diversifies_and_orders(spark):
    from quake_vector_search_spark.operators.rerank import mmr_rerank

    # query 1: docs 10/11 highly relevant AND near-duplicates of each
    # other; doc 12 slightly less relevant but dissimilar. Plain
    # ranking = 10, 11, 12; MMR must interleave: 10, 12, 11.
    cands = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 0.98), (1, 12, 0.80)],
        "query_id long, doc_id long, cosine double")
    sims = spark.createDataFrame(
        [(1, 10, 11, 0.99), (1, 10, 12, 0.05), (1, 11, 12, 0.05)],
        "query_id long, doc_a long, doc_b long, sim double")
    out = sorted((r["mmr_rank"], r["doc_id"], r["mmr_score"])
                 for r in mmr_rerank(cands, sims, k=3,
                                     lam=0.7).collect())
    assert [d for _, d, _ in out] == [10, 12, 11]
    # step-1 score is lam*rel; later steps subtract redundancy
    assert abs(out[0][2] - 0.7 * 1.0) < 1e-12
    assert abs(out[1][2] - (0.7 * 0.80 - 0.3 * 0.05)) < 1e-9
    # redundancy penalty drove 11 below its relevance-only score
    assert out[2][2] < 0.7 * 0.98 - 1e-6


def test_mmr_rerank_fewer_candidates_than_k(spark):
    from quake_vector_search_spark.operators.rerank import mmr_rerank

    cands = spark.createDataFrame(
        [(7, 1, 0.9), (7, 2, 0.5)],
        "query_id long, doc_id long, cosine double")
    sims = spark.createDataFrame(
        [], "query_id long, doc_a long, doc_b long, sim double")
    out = mmr_rerank(cands, sims, k=5, lam=0.7).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    assert sorted(r["mmr_rank"] for r in out) == [1, 2]


def test_prf_rocchio_pulls_in_feedback_neighborhood(spark):
    from quake_vector_search_spark.operators.text import (
        hash_embed_cosine_topk,
        prf_rocchio_topk,
    )

    # doc 30 shares no terms with the query but heavily overlaps the
    # query's nearest neighbors — feedback expansion must raise it
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"),
         (10, "apple banana cherry date"),
         (11, "apple banana date elderberry"),
         (30, "date elderberry fig grape"),
         (40, "quartz zinc xenon")],
        "doc_id long, text string")
    q = docs.where("doc_id = 1").select(
        F.col("doc_id").alias("query_id"), "text")
    base = {r["doc_id"]: r["rank"]
            for r in hash_embed_cosine_topk(docs, q, k=5).collect()}
    prf = {r["doc_id"]: r["rank"]
           for r in prf_rocchio_topk(docs, q, k=5, m=3).collect()}
    # expansion must not displace the true top hit
    assert prf[1] == 1
    # doc 30's rank improves (or score appears) relative to pure
    # lexical overlap with the original query
    assert prf[30] <= base.get(30, 6)
    # disjoint junk never outranks the neighborhood: either absent
    # (no shared bucket with the expanded vector) or ranked last
    assert 40 not in prf or prf[40] == max(prf.values())


def test_api_retrieval_facades(spark):
    from quake_vector_search_spark import api

    docs = spark.createDataFrame(
        [(1, "red green blue"), (2, "red green yellow"),
         (3, "cyan magenta black")],
        "doc_id long, text string")
    q = docs.where("doc_id = 1").select(
        F.col("doc_id").alias("query_id"), "text")
    hits = api.text_search(docs, q, k=3).collect()
    assert hits[0]["doc_id"] == 1 and hits[0]["cosine"] == 1.0
    prf = api.text_search_prf(docs, q, k=3, m=2).collect()
    assert {r["doc_id"] for r in prf} >= {1, 2}
    cands = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 0.9), (1, 3, 0.5)],
        "query_id long, doc_id long, cosine double")
    sims = spark.createDataFrame(
        [(1, 1, 2, 0.95), (1, 1, 3, 0.0), (1, 2, 3, 0.0)],
        "query_id long, doc_a long, doc_b long, sim double")
    div = api.diversify(cands, sims, k=2).collect()
    assert [r["doc_id"] for r in
            sorted(div, key=lambda r: r["mmr_rank"])] == [1, 3]


def test_label_propagation_votes_ties_and_freezing(spark):
    from quake_vector_search_spark.operators.graph import (
        label_propagation,
    )

    # path graph 1-2-3-4; seeds at both ends with different labels.
    # round 1: node 2 <- label(1)=7, node 3 <- label(4)=9.
    # round 2: nothing left unlabeled. Seed labels never change.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    seeds = spark.createDataFrame(
        [(1, 7), (4, 9)], "node long, label long")
    got = {r["node"]: (r["label"], r["src_iter"])
           for r in label_propagation(pairs, seeds, iters=2).collect()}
    assert got == {1: (7, 0), 4: (9, 0), 2: (7, 1), 3: (9, 1)}

    # tie case: node 0 has one neighbor of each label -> smallest wins
    pairs2 = spark.createDataFrame(
        [(1, 0), (4, 0)], "id_a long, id_b long")
    got2 = {r["node"]: (r["label"], r["src_iter"])
            for r in label_propagation(pairs2, seeds,
                                       iters=1).collect()}
    assert got2[0] == (7, 1)

    # isolated seed survives; unreachable node stays absent
    pairs3 = spark.createDataFrame(
        [(8, 9)], "id_a long, id_b long")
    got3 = {r["node"] for r in
            label_propagation(pairs3, seeds, iters=2).collect()}
    assert got3 == {1, 4}
