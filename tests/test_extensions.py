"""Unit tests for the training-data pipeline operators (dedup, ANN,
text analysis, multimodal plumbing) on small hand-built DataFrames.

The oracle harness (tools/verify_local.py) checks cross-engine hash
equality at sf0.01; these tests pin the *semantics* — survivor policy,
similarity math, blocking behavior, determinism — on inputs where the
expected answer is computable by hand.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions import multimodal, text as text_fns
from kafka_connect_bigquery_spark.operators import ann, dedup


# ---------------------------------------------------------------------------
# dedup: canonicalization + exact
# ---------------------------------------------------------------------------

def test_canonical_text_normalizes_case_punct_whitespace(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO   WORLD.",)], ["t"]
    )
    vals = [r[0] for r in df.select(dedup.canonical_text(F.col("t"))).collect()]
    assert vals == ["hello world"] * 3


def test_exact_dedup_survivor_is_min_id(spark):
    df = spark.createDataFrame(
        [
            (3, "The cat sat."),
            (1, "the CAT sat"),
            (2, "a different document"),
            (7, "THE cat SAT!!"),
        ],
        ["doc_id", "text"],
    )
    out = {r["keep_id"]: r["dup_count"] for r in dedup.exact_dedup(df, "doc_id", "text").collect()}
    assert out == {1: 3, 2: 1}


def test_fingerprint_is_md5_of_canonical(spark):
    df = spark.createDataFrame([("Abc  DEF!",)], ["t"])
    got = df.select(dedup.fingerprint(F.col("t"))).first()[0]
    assert got == hashlib.md5(b"abc def").hexdigest()


# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard
# ---------------------------------------------------------------------------

def _jaccard_py(a: str, b: str, n: int = 3) -> float:
    sa = {a[i : i + n] for i in range(max(len(a) - n + 1, 1))}
    sb = {b[i : i + n] for i in range(max(len(b) - n + 1, 1))}
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_identical_and_near(spark):
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumps over the lazy cat"
    t3 = "completely unrelated words here"
    df = spark.createDataFrame([(1, t1), (2, t2), (3, t3)], ["doc_id", "text"])
    rows = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, min_jaccard=0.2
        ).collect()
    }
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)] == pytest.approx(_jaccard_py(t1, t2), abs=1e-12)


def test_ngram_jaccard_blocking_prevents_cross_block_pairs(spark):
    t = "same text in both blocks yes"
    df = spark.createDataFrame(
        [(1, t, "en"), (2, t, "en"), (3, t, "fr")], ["doc_id", "text", "lang"]
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, min_jaccard=0.9, block_col="lang"
        ).collect()
    }
    assert pairs == {(1, 2)}  # doc 3 is an identical text but blocked out


def test_ngram_jaccard_stop_shingle_guard(spark):
    # 'aaa...' shingle appears in every doc; max_doc_freq=1 drops it,
    # leaving nothing shared between docs 1 and 2
    df = spark.createDataFrame(
        [(1, "aaaa xyz"), (2, "aaaa qrs")], ["doc_id", "text"]
    )
    with_guard = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.01, max_doc_freq=1
    ).collect()
    without_guard = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.01
    ).collect()
    assert with_guard == [] and len(without_guard) == 1


# ---------------------------------------------------------------------------
# dedup: winnowing fingerprints
# ---------------------------------------------------------------------------

def test_winnow_locality_guarantee(spark):
    """Winnowing's core property (SIGMOD'03 thm): any shared substring
    of length >= k + w - 1 yields at least one shared fingerprint, even
    when the rest of the documents differ completely."""
    k, w = 8, 4
    shared = "the common run of text both documents embed somewhere"
    assert len(shared) >= k + w - 1
    df = spark.createDataFrame(
        [
            (1, "first doc begins oddly " + shared + " then rambles on alone"),
            (2, "completely unlike opening " + shared + " with another tail"),
            (3, "no overlap here at all just unrelated words entirely"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_pairs(
            df, "doc_id", "text", k=k, w=w, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_posts_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared boilerplate text") for i in range(10)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, dedup.winnow_posts(df, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, dedup.winnow_posts(df.repartition(7), "doc_id", "text").collect())
    )
    assert a == b and len(a) > 0


def test_winnow_short_doc_single_fingerprint(spark):
    # shorter than one window -> exactly one fingerprint (global min)
    df = spark.createDataFrame([(1, "tiny")], ["doc_id", "text"])
    posts = dedup.winnow_posts(df, "doc_id", "text", k=8, w=4).collect()
    assert len(posts) == 1


# ---------------------------------------------------------------------------
# dedup: MinHash + LSH
# ---------------------------------------------------------------------------

def test_minhash_identical_docs_collide_distinct_docs_dont(spark):
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, t1), (2, t1.upper()), (3, "zzz completely different qqq www")],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_dedup_pairs(
            df, "doc_id", "text", num_hashes=8, bands=4
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_signature_deterministic(spark):
    df = spark.createDataFrame([(1, "some stable text here")], ["doc_id", "text"])
    s1 = dedup.minhash_signature(df, "doc_id", "text", num_hashes=4).collect()
    s2 = dedup.minhash_signature(df, "doc_id", "text", num_hashes=4).collect()
    assert s1 == s2


# ---------------------------------------------------------------------------
# dedup: SimHash
# ---------------------------------------------------------------------------

def test_simhash_range_and_equality(spark):
    t1 = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, t1), (2, t1 + "!!!"), (3, "entirely different content")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text", bits=16).collect()}
    assert all(0 <= s < 2**16 for s in sigs.values())
    # canonicalization strips '!!!' so 1 and 2 hash identically
    assert sigs[1] == sigs[2]


def test_simhash_pairs_blocked_hamming(spark):
    t1 = "the quick brown fox jumps over the lazy dog and runs far away"
    t2 = t1.replace("dog", "cat")
    df = spark.createDataFrame(
        [(1, t1), (2, t2), (3, "qqq zzz unrelated www vvv")], ["doc_id", "text"]
    )
    sig = dedup.simhash(df, "doc_id", "text", bits=16)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(sig, "doc_id", bits=16, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    # hamming must equal the true bit difference of the signatures
    sigs = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    true_ham = bin(sigs[1] ^ sigs[2]).count("1")
    assert pairs[(1, 2)] == true_ham


def test_connected_components_hand_graph(spark):
    # components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {5,6}; {7} isolated
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["node"])
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (5, 6)], ["id_a", "id_b"]
    )
    cc = {
        r["node"]: r["component"]
        for r in dedup.connected_components(nodes, edges).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_converges_on_cycle(spark):
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["id_a", "id_b"]
    )
    cc = dedup.connected_components(nodes, edges).collect()
    assert {r["component"] for r in cc} == {0}


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_exact_ranks(spark):
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.9, 0.1, 0.0],   # closest to 0
        2: [0.5, 0.5, 0.0],
        3: [0.0, 1.0, 0.0],
        4: [-1.0, 0.0, 0.0],  # farthest from 0
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()], ["vec_id", "embedding"]
    )
    out = ann.cosine_topk(df.filter(F.col("vec_id") == 0), df, k=4)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r["cosine"] == pytest.approx(_cos(vecs[0], vecs[r["neighbor_id"]]), abs=1e-6)
    assert all(r["query_id"] == 0 for r in rows)  # self excluded


def test_lsh_ann_is_subset_of_exact_with_same_scores(spark):
    import random

    rng = random.Random(7)
    data = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(data, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann.cosine_topk(q, df, k=40).collect()
    }
    approx = ann.lsh_ann_topk(q, df, k=5, n_planes=4).collect()
    assert approx  # identical buckets exist for at least self-adjacent vectors
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert r["cosine"] == pytest.approx(exact[key], abs=1e-12)


def _clustered_vectors():
    import random

    rng = random.Random(3)
    data = []
    centers = [[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]]
    for i in range(30):
        c = centers[i % 3]
        data.append((i, [x + rng.uniform(-0.3, 0.3) for x in c]))
    return data


def test_kmeans_fit_separates_clusters(spark):
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.kmeans_fit(df, k=3, iters=4)
    assigned = df.select(
        "vec_id", ann.assign_list(F.col("embedding"), cents).alias("l")
    ).collect()
    # every member of a true cluster lands in the same fitted list
    by_true = {}
    for r in assigned:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["l"])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3


def test_kmeans_deterministic(spark):
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    c1 = ann.kmeans_fit(df, k=3, iters=3)
    c2 = ann.kmeans_fit(df.repartition(7), k=3, iters=3)
    assert c1 == c2  # quantized sums -> partitioning-independent


def test_ivf_full_probe_equals_brute_force(spark):
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.kmeans_fit(df, k=3, iters=3)
    q = df.filter(F.col("vec_id") < 2)
    exact = sorted(
        map(tuple, ann.cosine_topk(q, df, k=5).collect())
    )
    ivf = sorted(
        map(tuple, ann.ivf_topk(q, df, cents, k=5, n_probe=3).collect())
    )
    assert ivf == exact


def test_ivf_single_probe_stays_in_cluster(spark):
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.kmeans_fit(df, k=3, iters=4)
    q = df.filter(F.col("vec_id") == 0)  # true cluster 0
    out = ann.ivf_topk(q, df, cents, k=5, n_probe=1).collect()
    assert len(out) == 5
    assert all(r["neighbor_id"] % 3 == 0 for r in out)  # same true cluster


def test_ivfpq_full_probe_full_shortlist_equals_brute_force(spark):
    # exact re-rank of an everything-shortlist under full probing must
    # reproduce brute force regardless of PQ quantization error
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.seed_centroids(df, k=3)
    books = ann.pq_codebooks(df, cents, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann.cosine_topk(q, df, k=5).collect()
    )
    pq = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann.ivfpq_topk(
            q, df, cents, books, k=5, n_probe=3, shortlist=30
        ).collect()
    )
    assert pq == exact


def test_ivfpq_adc_prefers_true_cluster(spark):
    # with narrow probing the ADC shortlist keeps same-cluster vectors
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.kmeans_fit(df, k=3, iters=4)
    books = ann.pq_codebooks(df, cents, m=2, ksub=4)
    out = ann.ivfpq_topk(
        df.filter(F.col("vec_id") == 0), df, cents, books, k=5, n_probe=1
    ).collect()
    assert len(out) == 5
    assert all(r["neighbor_id"] % 3 == 0 for r in out)
    # adc_dist is a genuine distance: nonnegative, finite
    assert all(r["adc_dist"] >= 0 for r in out)


def test_ivfpq_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(_clustered_vectors(), ["vec_id", "embedding"])
    cents = ann.seed_centroids(df, k=3)
    books = ann.pq_codebooks(df, cents, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    a = sorted(map(tuple, ann.ivfpq_topk(q, df, cents, books, k=3).collect()))
    b = sorted(
        map(
            tuple,
            ann.ivfpq_topk(
                q.repartition(5), df.repartition(7), cents, books, k=3
            ).collect(),
        )
    )
    assert a == b


def test_lsh_bucket_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.1, 0.9]), (2, [-0.5, 0.25, -0.1, -0.9])],
        ["vec_id", "embedding"],
    )
    b = df.select(ann.lsh_bucket(F.col("embedding"), n_planes=5).alias("b")).collect()
    assert all(0 <= r["b"] < 32 for r in b)
    b2 = df.select(ann.lsh_bucket(F.col("embedding"), n_planes=5).alias("b")).collect()
    assert b == b2


# ---------------------------------------------------------------------------
# sampling / splits
# ---------------------------------------------------------------------------

def test_bigram_fluency_rewards_predictable_text(spark):
    from kafka_connect_bigquery_spark.functions import text as text_fns

    # docs 1-3 share the same phrasing (high-probability bigrams);
    # doc 4 is one-off word soup (every bigram unique)
    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, common),
        (2, common),
        (3, common),
        (4, "zeta omega kappa lambda sigma upsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc"]: r for r in text_fns.bigram_fluency(df, "doc_id", "text").collect()}
    # 'the' branches (quick|lazy, p=1/2 each); the other 6 bigrams are
    # deterministic -> mean = (6*1e6 + 2*5e5) / 8
    assert out[1]["fluency"] == 875000.0
    assert out[1]["n_bigrams"] == 8
    # identical docs score identically
    assert out[2]["lm_score_q"] == out[1]["lm_score_q"]
    # the discriminating case: one doc reusing a shared prefix
    df2 = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "to go")], ["doc_id", "text"]
    )
    out2 = {
        r["doc"]: r for r in text_fns.bigram_fluency(df2, "doc_id", "text").collect()
    }
    # 'to' is followed by be/be/go across the corpus: p(be|to)=2/3,
    # p(go|to)=1/3 -> doc 2's single bigram scores 333333
    assert out2[2]["lm_score_q"] == 333333
    assert out2[2]["n_bigrams"] == 1
    # doc 1: bigrams to-be(2x @666666), be-or, or-not, not-to (1e6 each)
    assert out2[1]["lm_score_q"] == 2 * 666666 + 3 * text_fns.LM_Q


def test_bigram_fluency_partitioning_independent(spark):
    from kafka_connect_bigquery_spark.functions import text as text_fns

    rows = [(i, f"alpha beta gamma delta w{i} alpha beta") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, text_fns.bigram_fluency(df, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            text_fns.bigram_fluency(df.repartition(13), "doc_id", "text").collect(),
        )
    )
    assert a == b


def test_mixture_rebalance_flattens_dominant_sources(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = [(i, "big" if i < 1600 else "small") for i in range(1700)]
    df = spark.createDataFrame(rows, ["id", "source"])
    out = sampling.mixture_rebalance(df, "id", "source", alpha=0.5)
    kept = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    # rarest source keeps everything (rate 1.0)
    assert by_src["small"] == 100
    # dominant source keeps ~sqrt(100/1600)=25% of its 1600 docs
    assert 300 < by_src["big"] < 500
    # alpha=1 keeps the corpus unchanged
    assert sampling.mixture_rebalance(df, "id", "source", alpha=1.0).count() == 1700


def test_mixture_rebalance_partitioning_independent(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "source"])
    a = sorted(r["id"] for r in sampling.mixture_rebalance(df, "id", "source").collect())
    b = sorted(
        r["id"]
        for r in sampling.mixture_rebalance(df.repartition(11), "id", "source").collect()
    )
    assert a == b


def test_register_views_sql_surface(spark, sf_dir):
    from kafka_connect_bigquery_spark.session import register_views

    register_views(spark, sf_dir, ["documents", "events"])
    n = spark.sql("SELECT COUNT(*) AS n FROM documents").first()["n"]
    assert n == 500
    # event-time functions work through the view (LTZ normalization held)
    r = spark.sql(
        "SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events "
        "GROUP BY 1 ORDER BY c DESC, h LIMIT 1"
    ).first()
    assert r["c"] > 0


def test_sample_k_per_group_exact_counts_and_stability(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sampling.sample_k_per_group(df, "id", "grp", 4)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 4, "b": 4, "c": 4, "rare": 1}  # min(k, |group|)
    # stable under repartitioning (deterministic hash order)
    a = sorted((r["id"], r["sample_rank"]) for r in out.collect())
    b = sorted(
        (r["id"], r["sample_rank"])
        for r in sampling.sample_k_per_group(df.repartition(7), "id", "grp", 4).collect()
    )
    assert a == b


def test_split_dataset_stable_and_proportional(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    s1 = sampling.split_dataset(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    s2 = sampling.split_dataset(df.repartition(7), "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    m1 = {r["id"]: r["split"] for r in s1.collect()}
    m2 = {r["id"]: r["split"] for r in s2.collect()}
    assert m1 == m2  # partitioning-independent
    from collections import Counter

    c = Counter(m1.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03


def test_hash_sample_rate_and_salt_independence(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    a = {r["id"] for r in sampling.hash_sample(df, "id", 0.3, salt="a").collect()}
    b = {r["id"] for r in sampling.hash_sample(df, "id", 0.3, salt="b").collect()}
    assert abs(len(a) / 2000 - 0.3) < 0.05
    assert a != b  # different salts draw different subsets
    overlap = len(a & b) / max(len(a), 1)
    assert 0.1 < overlap < 0.5  # ~rate-level overlap, not correlated


def test_stratified_sample_per_group_rates(spark):
    from collections import Counter

    from kafka_connect_bigquery_spark.operators import sampling

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = sampling.stratified_hash_sample(df, "id", "g", {"a": 1.0, "b": 0.3})
    c = Counter(r["g"] for r in out.collect())
    assert c["a"] == 1000  # rate 1.0 keeps everything
    assert abs(c["b"] / 1000 - 0.3) < 0.06
    assert c["c"] == 0  # unlisted stratum -> default_rate 0


def test_split_fractions_validated(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    with pytest.raises(ValueError, match="sum to 1"):
        sampling.assign_split(F.col("x"), {"a": 0.5, "b": 0.4})


# ---------------------------------------------------------------------------
# approximate aggregates
# ---------------------------------------------------------------------------

def test_approx_stats_error_bounds(spark, sf_dir):
    """The tolerance-contract booleans must all hold: each sketch value
    stays inside its published error bound vs the exact aggregate
    computed in the same query (this is what the DuckDB oracle asserts
    via literal TRUE columns)."""
    from kafka_connect_bigquery_spark.queries import q_events_approx_stats
    from kafka_connect_bigquery_spark.session import read_table

    rows = {r["event_type"]: r for r in q_events_approx_stats(spark, sf_dir).collect()}
    e = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, a in rows.items():
        assert a["exact_users"] == exact[et]["users"]
        assert a["n_events"] == exact[et]["n"]
        assert a["hll_ok"], f"HLL++ out of 3*rsd bound for {et}"
        for p in ("p50_ok", "p95_ok", "p99_ok"):
            assert a[p], f"percentile_approx out of rank band for {et}: {p}"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_predict_lang_on_obvious_sentences(spark):
    rows = [
        (1, "the cat and the dog of a house"),
        (2, "der Hund und die Katze und das Haus"),
        (3, "le chat et la maison et les chiens"),
        (4, "el gato y los perros que corren"),
        (5, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["p"]
        for r in df.select("id", text_fns.predict_lang(F.col("text")).alias("p")).collect()
    }
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_token_counts_and_quality_bounds(spark):
    df = spark.createDataFrame([(1, "The the the unique words here 123!")], ["id", "text"])
    r = df.select(
        text_fns.token_count(F.col("text")).alias("n"),
        text_fns.unique_token_count(F.col("text")).alias("u"),
        text_fns.quality_score(F.col("text")).alias("q"),
    ).first()
    assert r["n"] == 7  # the x3, unique, words, here, 123
    assert r["u"] == 5
    assert 0.0 <= r["q"] <= 1.0


def test_quality_features_ratios(spark):
    df = spark.createDataFrame([(1, "ab 12")], ["id", "text"])
    ft = text_fns.quality_features(F.col("text"))
    r = df.select(*[v.alias(k) for k, v in ft.items()]).first()
    assert r["n_chars"] == 5
    assert r["n_tokens"] == 2
    assert r["alpha_ratio"] == pytest.approx(2 / 5)
    assert r["digit_ratio"] == pytest.approx(2 / 5)
    assert r["unique_ratio"] == pytest.approx(1.0)


def test_subword_count_bpe_ish(spark):
    # "hello," -> hello + ","  |  "x2y" -> x + 2 + y
    df = spark.createDataFrame([(1, "Hello, x2y!")], ["id", "text"])
    r = df.select(text_fns.subword_count(F.col("text")).alias("n")).first()
    assert r["n"] == 6  # hello , x 2 y !


def test_rolling_hash_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "alpha beta")], ["id", "text"]
    )
    got = {
        r["id"]: r["h"]
        for r in df.select("id", text_fns.rolling_hash(F.col("text")).alias("h")).collect()
    }
    assert got[1] == got[3]          # deterministic
    assert got[1] != got[2]          # order matters (unlike md5 fingerprint)
    # matches the python reference fold
    import hashlib

    def ref(text):
        acc = 0
        for t in text.split(" "):
            th = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            acc = (acc * text_fns.ROLL_B + th) % text_fns.ROLL_M
        return acc

    assert got[1] == ref("alpha beta")


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_decode_schema_and_determinism(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    packed = multimodal.pack_payload(df, "doc_id", "text")
    assert dict(packed.dtypes)["payload"] == "binary"
    out = multimodal.decode_image_meta(packed)
    assert out.schema == multimodal.IMAGE_META_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    md5_hello = hashlib.md5(b"hello").hexdigest()
    assert rows[1]["content_md5"] == md5_hello
    assert rows[1]["n_bytes"] == 5
    assert rows[1]["width"] == 1 + int(md5_hello[0:2], 16)
    assert rows[1]["height"] == 1 + int(md5_hello[2:4], 16)
    assert rows[1]["n_frames"] == 1 + 5 % 7


def _synth_png(width: int, height: int, n_frames: int | None = None) -> bytes:
    """A minimal valid PNG built with stdlib only (struct + zlib):
    signature, IHDR, optional APNG acTL, one IDAT scanline set, IEND."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if n_frames is not None:
        out += chunk(b"acTL", struct.pack(">II", n_frames, 0))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _synth_wav(rate: int, n_samples: int, channels: int) -> bytes:
    """A minimal valid PCM WAV built with stdlib only (struct)."""
    import struct

    block = channels * 2  # 16-bit PCM
    data = b"\x01\x00" * (n_samples * channels)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_png_decoder_parses_synthesized_files():
    """decode_image_real is a real stdlib PNG parser, not a promise:
    it parses synthesized valid PNGs (incl. APNG frame counts) and
    rejects corrupt ones loudly."""
    assert multimodal.decode_image_real(_synth_png(640, 480)) == (640, 480, 1)
    assert multimodal.decode_image_real(_synth_png(3, 2, n_frames=7)) == (3, 2, 7)
    with pytest.raises(ValueError, match="bad signature"):
        multimodal.decode_image_real(b"\x89PNG")
    corrupt = bytearray(_synth_png(10, 10))
    corrupt[18] ^= 0xFF  # flip a width byte -> IHDR CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_image_real(bytes(corrupt))


def test_real_wav_decoder_parses_synthesized_files():
    assert multimodal.decode_audio_real(_synth_wav(16000, 40000, 1)) == (
        16000,
        40000,
        1,
    )
    assert multimodal.decode_audio_real(_synth_wav(8000, 0, 2)) == (8000, 0, 2)
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_audio_real(b"nope")
    with pytest.raises(ValueError, match="missing fmt"):
        multimodal.decode_audio_real(b"RIFF\x04\x00\x00\x00WAVE")


def test_real_decoders_drive_pipeline_end_to_end(spark):
    """The production path exists: real PNG/WAV bytes flow through the
    same mapInPandas plumbing and downstream stages as the stand-in,
    with decode_image_real/decode_audio_real plugged into the seam."""
    png_rows = [
        (1, bytearray(_synth_png(640, 480, n_frames=5))),
        (2, bytearray(_synth_png(1920, 1080))),
    ]
    packed = spark.createDataFrame(png_rows, "doc_id: long, payload: binary")
    meta = multimodal.decode_image_meta(packed, decoder=multimodal.decode_image_real)
    got = {r["doc_id"]: r for r in meta.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (640, 480, 5)
    assert (got[2]["width"], got[2]["height"], got[2]["n_frames"]) == (1920, 1080, 1)
    idx = sorted(
        (r["doc_id"], r["frame_index"])
        for r in multimodal.sample_frames(meta, every_nth=2).collect()
    )
    assert idx == [(1, 0), (1, 2), (1, 4), (2, 0)]

    wav_rows = [
        (1, bytearray(_synth_wav(16000, 40000, 1))),
        (2, bytearray(_synth_wav(8000, 0, 2))),  # empty audio: zero chunks
    ]
    packed_a = spark.createDataFrame(wav_rows, "doc_id: long, payload: binary")
    ameta = multimodal.decode_audio_meta(packed_a, decoder=multimodal.decode_audio_real)
    chunks = multimodal.chunk_audio(ameta, chunk_seconds=1)
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["start_sample"], r["end_sample"])
        )
    assert sorted(by_doc[1]) == [(0, 0, 16000), (1, 16000, 32000), (2, 32000, 40000)]
    # the n_samples=0 guard: no bogus descending-sequence rows
    assert 2 not in by_doc


def test_sample_frames_indices(spark):
    df = spark.createDataFrame([(1, 5), (2, 1)], ["doc_id", "n_frames"])
    got = sorted(
        (r["doc_id"], r["frame_index"])
        for r in multimodal.sample_frames(df, every_nth=2).collect()
    )
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0)]


def test_extract_features_deterministic_unit_range(spark):
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    packed = multimodal.pack_payload(df, "doc_id", "text")
    r = multimodal.extract_features(packed).first()
    assert len(r["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in r["feature"])
    md5_hello = hashlib.md5(b"hello").hexdigest()
    expect0 = int(md5_hello[0:8], 16) / float(0xFFFFFFFF)
    assert r["feature"][0] == pytest.approx(expect0, abs=0)


def test_resize_stub_declares_target_dims(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], ["doc_id", "payload"])
    out = multimodal.resize_stub(df, target=(128, 96))
    r = out.first()
    assert (r["resized_width"], r["resized_height"]) == (128, 96)


def test_codec_seam_is_swappable_end_to_end(spark):
    """Contract test for the declared codec seam: a plugged-in decoder
    (decode_image_real's signature) must produce IMAGE_META_SCHEMA
    output and drive the frame-sampling + feature pipeline unchanged."""
    import struct

    # defined inside the test so cloudpickle ships it by value (test
    # modules aren't importable on executors) — a real codec would live
    # in an installed package and pickle by reference
    def _fake_png_decoder(payload: bytes) -> tuple[int, int, int]:
        w, h, n = struct.unpack(">III", payload[:12])
        return int(w), int(h), int(n)

    rows = [
        (1, bytearray(struct.pack(">III", 640, 480, 5) + b"imgdata-a")),
        (2, bytearray(struct.pack(">III", 1920, 1080, 1) + b"imgdata-b")),
    ]
    packed = spark.createDataFrame(rows, "doc_id: long, payload: binary")

    meta = multimodal.decode_image_meta(packed, decoder=_fake_png_decoder)
    assert meta.schema == multimodal.IMAGE_META_SCHEMA
    got = {r["doc_id"]: r for r in meta.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (640, 480, 5)
    assert (got[2]["width"], got[2]["height"], got[2]["n_frames"]) == (1920, 1080, 1)
    # n_bytes/content_md5 come from the plumbing, not the codec
    assert got[1]["n_bytes"] == 12 + len(b"imgdata-a")
    assert got[1]["content_md5"] == hashlib.md5(bytes(rows[0][1])).hexdigest()

    # downstream stages run unchanged on codec-decoded metadata
    frames = multimodal.sample_frames(meta, every_nth=2)
    idx = sorted((r["doc_id"], r["frame_index"]) for r in frames.collect())
    assert idx == [(1, 0), (1, 2), (1, 4), (2, 0)]

    feats = multimodal.extract_features(packed)
    assert feats.schema == multimodal.FEATURES_SCHEMA
    assert feats.count() == 2


def test_audio_seam_is_swappable_and_chunking_runs_unchanged(spark):
    """Contract test for the audio decoder seam: an AudioDecoder-shaped
    callable must produce AUDIO_META_SCHEMA output and drive the
    chunking stage unchanged."""
    import struct

    def _fake_wav_decoder(payload: bytes) -> tuple[int, int, int]:
        rate, n, ch = struct.unpack(">III", payload[:12])
        return int(rate), int(n), int(ch)

    rows = [
        # 2.5 s mono @16k -> 3 chunks of 1 s
        (1, bytearray(struct.pack(">III", 16000, 40000, 1) + b"wav-a")),
        # exactly 2 s stereo @8k -> 2 chunks, no short tail
        (2, bytearray(struct.pack(">III", 8000, 16000, 2) + b"wav-b")),
    ]
    packed = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    meta = multimodal.decode_audio_meta(packed, decoder=_fake_wav_decoder)
    assert meta.schema == multimodal.AUDIO_META_SCHEMA
    got = {r["doc_id"]: r for r in meta.collect()}
    assert (got[1]["sample_rate"], got[1]["n_samples"], got[1]["n_channels"]) == (
        16000,
        40000,
        1,
    )
    assert got[2]["content_md5"] == hashlib.md5(bytes(rows[1][1])).hexdigest()

    chunks = multimodal.chunk_audio(meta, chunk_seconds=1)
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["start_sample"], r["end_sample"])
        )
    assert sorted(by_doc[1]) == [
        (0, 0, 16000),
        (1, 16000, 32000),
        (2, 32000, 40000),  # truncated tail
    ]
    assert sorted(by_doc[2]) == [(0, 0, 8000), (1, 8000, 16000)]


def test_chunk_audio_empty_audio_emits_no_rows(spark):
    """n_samples=0 must yield zero chunk rows, not the descending
    sequence(0,-1) artifact rows (chunk_index -1, negative offsets)."""
    df = spark.createDataFrame(
        [(1, 16000, 0, 1), (2, 16000, 100, 1)],
        "doc_id: long, sample_rate: long, n_samples: long, n_channels: long",
    )
    got = {r["doc_id"]: r for r in multimodal.chunk_audio(df, chunk_seconds=1).collect()}
    assert set(got) == {2}
    assert (got[2]["chunk_index"], got[2]["start_sample"], got[2]["end_sample"]) == (
        0,
        0,
        100,
    )


def test_codec_seam_default_matches_standin(spark):
    """Omitting the decoder keeps the deterministic md5 stand-in —
    the oracle-checked behavior — byte-identical."""
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    packed = multimodal.pack_payload(df, "doc_id", "text")
    r = multimodal.decode_image_meta(packed).first()
    m = hashlib.md5(b"hello").hexdigest()
    assert r["width"] == 1 + int(m[0:2], 16)
    assert r["height"] == 1 + int(m[2:4], 16)
    assert r["n_frames"] == 1 + (r["n_bytes"] % 7)


# ---------------------------------------------------------------------------
# registry hygiene: every entry witnessed, no silent gaps
# ---------------------------------------------------------------------------


def test_registry_every_entry_has_oracle_and_order_is_consistent():
    """Guards the correctness-gate contract as the registry grows:
    (1) every registry entry carries oracle SQL (entries exempted for
    genuinely non-SQL-expressible ops must be listed here explicitly —
    currently none, the approx-sketch query has a tolerance-contract
    oracle); (2) every _PRIORITY_ORDER name resolves to a real entry
    (a typo would silently drop it from the witnessing window); (3) the
    three registry modules never shadow each other's keys (dict.update
    would silently keep only one)."""
    from kafka_connect_bigquery_spark import queries, queries_ext, queries_windows

    declared_no_oracle: set[str] = set()

    full = queries._full_registry()
    missing = {
        n for n, (_, sql) in full.items() if sql is None
    } - declared_no_oracle
    assert not missing, f"registry entries without oracle SQL: {sorted(missing)}"

    dangling = set(queries._PRIORITY_ORDER) - set(full)
    assert not dangling, f"_PRIORITY_ORDER names not in registry: {sorted(dangling)}"

    k1, k2, k3 = (
        set(queries.REGISTRY),
        set(queries_ext.REGISTRY),
        set(queries_windows.REGISTRY),
    )
    assert not (k1 & k2) and not (k1 & k3) and not (k2 & k3), (
        "registry key collision across modules"
    )
    assert len(full) == len(k1) + len(k2) + len(k3)
    # and the public surface agrees with the registry
    assert set(queries.queries()) == set(full)
    assert set(queries.oracle_sql()) == set(full) - declared_no_oracle


def test_semantic_dedup_within_cluster_only(spark):
    # two tight clusters around e1 and e2; 10/11 are near-dups of their
    # cluster seed, 20 is identical to 10 but assigned to the OTHER
    # cluster seed's list — cross-cluster dups are missed BY DESIGN
    vecs = {
        0: [1.0, 0.0],
        1: [0.0, 1.0],
        10: [0.99, 0.01],
        11: [0.02, 0.98],
        20: [0.55, 0.45],  # nearer cluster 0, but not a near-dup of anything there
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()], ["vec_id", "embedding"]
    )
    cents = ann.seed_centroids(df, k=2)
    out = {
        r["vec_id"]: (r["list_id"], r["keep"])
        for r in dedup.semantic_dedup(df, cents, min_cosine=0.95).collect()
    }
    assert len(out) == 5
    assert out[0] == (0, True) and out[1] == (1, True)
    assert out[10] == (0, False)  # dup of 0 within cluster 0
    assert out[11] == (1, False)  # dup of 1 within cluster 1
    assert out[20][1] is True     # same cluster as 0 but below threshold


def test_semantic_dedup_matches_bruteforce(spark):
    import random

    rng = random.Random(13)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(6)]
    rows = []
    for i in range(40):
        b = base[i % 6]
        rows.append((i, [x + rng.uniform(-0.02, 0.02) for x in b]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ann.seed_centroids(df, k=4)
    got = {
        r["vec_id"]: (r["list_id"], r["keep"])
        for r in dedup.semantic_dedup(df, cents, min_cosine=0.98).collect()
    }

    # brute-force replay of the same policy (float cosine: thresholds
    # here are far from any quantization boundary)
    def assign(v):
        dists = [sum((x - c) ** 2 for x, c in zip(v, cent)) for cent in cents]
        return dists.index(min(dists))

    lists = {i: assign(v) for i, v in rows}
    keep = {}
    for i, v in rows:
        keep[i] = not any(
            j < i and lists[j] == lists[i] and _cos(dict(rows)[j], v) >= 0.98
            for j, _ in rows
        )
    assert {i: lists[i] for i in lists} == {i: got[i][0] for i in got}
    assert keep == {i: got[i][1] for i in got}
    assert sum(1 for k in keep.values() if not k) > 5  # dups actually found


def test_bm25_idf_and_length_normalization(spark):
    docs = [
        (0, "rare common common filler filler filler"),
        (1, "common common common filler filler filler"),
        (2, "rare filler filler filler filler filler filler filler "
            "filler filler filler filler filler filler filler filler"),
        (3, "common filler filler"),
        (4, "filler filler filler"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc"]: r
        for r in text_fns.bm25_scores(
            df, "doc_id", "text", ["rare", "common"]
        ).collect()
    }
    assert 4 not in out                       # no query term -> no row
    assert out[0]["n_terms"] == 2 and out[2]["n_terms"] == 1
    # 'rare' (df=2) outranks 'common' (df=3): doc0 > doc1 at equal length
    assert out[0]["score_q"] > out[1]["score_q"]
    # length normalization: 'rare' appears once in both doc0 and doc2,
    # but doc2 is much longer, so its score is lower
    assert out[2]["score_q"] < out[0]["score_q"]
    # score is score_q on the 1/Q lattice
    assert out[0]["score"] == out[0]["score_q"] / text_fns.BM25_Q


def test_bm25_matches_pure_python(spark):
    import math

    docs = [
        (0, "a b c a"),
        (1, "b c d"),
        (2, "a a a a a"),
        (3, "d e f g h i"),
    ]
    terms = ["a", "d"]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc"]: (r["score_q"], r["n_terms"])
        for r in text_fns.bm25_scores(df, "doc_id", "text", terms).collect()
    }
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    exp = {}
    for i, t in toks.items():
        s, m = 0, 0
        for term in terms:
            tf = t.count(term)
            if not tf:
                continue
            dfq = sum(1 for tt in toks.values() if term in tt)
            idf_q = math.floor(
                math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5)) * text_fns.BM25_Q + 0.5
            )
            tfnorm = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
            s += math.floor(tfnorm * idf_q + 0.5)
            m += 1
        if m:
            exp[i] = (s, m)
    assert got == exp


def test_weighted_sample_deterministic_and_proportional(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = [(i, (i % 10 + 1) * 10) for i in range(2000)]  # weights 10..100
    df = spark.createDataFrame(rows, "id: bigint, w: bigint")
    out = sampling.weighted_sample(df, "id", "w", cap=100.0)
    got = {(r["id"], r["p_sample"]) for r in out.collect()}
    # deterministic across invocations and partitionings
    got2 = {
        (r["id"], r["p_sample"])
        for r in sampling.weighted_sample(df.repartition(7), "id", "w", cap=100.0).collect()
    }
    assert got == got2
    # p clamps at 1: every weight-100 row is kept with certainty
    full = {i for i, w in rows if w == 100}
    assert full <= {i for i, _ in got}
    assert all(p == 1.0 for i, p in got if i in full)
    # inclusion tracks weight: keep-rate of weight-20 rows well below weight-80
    def rate(w):
        ids = {i for i, ww in rows if ww == w}
        return len(ids & {i for i, _ in got}) / len(ids)
    assert rate(20) < 0.35 and rate(80) > 0.65


def test_rrf_fuse_integer_scores_and_ranks(spark):
    from kafka_connect_bigquery_spark.operators import search

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id: long, doc_id: long, rank: int"
    )
    dense = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id: long, doc_id: long, rank: int"
    )
    out = {
        r["doc_id"]: (r["score_q"], r["n_lists"], r["rank"])
        for r in search.rrf_fuse([lex, dense], k=60, top_k=10).collect()
    }
    q = search.RRF_Q
    # doc 11: rank 2 lexically + rank 1 densely
    assert out[11] == (q // 62 + q // 61, 2, 1)
    assert out[10] == (q // 61, 1, 2)  # ties under: 13 same score, higher id
    assert out[13] == (q // 62, 1, 3)
    assert out[12] == (q // 63, 1, 4)


def test_jaccard_rank_orders_by_overlap(spark):
    from kafka_connect_bigquery_spark.operators import search

    docs = spark.createDataFrame(
        [
            (0, "abcdefgh"),
            (1, "abcdefgx"),   # near-identical to 0
            (2, "abcdzzzz"),   # partial overlap
            (3, "qqqqqqqq"),   # disjoint
        ],
        ["doc_id", "text"],
    )
    out = search.jaccard_rank(
        docs.filter("doc_id = 0"), docs, "doc_id", "text", top_n=5, max_doc_freq=None
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2]  # 3 shares no trigram; self excluded
    assert all(r["query_id"] == 0 for r in out)


def test_contrastive_pairs_labels_and_determinism(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    pos = spark.createDataFrame([(1, 2), (3, 4)], "a: bigint, b: bigint")
    ids = spark.createDataFrame([(i,) for i in range(50)], "vec_id: bigint")
    out = sampling.contrastive_pairs(
        pos, ids, "vec_id", n_negatives=3, pool_rate=0.5
    )
    rows = {(r["anchor"], r["item"], r["label"]) for r in out.collect()}
    rows2 = {
        (r["anchor"], r["item"], r["label"])
        for r in sampling.contrastive_pairs(
            pos, ids.repartition(7), "vec_id", n_negatives=3, pool_rate=0.5
        ).collect()
    }
    assert rows == rows2  # partitioning-independent
    assert (1, 2, 1) in rows and (3, 4, 1) in rows
    negs = {(a, i) for a, i, l in rows if l == 0}
    assert {a for a, _ in negs} == {1, 3}
    assert all(len([i for a2, i in negs if a2 == a]) == 3 for a in (1, 3))
    # a negative is never a known positive (either orientation) or self
    assert all(i != a and (a, i) not in {(1, 2), (2, 1), (3, 4), (4, 3)} for a, i in negs)


def test_random_projection_preserves_relative_distances(spark):
    import math
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = {
        r["vec_id"]: r["projection"]
        for r in ann.random_projection(df, out_dim=16).collect()
    }
    assert all(len(p) == 16 for p in proj.values())
    # determinism across partitionings
    proj2 = {
        r["vec_id"]: r["projection"]
        for r in ann.random_projection(df.repartition(5), out_dim=16).collect()
    }
    assert proj == proj2

    # JL sanity: distance CORRELATION survives (rank the pairs both ways)
    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    vecs = dict(rows)
    pairs = [(i, j) for i in range(30) for j in range(i + 1, 30)]
    orig = sorted(pairs, key=lambda p: d(vecs[p[0]], vecs[p[1]]))
    prj = sorted(pairs, key=lambda p: d(proj[p[0]], proj[p[1]]))
    # Spearman-ish check: the closest decile by original distance stays
    # in the closest half under projection
    close = set(orig[: len(orig) // 10])
    first_half = set(prj[: len(prj) // 2])
    assert len(close & first_half) / len(close) > 0.8


# ---------------------------------------------------------------------------
# dedup: exact-substring duplicated runs
# ---------------------------------------------------------------------------


def _runs(spark, rows, n=5):
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    return {
        r["doc_id"]: r.asDict()
        for r in dedup.substring_run_stats(df, "doc_id", "text", n=n).collect()
    }


def test_substring_runs_shared_span_marked_on_both_docs(spark):
    out = _runs(
        spark,
        [
            (1, "a b c d e f g x y z"),      # shares a..g with doc 2
            (2, "q w a b c d e f g r t"),
            (3, "totally unique text here nothing shared at all"),
        ],
    )
    # 7 shared tokens -> 3 duplicated 5-gram starts merging into 1 run of 7
    for doc in (1, 2):
        assert out[doc]["n_dup_starts"] == 3
        assert out[doc]["n_dup_runs"] == 1
        assert out[doc]["longest_dup_run"] == 7
        assert out[doc]["dup_covered_tokens"] == 7
    assert out[3]["n_dup_runs"] == 0 and out[3]["dup_pct"] == 0


def test_substring_runs_interval_union_merges_overlaps(spark):
    # doc 1 contains TWO copies of the shared span separated by one
    # unique token: runs must not merge across the gap token ONLY if
    # the gap exceeds adjacency; here "a b c d e" twice with 1 gap
    # token => two distinct 5-gram start positions 0 and 6, intervals
    # [0,4] and [6,10]: disjoint, 2 runs
    out = _runs(
        spark,
        [
            (1, "a b c d e zz a b c d e"),
            (2, "a b c d e"),
        ],
    )
    assert out[1]["n_dup_runs"] == 2
    assert out[1]["dup_covered_tokens"] == 10
    assert out[1]["longest_dup_run"] == 5
    assert out[2]["n_dup_runs"] == 1 and out[2]["dup_covered_tokens"] == 5


def test_substring_runs_intra_doc_repeat_alone_not_counted(spark):
    # the repeated phrase lives only inside doc 1 (doc freq 1): by the
    # inter-document definition nothing is marked
    out = _runs(
        spark,
        [
            (1, "a b c d e zz a b c d e"),
            (2, "completely different words in this one right here"),
        ],
    )
    assert out[1]["n_dup_runs"] == 0 and out[2]["n_dup_runs"] == 0


def test_substring_runs_short_docs_and_coverage_pct(spark):
    out = _runs(
        spark,
        [
            (1, "a b c"),                # < n tokens: no grams, all zero
            (2, "a b c d e f g h i j"),  # 10 tokens, 5 shared
            (3, "x a b c d e y z w v"),
        ],
    )
    assert out[1]["n_tokens"] == 3 and out[1]["n_dup_starts"] == 0
    assert out[2]["dup_covered_tokens"] == 5
    assert out[2]["dup_pct"] == 50
    assert out[3]["dup_pct"] == 50


def test_containment_catches_subset_doc_jaccard_misses(spark):
    short = "alpha beta gamma delta"
    filler = " ".join(f"w{i}x y{i}z" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, short + " " + filler), (3, "unrelated stuff entirely")],
        "doc_id: bigint, text: string",
    )
    out = {
        (r["id_a"], r["id_b"]): r.asDict()
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, min_containment_pct=80
        ).collect()
    }
    assert (1, 2) in out
    pair = out[(1, 2)]
    assert pair["containment_pct"] >= 90      # short doc ~fully contained
    assert pair["jaccard_pct"] < 50           # union-diluted: jaccard misses it
    assert not any(3 in k for k in out)


def test_containment_integer_ratios_and_ordering(spark):
    df = spark.createDataFrame(
        [(5, "aaa bbb ccc"), (2, "aaa bbb ccc ddd")],
        "doc_id: bigint, text: string",
    )
    rows = dedup.containment_pairs(
        df, "doc_id", "text", n=3, min_containment_pct=50
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["id_a"] < r["id_b"]
    assert isinstance(r["containment_pct"], int)
    assert r["containment_pct"] == r["inter_size"] * 100 // min(
        r["size_a"], r["size_b"]
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_scores_target_vocabulary_positive(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = (
        # target domain: medical-ish vocabulary
        [(i, "patient dosage clinical trial outcome measured", True) for i in range(4)]
        # raw-only majority: totally disjoint vocabulary (the raw pool
        # must dwarf the target for the LLR sign to be informative —
        # DSIR's raw distribution contains the target docs too)
        + [(10 + i, "pizza recipe cheese oven crispy crust", False) for i in range(12)]
        # held-out doc written in the target's exact phrasing
        + [(99, "patient dosage clinical trial outcome measured", False)]
    )
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string, tgt: boolean")
    out = {
        r["doc_id"]: r.asDict()
        for r in sampling.dsir_weights(
            df, "doc_id", "text", F.col("tgt"), buckets=256
        ).collect()
    }
    assert len(out) == 17
    # the held-out target-vocab doc scores positive; raw-only docs negative
    assert out[99]["dsir_logw_q"] > 0 and out[99]["target_like"]
    for i in range(12):
        assert out[10 + i]["dsir_logw_q"] < 0
        assert not out[10 + i]["target_like"]


def test_dsir_deterministic_across_partitionings(spark):
    from kafka_connect_bigquery_spark.operators import sampling

    rows = [
        (i, f"tok{i % 7} shared words here tok{i % 5} more", i % 3 == 0)
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, "doc_id: bigint, text: string, tgt: boolean")
    df2 = df1.repartition(13)
    get = lambda d: {
        r["doc_id"]: r["dsir_logw_q"]
        for r in sampling.dsir_weights(d, "doc_id", "text", F.col("tgt")).collect()
    }
    assert get(df1) == get(df2)


def test_vocab_growth_monotone_and_hand_checked(spark):
    from kafka_connect_bigquery_spark.queries_ext import q_docs_vocab_growth
    import tempfile, os, shutil

    tmp = tempfile.mkdtemp()
    try:
        docs = spark.createDataFrame(
            [
                (10, "a b c", "en", "s", 5),
                (20, "a b d", "en", "s", 5),   # adds 'd' only
                (30, "a b c", "en", "s", 5),   # adds nothing
                (40, "e f", "en", "s", 3),     # adds e, f
            ],
            "doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
        )
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = {
            r["step"]: r.asDict()
            for r in q_docs_vocab_growth(spark, tmp).collect()
        }
        assert len(rows) == 10
        # thresholds span doc_id 10..40; curve is monotone in both axes
        seq = [rows[k] for k in sorted(rows)]
        for a, b in zip(seq, seq[1:]):
            assert b["n_tokens_cum"] >= a["n_tokens_cum"]
            assert b["vocab_size"] >= a["vocab_size"]
        assert seq[-1]["n_tokens_cum"] == 11
        assert seq[-1]["vocab_size"] == 6  # a b c d e f
        # first threshold covers only doc 10+... step1 = 10+(30*1 DIV 10)=13
        assert seq[0]["vocab_size"] == 3 and seq[0]["n_tokens_cum"] == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
