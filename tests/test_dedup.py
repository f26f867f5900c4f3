"""Dedup suite semantics on controlled fixtures."""

import pytest
from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "tiny"),  # fewer tokens than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["text_hash"]: r for r in D.exact_dedup(docs).collect()}
    groups = {tuple(sorted((r["n_docs"], r["keep_doc_id"])))for r in out.values()}
    # 1 and 2 collapse to one group keeping min id 1
    assert (2, 1) in {(r["n_docs"], r["keep_doc_id"]) for r in out.values()}
    assert sum(r["n_docs"] for r in out.values()) == 5


def test_minhash_identical_docs_have_identical_signatures(docs):
    sig = D.minhash_signatures(docs).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["perm"]] = r["minhash"]
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[4]
    # doc 5 has no 3-gram shingles -> absent
    assert 5 not in by_doc
    assert len(by_doc[1]) == D.DEFAULT_N_PERM


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs  # identical docs always collide in every band
    assert all(a < b for a, b in pairs)


def test_simhash_similarity_ordering(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[1] == sh[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # near-dup is closer in hamming distance than unrelated content
    assert hamming(sh[1], sh[3]) < hamming(sh[1], sh[4])


def test_ngram_jaccard_pairs(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert out[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in out and out[(1, 3)] < 1.0
    assert (1, 4) not in out


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in D.embedding_neardup_pairs(df, threshold=0.9).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs


def test_simhash_neardup_banding_matches_all_pairs(spark, documents):
    """The pigeonhole-banded join must return EXACTLY the all-pairs result
    (it is a lossless candidate generator), and its plan must be a bucketed
    equi-join — no BroadcastNestedLoopJoin / CartesianProduct."""
    docs = documents.limit(300)
    banded = D.simhash_neardup_pairs(docs, hamming_threshold=8)
    sim = D.simhash(docs).cache()
    a = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"))
        .filter(F.col("hamming") <= 8)
        .select("doc_a", "doc_b", "hamming")
    )
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in banded.collect()}
    want = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in brute.collect()}
    assert got == want
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_neardup_params_selector():
    """The quantitative brute/LSH selector: LSH must lose at low thresholds
    (too close to background similarity) and win decisively at high ones."""
    _, _, frac_low = D.lsh_neardup_params(0.45)
    _, _, frac_high = D.lsh_neardup_params(0.9)
    assert frac_low > 0.5  # all-pairs scan is the optimal plan at 0.45
    assert frac_high < 0.2  # bucketed candidates examine <20% of pairs at 0.9


def test_lsh_neardup_recall_on_planted_dups(spark):
    """High-threshold regime: planted near-duplicates at cos >= ~0.95 among
    background noise.  The auto-parametrized LSH path must find EXACTLY the
    brute-force pairs (candidate recall 1.0) while examining far fewer
    candidates, and auto must select it."""
    import random as pyrandom

    rng = pyrandom.Random(123)
    dim, n_base = 16, 400
    rows = []
    for i in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
        if i % 8 == 0:  # plant a near-dup: tiny perturbation
            rows.append((10_000 + i, [x + rng.gauss(0, 0.02) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    brute = D.embedding_neardup_pairs(df, threshold=0.9, method="brute")
    lsh = D.embedding_neardup_pairs(df, threshold=0.9, method="auto")
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert len(want) >= 50  # fixture actually contains planted dups
    assert got == want  # candidate-set recall 1.0 at fixture scale
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_lsh_neardup_recall_on_real_fixture(spark, embeddings):
    """On the driver fixture at the declared 0.45 threshold, the forced
    recall-1.0 LSH configuration (the one a_embedding_neardup_lsh declares)
    reproduces the brute pairs exactly."""
    brute = D.embedding_neardup_pairs(embeddings, threshold=0.45, method="brute")
    lsh = D.lsh_neardup_pairs(embeddings, threshold=0.45, n_planes=4, n_tables=24, seed=7)
    got = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in lsh.collect()}
    want = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in brute.collect()}
    assert got == want


def test_dup_clusters_transitive_closure(spark):
    """Chains must close transitively (a-b, b-c -> one cluster) — the exact
    property pairwise near-dup output lacks; singletons keep themselves."""
    import lmdiskann_jl_spark.operators.dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 8)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    res = {r["doc_id"]: r for r in D.dup_clusters(pairs, nodes).collect()}

    assert {res[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert {res[i]["cluster_id"] for i in (7, 8, 9)} == {7}
    for i in (4, 5, 6, 10):  # singletons
        assert res[i]["cluster_id"] == i and res[i]["cluster_size"] == 1 and res[i]["keep"]
    assert res[1]["cluster_size"] == 3 and res[7]["cluster_size"] == 3
    # exactly one canonical keeper per cluster, min-id policy
    assert [i for i in (1, 2, 3) if res[i]["keep"]] == [1]
    assert [i for i in (7, 8, 9) if res[i]["keep"]] == [7]


def test_semantic_dedup_recall_on_planted_dups(spark):
    """SemDeDup-style cluster-pruned near-dup: on planted near-duplicates
    (cos >= ~0.95) among background noise, the cell-bucketed path must
    recover >= 90% of the brute pairs (the SemDeDup approximate-recall
    contract), report ONLY true pairs (precision 1.0 — exact cosine verify),
    and never fall back to an all-pairs plan."""
    import random as pyrandom

    rng = pyrandom.Random(321)
    dim, n_base = 16, 400
    rows = []
    for i in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
        if i % 8 == 0:
            rows.append((10_000 + i, [x + rng.gauss(0, 0.02) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    brute = D.embedding_neardup_pairs(df, threshold=0.9, method="brute")
    sem = D.semantic_dedup_pairs(df, threshold=0.9, n_cells=8)
    got = {(r["id_a"], r["id_b"]) for r in sem.collect()}
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert len(want) >= 50
    assert got <= want  # precision 1.0: every reported pair is a true pair
    assert len(got & want) / len(want) >= 0.9  # approximate recall contract
    plan = sem._jdf.queryExecution().executedPlan().toString()
    # the bounded centroid-assignment crossJoin (n_cells broadcast rows per
    # vector) is the only permitted nested loop; the candidate PAIR join must
    # compile to an equi-join on cell — never an all-pairs product
    assert "CartesianProduct" not in plan
    assert any(j in plan for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))


def test_star_cc_matches_sweep_and_handles_deep_paths(spark):
    """large-star/small-star CC must (a) agree exactly with the min-label
    sweep on a mixed random graph and (b) label a 2,000-node path graph —
    diameter 2,000, where the sweep's O(diameter) iterations are hopeless —
    within its O(log n) round budget."""
    import random as pyrandom

    rng = pyrandom.Random(7)
    # mixed graph: cliques, stars, a short chain, singletons
    pairs = []
    for base in range(0, 60, 10):  # six 4-cliques
        ids = [base + i for i in range(4)]
        pairs += [(a, b) for a in ids for b in ids if a < b]
    pairs += [(100, 100 + i) for i in range(1, 6)]  # star
    pairs += [(200 + i, 201 + i) for i in range(5)]  # chain
    pairs += [(rng.randrange(300), rng.randrange(300)) for _ in range(30)]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ndf = spark.createDataFrame([(i,) for i in range(320)], "doc_id long")

    sweep = D.dup_clusters(pdf, ndf).collect()
    star = D.dup_clusters(pdf, ndf, algorithm="star").collect()
    assert {tuple(r) for r in sweep} == {tuple(r) for r in star}

    # deep path: 0-1-2-...-1999
    n = 2_000
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    cnodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = D.dup_clusters(chain, cnodes, algorithm="star", max_iter=30).collect()
    assert all(r["cluster_id"] == 0 and r["cluster_size"] == n for r in out)
    assert sum(r["keep"] for r in out) == 1


def test_duplicate_spans_planted(spark):
    """A shared 8-token span across docs 1/2 surfaces with n_docs=2; a span
    repeated twice WITHIN one doc does not qualify (min_docs counts distinct
    documents); short docs contribute nothing."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"intro words {shared} closing remarks here now"),
        (2, f"other preamble {shared} different tail text"),
        (3, f"{shared.replace('delta', 'DELTA-x')} no match"),  # broken span
        (4, f"solo {' '.join(['rep'] * 20)}"),  # intra-doc repetition only
        (5, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.duplicate_spans(docs, w=8)
    got = {(r["n_docs"], r["n_occurrences"]) for r in out.collect()}
    # the shared span (and only it) crosses documents
    assert (2, 2) in got
    assert all(nd >= 2 for nd, _ in got)
    # df_cap drops it again
    assert D.duplicate_spans(docs, w=8, df_cap=1).count() == 0


def test_duplicate_spans_counts_occurrences(spark):
    """n_occurrences counts every window occurrence, n_docs distinct docs."""
    span = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, f"{span} and then {span}"), (2, span)],
        "doc_id long, text string",
    )
    rows = {r["n_docs"]: r["n_occurrences"] for r in
            D.duplicate_spans(docs, w=8).collect() if r["n_docs"] == 2}
    # the exact span appears 3 times total (twice in doc 1, once in doc 2)
    assert 3 in rows.values()


def test_keep_best_policy_shape(spark):
    """Quality-aware canonical selection: per cluster the max-quality member
    wins, ties break to the lowest doc_id — exercised through the same
    max_by aggregate q_dedup_keep_best uses."""
    from pyspark.sql import functions as F

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.1)],
        "doc_id long, q double",
    )
    ordk = F.struct(F.col("q"), (-F.col("doc_id")).alias("_nd"))
    got = {
        r["cluster_id"]: (r["keep"], r["kq"])
        for r in clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max_by("doc_id", ordk).alias("keep"), F.max("q").alias("kq"))
        .collect()
    }
    assert got[1] == (2, 0.9)  # max quality, tie 2 vs 3 -> lower id
    assert got[4] == (4, 0.5)  # singleton keeps itself
    assert got[5] == (5, 0.1)


def test_duplicate_spans_short_docs_and_wide_window(spark):
    """Windows wider than any document produce no spans (the word_shingles
    short-doc gate), and w == doc length yields exactly one window."""
    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "one two three"), (3, "unrelated words here")],
        "doc_id long, text string",
    )
    assert D.duplicate_spans(docs, w=10).count() == 0
    got = D.duplicate_spans(docs, w=3).collect()
    assert len(got) == 1 and got[0]["n_docs"] == 2 and got[0]["n_occurrences"] == 2


def test_leakage_safe_split_coassigns_clusters(spark):
    """Every member of a near-dup cluster must land in the same split —
    the property the per-cluster keying exists for."""
    from lmdiskann_jl_spark.operators import pipeline as P

    clusters = spark.createDataFrame(
        [(i, i % 7) for i in range(70)], "doc_id long, cluster_id long"
    )
    per_cluster = P.dataset_split(
        clusters.select("cluster_id").distinct(), id_col="cluster_id"
    ).select("cluster_id", "split")
    joined = clusters.join(per_cluster, "cluster_id")
    n_pairs = (
        joined.select("cluster_id", "split").distinct().groupBy("cluster_id").count()
        .filter("count > 1").count()
    )
    assert n_pairs == 0  # no cluster straddles two splits
    assert joined.count() == 70  # every doc assigned


def test_dup_span_profile_planted(spark):
    """Coverage counting: overlapping duplicated windows union their
    positions (no double counting); clean docs report zero."""
    shared = "a b c d e f g h i j"  # 10 tokens -> 3 windows of 8, union = 10
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one two three"),
            (2, f"prefix {shared}"),
            (3, "totally different words only here now for sure ok fine"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.dup_span_profile(docs, w=8).collect()}
    assert got[1]["n_dup_tokens"] == 10  # union of overlapping windows
    assert got[2]["n_dup_tokens"] == 10
    assert got[3]["n_dup_tokens"] == 0 and got[3]["dup_frac"] == 0.0
    assert abs(got[2]["dup_frac"] - round(10 / 11, 4)) < 1e-9


def test_remove_duplicate_spans_planted(spark):
    """The substring-dedup CUT: tokens covered by a cross-doc duplicated
    window disappear, survivors keep original order, and a fully-duplicated
    doc rebuilds to the empty string."""
    shared = "a b c d e f g h i j"  # 10 tokens, all covered at w=8
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one two three"),
            (2, f"prefix {shared}"),
            (3, "totally different words only here now for sure ok fine"),
            (4, shared),  # nothing survives
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.remove_duplicate_spans(docs, w=8).collect()}
    assert got[1]["clean_text"] == "unique tail one two three"
    assert (got[1]["n_kept"], got[1]["n_removed"]) == (5, 10)
    assert got[2]["clean_text"] == "prefix"
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"].startswith("totally different")
    assert got[4]["clean_text"] == "" and got[4]["n_kept"] == 0


def test_corpus_clean_pipeline_invariants(spark, sf_dir):
    """End-to-end composition invariants on the fixture corpus: survivors
    are unique, exact-duplicate losers are gone, and the span cut never
    grows a document."""
    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.plans.queries import q_corpus_clean

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = q_corpus_clean(spark, sf_dir).cache()
    n_docs = docs.count()
    n_out = out.count()
    assert 0 < n_out <= n_docs
    assert out.select("doc_id").distinct().count() == n_out
    # every exact-duplicate non-keeper is filtered out
    losers = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.collect_list("doc_id").alias("all"))
        .select(F.explode("all").alias("doc_id"), "keep")
        .filter(F.col("doc_id") != F.col("keep"))
    )
    assert out.join(losers, "doc_id").count() == 0
    # the cut only removes: n_kept + n_removed == original token count
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"[^a-z0-9]+")).alias("n"),
    )
    bad = (
        out.join(toks, "doc_id")
        .filter(F.col("n_kept") + F.col("n_removed") > F.col("n"))
        .count()
    )
    assert bad == 0
    out.unpersist()
