"""Training-data pipeline operators as library functions: dedup family,
text analysis, embedding similarity."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.operators import dedup as D
from aws_insurancelake_etl_spark.operators import similarity as S
from aws_insurancelake_etl_spark.operators import textanalysis as TA


def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different content about spark engines"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )


def test_tokenize_and_shingles(spark):
    toks = D.tokenize(docs(spark))
    assert toks.where("doc_id = 1").count() == 9
    assert toks.where("doc_id = 1 and pos = 1").collect()[0]["token"] == "the"
    sh = D.shingles(docs(spark))
    assert sh.where("doc_id = 1").count() == 7  # 9 tokens → 7 distinct 3-grams
    shingle_set = {r["shingle"] for r in sh.where("doc_id = 1").collect()}
    assert "the quick brown" in shingle_set


def test_exact_dedup(spark):
    out = D.exact_dedup(docs(spark))
    dup_row = [r for r in out.collect() if r["n_copies"] == 2][0]
    assert dup_row["keeper_doc_id"] == 1
    assert out.count() == 3


def test_jaccard_and_lsh_pipeline_agree(spark):
    sh = D.shingles(docs(spark))
    exact_pairs = {(r["doc_a"], r["doc_b"]) for r in D.jaccard_pairs(sh, 0.5).collect()}
    assert (1, 4) in exact_pairs  # identical docs
    assert (1, 2) in exact_pairs  # near-dup
    # the verified LSH pipeline returns a subset of exact pairs w/ jaccard
    verified = D.near_dup_pipeline(docs(spark), jaccard_threshold=0.5)
    v_pairs = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert v_pairs <= exact_pairs
    assert (1, 4) in v_pairs  # identical signatures always collide


def test_containment_catches_embedded_subset_jaccard_misses(spark):
    # doc 11 is fully embedded in doc 10 (excerpt shape): containment = 1.0
    # while jaccard is small — the pair only surfaces via containment.
    long_text = " ".join(f"w{i} w{i+1} w{i+2}" for i in range(0, 60, 3))
    short_text = "w0 w1 w2 w3 w4"
    df = spark.createDataFrame(
        [(10, long_text), (11, short_text), (12, "nothing shared here at all")],
        "doc_id long, text string",
    )
    sh = D.shingles(df)
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in D.containment_pairs(sh, threshold=0.6).collect()}
    assert cont[(10, 11)] == 1.0
    jac = {(r["doc_a"], r["doc_b"])
           for r in D.jaccard_pairs(sh, threshold=0.5).collect()}
    assert (10, 11) not in jac


def test_unigram_entropy_orders_repetitive_below_diverse(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),   # zero entropy
            (2, "a b c d e f g h"),                           # max entropy
            (3, "a a b b c c d d"),                           # middle
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TA.unigram_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["entropy_ratio"] == 0.0
    assert out[2]["entropy_ratio"] == 1.0  # uniform over 8 distinct tokens
    assert out[1]["entropy"] < out[3]["entropy"] < out[2]["entropy"]
    import math
    assert abs(out[2]["entropy"] - round(math.log(8), 4)) < 1e-9
    assert all(out[d]["n_tokens"] == 8 for d in (1, 2, 3))


def test_simhash_identical_docs_equal(spark):
    out = {r["doc_id"]: r["simhash"] for r in D.simhash(docs(spark)).collect()}
    assert out[1] == out[4]
    assert 0 <= out[1] < 2**16
    assert out[1] != out[3]


def test_token_stats_quality_langid_fingerprint(spark):
    df = docs(spark)
    stats = {r["doc_id"]: r for r in TA.token_stats(df).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["n_distinct"] == 8  # 'the' twice

    quality = {r["doc_id"]: r for r in TA.quality_score(df).collect()}
    assert 0 < quality[1]["quality"] <= 1
    assert quality[1]["stopword_ratio"] > 0

    langid = {r["doc_id"]: r for r in TA.language_id(df).collect()}
    assert langid[1]["lang_pred"] == "en"

    fp = {r["doc_id"]: r["fingerprint"] for r in TA.fingerprint(df).collect()}
    assert fp[1] == fp[4]
    assert fp[1] != fp[2]


def vectors(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.9, 0.1, 0.0], 0),
            (3, [0.0, 1.0, 0.0], 1),
            (4, [1.0, 0.01, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )


def test_cosine_topk_and_near_dup(spark):
    emb = vectors(spark)
    topk = S.cosine_topk(emb, emb.filter(F.col("vec_id") == 1), k=2)
    got = [(r["vec_id"], r["cosine"]) for r in topk.orderBy(F.desc("cosine")).collect()]
    ids = [v for v, _ in got]
    assert ids[0] == 4  # closest to e1
    assert set(ids) == {2, 4}

    pruned = S.cosine_topk(emb, emb.filter(F.col("vec_id") == 1), k=5,
                           partition_col="label")
    assert {r["vec_id"] for r in pruned.collect()} == {2, 4}  # label 0 only

    pairs = S.cosine_near_dup_pairs(emb, threshold=0.999, block_col="label")
    assert {(r["vec_a"], r["vec_b"]) for r in pairs.collect()} == {(1, 4)}


def test_connected_components_merges_chains(spark):
    # Path graph 1-2-3-4 plus isolated pair 10-11: transitive closure must
    # put 1..4 in ONE cluster even though (1,3),(1,4),(2,4) were never pairs.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    cc = {r["node"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_cycle(spark):
    pairs = spark.createDataFrame([(5, 6), (6, 7), (7, 5)], "doc_a long, doc_b long")
    cc = {r["node"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    assert cc == {5: 5, 6: 5, 7: 5}


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    kept1 = TA.stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}).collect()
    kept2 = TA.stratified_sample(
        df.repartition(7), "lang", {"en": 0.5, "de": 0.1}
    ).collect()
    # Deterministic under repartitioning.
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    en = sum(1 for r in kept1 if r["lang"] == "en")
    de = sum(1 for r in kept1 if r["lang"] == "de")
    assert 0.4 < en / 1000 < 0.6
    assert 0.05 < de / 1000 < 0.16
    # default_rate=0 drops unlisted strata entirely.
    assert all(r["lang"] in ("en", "de") for r in kept1)


def test_tfidf_top_terms_ranks_characteristic_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple apple common"),
            (2, "banana banana common common"),
            (3, "cherry common common common"),
        ],
        "doc_id long, text string",
    )
    out = TA.tfidf_top_terms(df, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # 'common' appears in every doc (idf=1) and never wins over a unique term.
    assert top == {1: "apple", 2: "banana", 3: "cherry"}


def test_bpe_token_stats_classes(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42 pies (3.14)."), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TA.bpe_token_stats(df).collect()}
    r1 = rows[1]
    # Hello world pies = 3 words; 42 3 14 = 3 numbers; , ! ( . ) . = 6 marks
    assert r1["n_word_tokens"] == 3
    assert r1["n_number_tokens"] == 3
    assert r1["n_punct_tokens"] == 6
    assert r1["n_bpe_tokens"] == 12
    assert rows[2]["n_bpe_tokens"] == 0 and rows[2]["chars_per_token"] is None


def test_winnowing_shared_substring_shares_fingerprint(spark):
    # Docs share a 40-char substring embedded at different positions; with
    # k=8, w=4 any shared run >= 11 chars must contribute >= 1 common
    # fingerprint.  Doc 3 is unrelated.
    shared = "the common passage that both documents quote"
    df = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "xxxxxxxxxx " + shared + " yyyy zz"),
            # No 8-char substring of doc 3 occurs in docs 1/2 (disjoint
            # character runs), so zero shared fingerprints expected.
            (3, "zzzzqqqqwwwweeeerrrrttttyyyyuuuu0011223344556677"),
        ],
        "doc_id long, text string",
    )
    fps = TA.winnowing_fingerprints(df, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))


def test_winnowing_skips_too_short_docs(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    assert TA.winnowing_fingerprints(df, k=8, w=4).count() == 0


def test_jaccard_pairs_max_posting_len_drops_hot_shingle(spark):
    # Docs 1/2/3 share the hot shingle "aaa bbb ccc"; docs 1/2 also share a
    # second shingle.  Capping posting lists at 2 drops the hot shingle's
    # 3-doc posting list entirely, so (1,3)/(2,3) lose their only overlap
    # while (1,2) keeps the overlap contributed by the surviving shingle.
    df = spark.createDataFrame(
        [
            (1, "aaa bbb ccc ddd eee"),
            (2, "aaa bbb ccc ddd xxx"),
            (3, "yyy aaa bbb ccc zzz"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(df)
    uncapped = {(r["doc_a"], r["doc_b"]) for r in D.jaccard_pairs(sh, 0.1).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= uncapped
    capped_rows = D.jaccard_pairs(sh, 0.1, max_posting_len=2).collect()
    capped = {(r["doc_a"], r["doc_b"]) for r in capped_rows}
    assert (1, 2) in capped and (1, 3) not in capped and (2, 3) not in capped
    # Surviving pair's Jaccard under-estimates (denominator keeps full sets):
    # docs 1/2 share 2 of 3+3 shingles -> exact 2/4; capped overlap=1 -> 1/5.
    j12 = [r["jaccard"] for r in capped_rows if (r["doc_a"], r["doc_b"]) == (1, 2)][0]
    assert j12 == 0.2


def test_lsh_candidate_pairs_max_posting_len(spark):
    # Identical docs land in the same bucket for every band; capping bucket
    # size at 2 keeps the 2-member buckets but drops any hotter bucket.
    df = spark.createDataFrame(
        [(i, "one two three four five six") for i in range(1, 5)],
        "doc_id long, text string",
    )
    sigs = D.minhash_signatures(df)
    uncapped = D.lsh_candidate_pairs(sigs)
    assert uncapped.count() == 6  # all C(4,2) pairs collide
    capped = D.lsh_candidate_pairs(sigs, max_posting_len=2)
    assert capped.count() == 0  # every bucket has 4 members -> dropped


def test_unimax_allocation_water_filling(spark):
    """Hand-computed UniMax: strata of 10/20/70 tokens, budget 0.9*100=90,
    max_epochs=1 -> caps 10/20/70; uniform share 30 > 10 and remaining
    share 40 > 20, so small strata cap at 1.0 epoch; the big one takes
    the remaining 60 tokens = 6/7 epochs."""
    from aws_insurancelake_etl_spark.operators import textanalysis as TA

    docs = spark.createDataFrame(
        [(1, "a", " ".join(["w"] * 10)),
         (2, "b", " ".join(["w"] * 20)),
         (3, "c", " ".join(["w"] * 70))],
        "doc_id long, lang string, text string",
    )
    out = {r["stratum"]: r for r in
           TA.unimax_allocation(docs, budget_fraction=0.9,
                                max_epochs=1.0).collect()}
    assert out["a"]["alloc_tokens"] == 10.0 and out["a"]["epochs"] == 1.0
    assert out["b"]["alloc_tokens"] == 20.0 and out["b"]["epochs"] == 1.0
    assert out["c"]["alloc_tokens"] == 60.0
    assert abs(out["c"]["epochs"] - round(60 / 70, 4)) < 1e-9

    # budget above the epoch caps: everyone caps, budget under-used
    # (UniMax's defining behavior vs temperature sampling)
    capped = {r["stratum"]: r for r in
              TA.unimax_allocation(docs, budget_fraction=2.0,
                                   max_epochs=1.5).collect()}
    assert all(r["epochs"] == 1.5 for r in capped.values())

    # fully uniform: huge equal strata, small budget -> equal thetas
    eq = spark.createDataFrame(
        [(i, l, " ".join(["w"] * 50)) for i, l in enumerate("abc")],
        "doc_id long, lang string, text string",
    )
    u = {r["stratum"]: r["alloc_tokens"] for r in
         TA.unimax_allocation(eq, budget_fraction=0.5,
                              max_epochs=1.0).collect()}
    assert set(u.values()) == {25.0}


def test_keep_best_per_cluster_chains_ties_singletons(spark):
    """keep_best_per_cluster: transitive chains merge into one cluster,
    the cluster keeps exactly its argmax-quality doc (ties -> lowest
    id), and documents in no pair survive as singletons."""
    scored = spark.createDataFrame(
        [(1, 0.9), (2, 0.95), (3, 0.95), (4, 0.1), (9, 0.5)],
        "doc_id long, quality double",
    )
    # chain 1-2, 2-3, plus 3-4: one 4-doc cluster; 9 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r for r in
           D.keep_best_per_cluster(scored, pairs).collect()}
    assert {r["cluster_id"] for d, r in out.items() if d != 9} == {1}
    # tie 0.95 between docs 2 and 3 -> lowest id wins
    assert [d for d, r in out.items() if r["keep"]] == [2, 9] or sorted(
        d for d, r in out.items() if r["keep"]
    ) == [2, 9]
    assert out[9]["cluster_id"] == 9 and out[9]["keep"]


def test_posting_cap_truncation_is_observable(spark):
    """ADVICE r5: capping must not lose recall SILENTLY — an Observation
    threaded into the pair expanders reports how many posting lists the
    cap dropped, as metrics inside the existing job (no extra pass)."""
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [
            (1, "aaa bbb ccc ddd eee"),
            (2, "aaa bbb ccc ddd xxx"),
            (3, "yyy aaa bbb ccc zzz"),
        ],
        "doc_id long, text string",
    )
    sh = D.shingles(df)
    obs = Observation("cap")
    D.jaccard_pairs(sh, 0.1, max_posting_len=2,
                    truncation_observation=obs).collect()
    metrics = obs.get
    assert metrics["truncated_postings"] == 1  # the 3-doc hot shingle
    assert metrics["max_posting_seen"] == 3

    # cap not binding -> zero truncations reported
    obs2 = Observation("cap2")
    D.jaccard_pairs(sh, 0.1, max_posting_len=100,
                    truncation_observation=obs2).collect()
    assert obs2.get["truncated_postings"] == 0

    # LSH bucket variant: 4-doc hot bucket truncates, 2-doc bucket
    # survives (survivors must exist — with an all-empty result AQE's
    # empty-relation propagation prunes the CollectMetrics node, see
    # _observe_truncation's docstring)
    df4 = spark.createDataFrame(
        [(i, "one two three four five six") for i in range(1, 5)]
        + [(8, "seven eight nine ten eleven"),
           (9, "seven eight nine ten eleven")],
        "doc_id long, text string",
    )
    obs3 = Observation("cap3")
    pairs = D.lsh_candidate_pairs(D.minhash_signatures(df4),
                                  max_posting_len=2,
                                  truncation_observation=obs3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(8, 9)}
    assert obs3.get["truncated_postings"] >= 1
    assert obs3.get["max_posting_seen"] == 4


def test_cosine_near_dup_requires_blocking(spark):
    import pytest

    emb = vectors(spark)
    with pytest.raises(ValueError, match="block_col"):
        S.cosine_near_dup_pairs(emb)
    # explicit opt-in compiles and runs
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.999, allow_full_pairs=True)
    assert {(r["vec_a"], r["vec_b"]) for r in pairs.collect()} == {(1, 4)}


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa bb"), (2, "one two three four")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TA.repetition_stats(df).collect()}
    # doc 1: 4 tokens, 2 distinct -> dup 0.5; bigrams: 'aa aa'x2,'aa bb' -> 2/3
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["dup_token_frac"] == 0.5
    assert rows[1]["top_bigram_frac"] == round(2 / 3, 4)
    assert rows[1]["mean_word_len"] == 2.0
    # doc 2: no repetition
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == round(1 / 3, 4)


def test_benchmark_contamination_detects_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # contains bench 3-grams
            (2, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma zeta")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            TA.benchmark_contamination(corpus, bench).collect()}
    assert rows[1]["n_matched"] == 1          # 'alpha beta gamma'
    assert rows[1]["set_size"] == 3
    assert rows[1]["contamination"] == round(1 / 3, 4)
    assert rows[2]["n_matched"] == 0 and rows[2]["contamination"] == 0.0


def test_pack_shards_boundaries_and_partitioning(spark):
    df = spark.createDataFrame(
        [(i, "en", 40) for i in range(1, 6)] + [(10, "de", 150)],
        "doc_id long, lang string, w int",
    )
    out = {(r["lang"], r["doc_id"]): r["shard_id"]
           for r in TA.pack_shards(df, "w", budget=100, partition_col="lang").collect()}
    # en: starts 0,40,80,120,160 -> shards 0,0,0,1,1 (doc 3 straddles, stays in 0)
    assert [out[("en", i)] for i in range(1, 6)] == [0, 0, 0, 1, 1]
    assert out[("de", 10)] == 0  # independent per-partition layout


def test_kmv_exact_small_groups_and_merge(spark):
    from aws_insurancelake_etl_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(i % 7, f"g{'small' if i % 2 else 'big'}") for i in range(2000)]
        + [(i, "gbig") for i in range(2000)],
        "v long, g string",
    )
    est = {r["g"]: r["est_distinct"]
           for r in SK.kmv_distinct(df, "v", ["g"], k=64).collect()}
    assert est["gsmall"] == 7.0                   # < k distinct -> exact
    assert abs(est["gbig"] - 2000) / 2000 < 0.35  # sketch estimate in range

    # merge property: union of two half-sketches == estimate over re-ranked rows
    h1 = SK.kmv_sketch(df.where("v % 2 = 0"), "v", ["g"], k=64)
    h2 = SK.kmv_sketch(df.where("v % 2 = 1"), "v", ["g"], k=64)
    merged = {r["g"]: r["est_distinct"]
              for r in SK.kmv_estimate(h1.unionByName(h2), ["g"], k=64).collect()}
    assert merged["gsmall"] == 7.0
    assert abs(merged["gbig"] - est["gbig"]) / est["gbig"] < 0.5


def test_kmv_set_estimates_exact_when_unfilled(spark):
    """Below k distinct values on every side, the set-operation
    estimates must be EXACT: union, intersection, and Jaccard computed
    from the sketches equal the true set algebra."""
    from aws_insurancelake_etl_spark.operators import sketches as SK

    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 6]], "v long")
    b = spark.createDataFrame([(v,) for v in [4, 5, 6, 7, 8]], "v long")
    row = SK.kmv_set_estimates(a, b, "v", k=64).collect()[0]
    assert row.est_a == 6.0 and row.est_b == 5.0
    assert row.est_union == 8.0          # |{1..8}|
    assert row.est_intersection == 3.0   # |{4,5,6}|
    assert abs(row.jaccard_est - 3 / 8) < 1e-12

    # filled path: two overlapping ranges, estimates within KMV error
    big_a = spark.createDataFrame([(v,) for v in range(0, 3000)], "v long")
    big_b = spark.createDataFrame([(v,) for v in range(1500, 4500)], "v long")
    est = SK.kmv_set_estimates(big_a, big_b, "v", k=256).collect()[0]
    assert abs(est.est_union - 4500) / 4500 < 0.25
    assert abs(est.jaccard_est - 1500 / 4500) < 0.15


def test_kmv_set_estimates_empty_side(spark):
    """One empty input: union equals the other side exactly, the
    intersection and Jaccard are zero, and nothing divides by zero."""
    from aws_insurancelake_etl_spark.operators import sketches as SK

    a = spark.createDataFrame([(v,) for v in [1, 2, 3]], "v long")
    b = spark.createDataFrame([], "v long")
    row = SK.kmv_set_estimates(a, b, "v", k=64).collect()[0]
    assert row.est_a == 3.0 and row.est_b == 0.0
    assert row.est_union == 3.0 and row.est_intersection == 0.0
    assert row.jaccard_est == 0.0
    both_empty = SK.kmv_set_estimates(b, b, "v", k=64).collect()[0]
    assert both_empty.est_union == 0.0 and both_empty.jaccard_est == 0.0


def test_kmv_set_estimates_from_sketches_matches_end_to_end(spark):
    """The DataFrame-native stored-sketch form must reproduce the
    driver-side form bit-for-bit on both the short-circuit (<k) and the
    filled estimator paths — store→read-back→merge loses nothing."""
    from aws_insurancelake_etl_spark.operators import sketches as SK

    def sketch_of(df, k):
        return SK.kmv_sketch(df.withColumn("g", F.lit(1)), "v", ["g"], k=k)

    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 6]], "v long")
    b = spark.createDataFrame([(v,) for v in [4, 5, 6, 7, 8]], "v long")
    direct = SK.kmv_set_estimates(a, b, "v", k=64).collect()[0]
    stored = SK.kmv_set_estimates_from_sketches(
        sketch_of(a, 64), sketch_of(b, 64), k=64
    ).collect()[0]
    assert tuple(direct) == tuple(stored)

    big_a = spark.createDataFrame([(v,) for v in range(0, 3000)], "v long")
    big_b = spark.createDataFrame([(v,) for v in range(1500, 4500)], "v long")
    direct = SK.kmv_set_estimates(big_a, big_b, "v", k=256).collect()[0]
    stored = SK.kmv_set_estimates_from_sketches(
        sketch_of(big_a, 256), sketch_of(big_b, 256), k=256
    ).collect()[0]
    assert tuple(direct) == tuple(stored)


def test_kmv_merge_equals_direct_sketch_of_union(spark):
    """kmv_merge over stored partition sketches reproduces the sketch
    built directly over the unioned data — hashes AND ranks."""
    from aws_insurancelake_etl_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(i * 7 % 501, "g1") for i in range(400)]
        + [(i * 13 % 777, "g2") for i in range(300)],
        "v long, g string",
    )
    part1 = SK.kmv_sketch(df.where("v % 3 = 0"), "v", ["g"], k=32)
    part2 = SK.kmv_sketch(df.where("v % 3 <> 0"), "v", ["g"], k=32)
    merged = SK.kmv_merge(part1.unionByName(part2), ["g"], k=32)
    direct = SK.kmv_sketch(df, "v", ["g"], k=32)
    m = {(r["g"], r["__rn"]): r["__h"] for r in merged.collect()}
    d = {(r["g"], r["__rn"]): r["__h"] for r in direct.collect()}
    assert m == d


def test_kmeans_deterministic_under_repartition(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, c1 = S.kmeans_fit(emb, k=3, n_iter=2)
    a2, c2 = S.kmeans_fit(emb.repartition(13), k=3, n_iter=2)
    assert c1 == c2  # decimal-exact means: no partitioning drift
    r1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert r1 == r2
    assert len(set(r1.values())) == 3


def test_assign_clusters_tie_breaks_to_lowest_cluster(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<float>")
    # both centroids equidistant -> lowest cluster id wins
    out = S.assign_clusters(df, [[1.0, 0.0], [-1.0, 0.0]]).collect()
    assert out[0]["cluster"] == 0


def test_star_components_match_label_propagation(spark):
    import random

    rng = random.Random(7)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)]                      # chain + pair
        + [(5, 6), (6, 7), (7, 5)]                               # cycle
        + [(rng.randrange(100, 140), rng.randrange(100, 140)) for _ in range(60)],
        "doc_a long, doc_b long",
    ).where("doc_a != doc_b")
    lp = {r["node"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    st = {r["node"]: r["cluster_id"]
          for r in D.connected_components_star(pairs).collect()}
    assert st == lp
    assert st[4] == 1 and st[11] == 10 and st[7] == 5


def test_incremental_lsh_matches_full_lsh(spark):
    # Pairs touching the new batch must equal the full-corpus LSH pairs
    # restricted to those docs (same bands, same collisions).
    df = docs(spark)  # docs 1..4; make 4 the "new batch"
    full = {(r["doc_a"], r["doc_b"])
            for r in D.lsh_candidate_pairs(D.minhash_signatures(df)).collect()}
    expected = set()
    for a, b in full:
        if b == 4:
            expected.add((4, a))
        elif a == 4:
            expected.add((4, b))
    new_sigs = D.minhash_signatures(df.where("doc_id = 4"))
    stored = D.melt_bands(D.minhash_signatures(df.where("doc_id != 4")))
    got = {(r["doc_new"], r["doc_matched"])
           for r in D.incremental_lsh_pairs(new_sigs, stored).collect()}
    assert got == expected
    assert (4, 1) in got  # exact dup of doc 1 always collides


def test_split_assign_stable_and_exclusive(spark):
    import pytest

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    out1 = {r["doc_id"]: r["split"]
            for r in TA.split_assign(df, {"train": 0.8, "val": 0.1}).collect()}
    # growing the corpus must not move any existing document's split
    bigger = spark.createDataFrame([(i,) for i in range(6000)], "doc_id long")
    out2 = {r["doc_id"]: r["split"]
            for r in TA.split_assign(bigger, {"train": 0.8, "val": 0.1}).collect()}
    assert all(out2[k] == v for k, v in out1.items())
    # remainder rows excluded (split None), proportions roughly honored
    counts = {}
    for v in out2.values():
        counts[v] = counts.get(v, 0) + 1
    assert abs(counts["train"] / 6000 - 0.8) < 0.03
    assert abs(counts["val"] / 6000 - 0.1) < 0.02
    assert counts.get(None, 0) > 0
    with pytest.raises(ValueError):
        TA.split_assign(df, {"train": 0.8, "val": 0.3})


def test_token_chunks_cover_every_token_with_exact_overlap(spark):
    """Chunking invariants: starts advance by the stride, consecutive
    chunks overlap by exactly size-stride tokens, every token position is
    covered, and each chunk's hash equals the hash of the slice it claims."""
    import pandas as pd

    from aws_insurancelake_etl_spark.operators.textanalysis import token_chunks

    texts = {
        1: "a b c d e f g h i j k l m",   # 13 tokens: 2 chunks (size 5, stride 3)
        2: "one two three",                # shorter than one chunk
        3: " ".join(f"t{i}" for i in range(23)),
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = token_chunks(df, size=5, stride=3).toPandas()
    import hashlib

    for doc_id, text in texts.items():
        toks = text.split()
        rows = out[out.doc_id == doc_id].sort_values("chunk_id")
        starts = list(rows.start_pos)
        assert starts == list(range(1, len(toks) + 1, 3))
        covered = set()
        for _, r in rows.iterrows():
            chunk = toks[int(r.start_pos) - 1 : int(r.start_pos) - 1 + 5]
            assert int(r.n_chunk_tokens) == len(chunk)
            assert r.chunk_hash == hashlib.md5(" ".join(chunk).encode()).hexdigest()
            covered.update(range(int(r.start_pos), int(r.start_pos) + len(chunk)))
        assert covered == set(range(1, len(toks) + 1)), doc_id


def test_semdedup_keeps_everything_not_dropped(spark):
    """SemDeDup bookkeeping: every vector appears exactly once in the
    output, drops never exceed per_cluster_drop per cluster, and a kept
    vector is never one of the top-pair higher ids."""
    import pandas as pd

    from aws_insurancelake_etl_spark.operators.similarity import (
        kmeans_fit,
        semdedup_keep,
    )

    vecs = [[(i * 5 + d) % 16 / 16.0 for d in range(4)] for i in range(20)]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(20), "embedding": vecs})
    )
    assigned, _ = kmeans_fit(df, k=3, n_iter=1)
    out = semdedup_keep(assigned, per_cluster_drop=2).toPandas()
    assert sorted(out.vec_id) == list(range(20))
    dropped = out[~out.keep]
    assert len(dropped) <= 2 * out.cluster.nunique()
    # Determinism: a second run produces the identical keep set.
    out2 = semdedup_keep(assigned, per_cluster_drop=2).toPandas()
    assert sorted(out[out.keep].vec_id) == sorted(out2[out2.keep].vec_id)


def test_cms_overestimates_and_merges(spark):
    """Count-min invariants: every estimate >= the exact count, the
    estimate is exact when a key's cells are collision-free, and summing
    two partition sketches cell-wise equals the sketch of the union (the
    mergeability that lets per-partition sketches answer union queries)."""
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.operators import sketches as SK

    df = spark.range(1000).select((F.col("id") % 37).alias("k"))
    sketch = SK.cms_build(df, "k", depth=4, width=16)
    est = {r.k: r.cms_est for r in
           SK.cms_query(sketch, df.distinct(), "k", depth=4, width=16).collect()}
    exact = {r.k: r.n for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)

    s1 = SK.cms_build(df.where("k % 2 = 0"), "k", depth=4, width=16)
    s2 = SK.cms_build(df.where("k % 2 = 1"), "k", depth=4, width=16)
    merged = (
        s1.unionByName(s2).groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    full = {(r.row, r.bucket): r.c for r in sketch.collect()}
    assert {(r.row, r.bucket): r.c for r in merged.collect()} == full


def test_hll_accuracy_and_branches(spark):
    """Deterministic HLL: estimate within 3 sigma (1.04/sqrt(4096) per
    register theory) on a 20k-distinct set (raw harmonic branch), and
    near-exact via linear counting on a 300-distinct set."""
    import aws_insurancelake_etl_spark.operators.sketches as SK

    big = spark.range(20000).select((F.col("id") * 7 + 3).alias("v"),
                                    F.lit("g").alias("g"))
    est = SK.hll_estimate(SK.hll_sketch(big, "v", ["g"]), ["g"]).collect()[0]
    assert abs(est["est_distinct"] - 20000) / 20000 < 0.05
    small = spark.range(300).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    est2 = SK.hll_estimate(SK.hll_sketch(small, "v", ["g"]), ["g"]).collect()[0]
    assert abs(est2["est_distinct"] - 300) / 300 < 0.10


def test_hll_merge_equals_whole_and_is_idempotent(spark):
    """Register tables merged from disjoint halves must be IDENTICAL to
    the whole-data sketch (max per idx commutes), so merged estimates
    are exactly the whole-data estimates — the storable-sketch
    property."""
    import aws_insurancelake_etl_spark.operators.sketches as SK

    df = spark.range(5000).select((F.col("id") * 13 + 1).alias("v"),
                                  F.lit("g").alias("g"))
    whole = SK.hll_sketch(df, "v", ["g"])
    halves = SK.hll_merge(
        SK.hll_sketch(df.where("v % 2 = 0"), "v", ["g"]).unionByName(
            SK.hll_sketch(df.where("v % 2 = 1"), "v", ["g"])
        ),
        ["g"],
    )
    w = {(r["idx"]): r["rho"] for r in whole.collect()}
    h = {(r["idx"]): r["rho"] for r in halves.collect()}
    assert w == h
    # duplicates never move an estimate: sketch of df ∪ df == sketch of df
    dup = SK.hll_merge(whole.unionByName(whole), ["g"])
    assert {(r["idx"]): r["rho"] for r in dup.collect()} == w


def test_hll_register_bounds(spark):
    import aws_insurancelake_etl_spark.operators.sketches as SK

    df = spark.range(100000).select(F.col("id").alias("v"), F.lit("g").alias("g"))
    sk = SK.hll_sketch(df, "v", ["g"], p=8).collect()
    assert len(sk) <= 256
    assert all(1 <= r["rho"] <= 53 for r in sk)  # 60-8=52 bits + 1 cap


def _brute_cosine_pairs(rows, threshold):
    """Reference all-pairs cosine over (doc, token, cnt) triples."""
    import itertools
    import math
    from collections import defaultdict

    vecs = defaultdict(dict)
    for d, tok, c in rows:
        vecs[d][tok] = c
    out = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        dot = sum(ca * vecs[b].get(tok, 0) for tok, ca in vecs[a].items())
        na = math.sqrt(sum(c * c for c in vecs[a].values()))
        nb = math.sqrt(sum(c * c for c in vecs[b].values()))
        cos = dot / (na * nb)
        if cos >= threshold:
            out[(a, b)] = round(cos, 4)
    return out


def test_cosine_prefix_pairs_matches_brute_force(spark):
    """The prefix filter is LOSSLESS: identical pairs to brute force,
    including a pair sharing only one hot token (must be pruned) and a
    boundary pair at ~the threshold."""
    from aws_insurancelake_etl_spark.operators.dedup import cosine_prefix_pairs

    rows = [
        # near-identical pair (high cosine)
        (1, "alpha", 3), (1, "beta", 2), (1, "the", 5),
        (2, "alpha", 3), (2, "beta", 2), (2, "the", 5), (2, "gamma", 1),
        # shares ONLY the hot token 'the' with 1/2 -> low cosine
        (3, "the", 4), (3, "delta", 7), (3, "epsilon", 6),
        # orthogonal doc
        (4, "zeta", 9),
        # boundary-ish pair with 3
        (5, "delta", 7), (5, "epsilon", 5), (5, "the", 1),
    ]
    for t in (0.5, 0.8, 0.95):
        expected = _brute_cosine_pairs(rows, t)
        tf = spark.createDataFrame(rows, "doc_id long, token string, cnt long")
        got = {
            (r["id_lo"], r["id_hi"]): r["cosine"]
            for r in cosine_prefix_pairs(tf, t).collect()
        }
        assert got == expected, (t, got, expected)


def test_cosine_prefix_pairs_exact_dup_classes(spark):
    """r13 collapses identical (token, cnt) multisets to one
    representative before the all-pairs join and expands afterwards —
    the pair set must still equal brute force exactly: within-class
    pairs at cosine 1.0, cross-class pairs carrying the reps' cosine
    to every member combination, and docs whose vectors merely OVERLAP
    (not identical) must not be merged."""
    from aws_insurancelake_etl_spark.operators.dedup import (
        cosine_prefix_pairs,
    )

    rows = [
        # class A: three identical docs (ids deliberately interleaved)
        (1, "alpha", 3), (1, "beta", 2),
        (7, "alpha", 3), (7, "beta", 2),
        (4, "alpha", 3), (4, "beta", 2),
        # class B: two identical docs, near-dup of A
        (2, "alpha", 3), (2, "beta", 2), (2, "gamma", 1),
        (9, "alpha", 3), (9, "beta", 2), (9, "gamma", 1),
        # same tokens as A but different counts -> NOT class A
        (5, "alpha", 2), (5, "beta", 3),
        # singleton orthogonal doc
        (6, "zeta", 9),
    ]
    for t in (0.5, 0.8, 0.95, 1.0):
        expected = _brute_cosine_pairs(rows, t)
        tf = spark.createDataFrame(
            rows, "doc_id long, token string, cnt long"
        )
        got = {
            (r["id_lo"], r["id_hi"]): r["cosine"]
            for r in cosine_prefix_pairs(tf, t).collect()
        }
        assert got == expected, (t, got, expected)


def test_cosine_prefix_pairs_prunes_hot_tokens(spark):
    """A token shared by every document must stay UNINDEXED (its cum
    bound sits below threshold for common-first ordering), so the
    candidate set stays linear, and docs sharing nothing but that token
    produce no candidate at all."""
    from aws_insurancelake_etl_spark.operators.dedup import cosine_prefix_pairs

    rows = []
    for d in range(40):
        rows += [(d, "the", 10), (d, f"uniq{d}", 10)]
    tf = spark.createDataFrame(rows, "doc_id long, token string, cnt long")
    # all pairwise cosines are 100/200 = 0.5 < 0.9 -> empty result
    assert cosine_prefix_pairs(tf, 0.9).count() == 0


def _ref_bpe(word_freqs, n):
    """Pure-Python Sennrich BPE reference: (left, right, count) merges."""
    vocab = {w: (list(w) + ["</w>"], f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n):
        counts = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((best[0], best[1], counts[best]))
        for w, (syms, f) in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            vocab[w] = (out, f)
    return merges


def test_bpe_learn_merges_matches_reference(spark):
    from aws_insurancelake_etl_spark.operators.textanalysis import bpe_learn_merges

    corpus = ["low low low lower lower newest newest newest newest",
              "widest widest newest low"]
    freqs = {}
    for line in corpus:
        for w in line.split():
            freqs[w] = freqs.get(w, 0) + 1
    expected = _ref_bpe(freqs, 8)
    df = spark.createDataFrame([(c,) for c in corpus], "text string")
    words, merges = bpe_learn_merges(df, n_merges=8)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    assert got == expected, (got, expected)


def test_bpe_per_merge_checkpoint_keeps_trajectory(spark):
    """r13 changed the trainer to ``localCheckpoint`` after EVERY merge
    (iteration i used to re-execute all i prior folds inside its
    aggregation — quadratic total fold work).  Materialization must not
    change the learned trajectory: pin it against the pure-Python
    reference trainer on corpora stressing fold edge cases — the pair
    created by merge1 winning iteration 2 (abc), l==r greedy folds,
    text collisions (symbol 'ab' already present when (a,b) merges),
    and pair exhaustion before n_merges."""
    from aws_insurancelake_etl_spark.operators.textanalysis import (
        bpe_learn_merges,
    )

    corpora = {
        "new-pair-wins": ["abc"] * 10,
        "l==r": ["aaaa aaa aa a"] * 5,
        "collision": ["ab a b aab"] * 7,
        "exhaustion": ["zzzzz"],
        "mixed": ["the cat sat on the mat", "the bat and the cat"] * 3,
    }
    for label, docs in corpora.items():
        freqs = {}
        for line in docs:
            for w in line.split():
                freqs[w] = freqs.get(w, 0) + 1
        for n in (1, 3, 8):
            expected = _ref_bpe(dict(freqs), n)
            df = spark.createDataFrame([(d,) for d in docs], "text string")
            _, merges = bpe_learn_merges(df, n_merges=n)
            got = [(r["left"], r["right"], r["pair_count"])
                   for r in merges.orderBy("rank").collect()]
            assert got == expected, (label, n, got, expected)


def test_bpe_encode_reproduces_trained_symbolization(spark):
    from aws_insurancelake_etl_spark.operators.textanalysis import (
        bpe_encode,
        bpe_learn_merges,
    )

    df = spark.createDataFrame(
        [("low lower lowest",), ("slow slower glow",)], "text string"
    )
    words, merges = bpe_learn_merges(df, n_merges=6)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    # encoding each training word must yield exactly its trained symbols
    trained = {r["word"]: r["syms"] for r in words.collect()}
    enc = bpe_encode(
        words.select(F.col("word").alias("text")), rules, out_col="toks"
    )
    for r in enc.collect():
        assert r["toks"] == trained[r["text"]], (r["text"], r["toks"])
    # unseen word: encoder still produces a valid segmentation whose
    # concatenation restores the word + marker
    unseen = bpe_encode(spark.createDataFrame([("glowest",)], "text string"),
                        rules, out_col="toks").collect()[0]["toks"]
    assert "".join(unseen) == "glowest</w>"


def test_histogram_quantiles_accuracy_and_merge(spark):
    """Histogram p50/p95 within one bin width of the exact percentile,
    and per-slice sketches merged == whole-data sketch (counts add)."""
    import aws_insurancelake_etl_spark.operators.sketches as SK

    df = spark.range(10000).select(
        (F.col("id") % 1000).cast("double").alias("v"), F.lit("g").alias("g")
    )
    sk = SK.histogram_sketch(df, "v", ["g"], 10.0)
    got = {r["q"]: r["quantile_est"]
           for r in SK.histogram_quantiles(sk, ["g"], [0.5, 0.95], 10.0).collect()}
    exact = df.selectExpr("percentile(v, 0.5) p50", "percentile(v, 0.95) p95").collect()[0]
    assert abs(got[0.5] - exact["p50"]) <= 10.0
    assert abs(got[0.95] - exact["p95"]) <= 10.0
    halves = SK.histogram_merge(
        SK.histogram_sketch(df.where("v % 2 = 0"), "v", ["g"], 10.0).unionByName(
            SK.histogram_sketch(df.where("v % 2 = 1"), "v", ["g"], 10.0)
        ),
        ["g"],
    )
    whole = {(r["bin"]): r["cnt"] for r in sk.collect()}
    merged = {(r["bin"]): r["cnt"] for r in halves.collect()}
    assert whole == merged


def test_html_extract_edge_cases(spark):
    from aws_insurancelake_etl_spark.operators.textanalysis import html_extract

    pages = [
        # script body containing '<' must not break tag stripping
        (1, "<p>a</p><script>if (1 < 2) { x(); }</script><p>b</p>"),
        # entity double-decode guard: &amp;lt; must become '&lt;' not '<'
        (2, "x &amp;lt; y"),
        # comments and style blocks vanish entirely
        (3, "<style>p{}</style><!-- hidden <b>bold</b> -->seen"),
        (4, ""),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {r.doc_id: (r.extracted, r.html_text_ratio)
           for r in html_extract(df).collect()}
    assert got[1][0] == "a b"
    assert got[2][0] == "x &lt; y"
    assert got[3][0] == "seen"
    assert got[4][0] == "" and got[4][1] is None


def test_histogram_quantile_q0_returns_minimum(spark):
    """q=0 must not silently vanish (review finding: t=0 satisfied no
    bin); it lands in the first bin — the distribution minimum edge."""
    import aws_insurancelake_etl_spark.operators.sketches as SK

    df = spark.range(100).select((F.col("id") + 50).cast("double").alias("v"),
                                 F.lit("g").alias("g"))
    sk = SK.histogram_sketch(df, "v", ["g"], 10.0)
    got = {r["q"]: r["quantile_est"]
           for r in SK.histogram_quantiles(sk, ["g"], [0.0, 1.0], 10.0).collect()}
    assert set(got) == {0.0, 1.0}
    assert abs(got[0.0] - 50.0) < 1e-6  # the min's bin lower edge
    assert abs(got[1.0] - 150.0) < 1e-6


def test_interleave_bits_guard_and_empty_zorder(spark):
    import pytest as _pytest

    from aws_insurancelake_etl_spark.operators import layout

    with _pytest.raises(ValueError, match="bit positions"):
        layout.interleave_bits([F.col("a")] * 8, 8)
    empty = spark.createDataFrame([], "a double, b double")
    with _pytest.raises(ValueError, match="non-null row"):
        layout.zorder_key(empty, ["a", "b"])
