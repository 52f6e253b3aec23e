"""Corpus-dedup pre-stage (VERDICT r04 #3 + ADVICE): victim derivation,
keep-min-per-cluster semantics, and the no-corpus-sized-broadcast plan pin.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    from autoner_spark.caching import release_caches

    release_caches()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_victims_are_family_bounded_not_survivors(spark):
    from autoner_spark.dedup import apply_corpus_dedup, corpus_dedup_victims

    docs = _docs(spark, [(1, "a a a"), (2, "a a a"), (3, "b b b"),
                         (4, "a a a"), (5, "c c c")])
    victims = {r.doc_id for r in corpus_dedup_victims(docs, "exact").collect()}
    assert victims == {2, 4}
    kept = {r.doc_id for r in apply_corpus_dedup(docs, "exact").collect()}
    assert kept == {1, 3, 5}


def test_exact_dedup_plan_never_broadcasts_the_survivor_set(spark):
    # the r04 defect: docs.join(broadcast(keep), "left_semi") pinned the
    # ~corpus-sized survivor set as a broadcast build. The fixed plan is
    # a LeftAnti on the victim side only — no LeftSemi anywhere, and the
    # retention join's build side is the (dup-bounded) victim relation.
    from autoner_spark.dedup import apply_corpus_dedup

    docs = _docs(spark, [(i, f"t {i}") for i in range(50)] + [(99, "t 0")])
    out = apply_corpus_dedup(docs, "exact")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan
    assert "LeftAnti" in plan
    assert {r.doc_id for r in out.collect()} == set(range(50))


def test_cluster_victims_keep_one_representative_per_cluster(spark):
    # pairs (a,c),(b,c) with a<b<c: the old drop-any-id_b rule kept BOTH
    # a and b; cluster semantics keep only a
    from autoner_spark.dedup import cluster_victims_from_pairs

    pairs = spark.createDataFrame(
        [(1, 3, 0.9), (2, 3, 0.9)], "id_a long, id_b long, jaccard double"
    )
    victims = {r.doc_id
               for r in cluster_victims_from_pairs(pairs).collect()}
    assert victims == {2, 3}


def test_minhash_corpus_dedup_end_to_end(spark):
    from autoner_spark.dedup import apply_corpus_dedup

    # minhash is md5-derived (no runtime randomness), so this fixture is
    # reproducible: swapping the LAST token keeps jaccard at 0.83 and the
    # band collision occurs deterministically (probed once, pinned here)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.rstrip().rsplit(" ", 1)[0] + " lambda"
    docs = _docs(spark, [
        (10, base), (11, base), (12, near),   # one near-dup cluster
        (20, "totally different text with nothing shared here at all"),
    ])
    kept = {r.doc_id for r in apply_corpus_dedup(docs, "minhash").collect()}
    assert kept == {10, 20}


def test_jaccard_routing_exact_within_budget_lsh_beyond(spark):
    from autoner_spark.dedup import (
        estimate_candidate_pair_mass,
        minhash_verified_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_routed,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.rstrip().rsplit(" ", 1)[0] + " lambda"
    docs = _docs(spark, [(10, base), (11, base), (12, near),
                         (20, "unrelated words only here nothing shared")])

    mass = estimate_candidate_pair_mass(docs)
    assert mass > 0

    # within budget: routed == exact form, complete recall
    exact = {(r.id_a, r.id_b, r.jaccard)
             for r in ngram_jaccard_pairs(docs).collect()}
    routed = {(r.id_a, r.id_b, r.jaccard)
              for r in ngram_jaccard_pairs_routed(
                  docs, pair_budget=mass).collect()}
    assert routed == exact and len(exact) >= 2

    # beyond budget: routed == LSH+verify form (precision preserved:
    # every emitted pair is exact-jaccard-verified; recall is the band
    # guarantee) — same schema, subset of the exact pairs
    lsh = {(r.id_a, r.id_b, r.jaccard)
           for r in minhash_verified_pairs(docs, threshold=0.5).collect()}
    rerouted = {(r.id_a, r.id_b, r.jaccard)
                for r in ngram_jaccard_pairs_routed(
                    docs, pair_budget=mass - 1).collect()}
    assert rerouted == lsh
    assert rerouted <= exact


def test_cluster_victims_survive_13_digit_ids(spark):
    # r05 review finding: the old width-12 key TRUNCATED 13-digit ids
    # (Spark lpad truncates overlong input), merging distinct ids into
    # one node and emitting zero victims; the full-int64-width key must
    # keep min-id-per-cluster semantics at any long id
    from autoner_spark.dedup import cluster_victims_from_pairs

    a, b, c = 1_000_000_000_001, 1_000_000_000_002, 1_000_000_000_003
    pairs = spark.createDataFrame(
        [(a, c, 0.9), (b, c, 0.9)], "id_a long, id_b long, jaccard double"
    )
    victims = {r.doc_id
               for r in cluster_victims_from_pairs(pairs).collect()}
    assert victims == {b, c}


def test_exact_dedup_null_text_family_still_dedups(spark):
    # md5(NULL) is NULL; the victims join must be null-safe so a family
    # of NULL-text docs keeps exactly the min id (r05 review finding)
    from autoner_spark.dedup import apply_corpus_dedup

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text"), (4, None)],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in apply_corpus_dedup(docs, "exact").collect()}
    assert kept == {1, 3}
