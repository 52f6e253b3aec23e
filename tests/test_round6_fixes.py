"""Round-6 ADVICE fixes: router laziness + route-invariant jaccard.

1. ``ngram_jaccard_pairs_routed(route=...)`` must build the plan WITHOUT
   the eager pair-mass profile job (the no-eager-job-at-plan-build
   contract the r05 review applied to hyperplane_bits).
2. Both routes must score a pair over the SAME df-capped shingle
   universe: the exact form computes Jaccard post-cap, so the LSH verify
   pass has to apply the identical cap or the same pair flips value (and
   possibly threshold side) depending on which side of the pair budget
   the corpus landed.
"""

from __future__ import annotations

import pytest

from autoner_spark import dedup


# NOTE: no local spark fixture — the session-scoped conftest fixture is
# used. A module-scoped get_spark().stop() here kills the SHARED
# SparkContext (getOrCreate returns one JVM context) for every module
# that runs after this one.


def _docs(spark):
    # 8 docs sharing one boilerplate prefix (df=8: ubiquitous under a
    # df cap of 4) + a group-shared body (df=4: survives the cap) + one
    # unique suffix token (df=1), so capping genuinely changes in-group
    # pair values (boilerplate shingles leave both inter and union)
    boiler = "terms of service apply to all"
    bodies = ["aaa bbb ccc ddd eee", "fff ggg hhh iii jjj"]
    rows = [
        (i, f"{boiler} {bodies[i // 4]} u{i}")
        for i in range(8)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_route_override_skips_the_eager_profile_job(spark, monkeypatch):
    docs = _docs(spark)

    def boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("profile job ran despite explicit route")

    monkeypatch.setattr(dedup, "estimate_candidate_pair_mass", boom)
    # plan construction must not trigger the profile (nor any Spark job)
    exact = dedup.ngram_jaccard_pairs_routed(docs, route="exact")
    lsh = dedup.ngram_jaccard_pairs_routed(docs, route="lsh")
    assert set(exact.columns) == {"id_a", "id_b", "jaccard"}
    assert set(lsh.columns) == {"id_a", "id_b", "jaccard"}
    with pytest.raises(ValueError):
        dedup.ngram_jaccard_pairs_routed(docs, route="fastest")


def test_registry_wrapper_honors_route_env_override(spark, monkeypatch):
    """The REGISTRY entry (the only form the gate/driver can call) must
    also be buildable lazily: AUTONER_JACCARD_ROUTE pins the route so
    q_dedup_jaccard_routed constructs no eager profile job (the r06
    review found the env knob existed in dedup.py but the registry
    wrapper never forwarded it)."""
    from autoner_spark import queries as Q

    def boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("profile job ran despite env route override")

    monkeypatch.setattr(dedup, "estimate_candidate_pair_mass", boom)
    monkeypatch.setenv("AUTONER_JACCARD_ROUTE", "exact")
    df = Q.q_dedup_jaccard_routed(spark, "/root/testdata/sf0.001")
    assert set(df.columns) == {"id_a", "id_b", "jaccard"}
    from autoner_spark.caching import release_caches

    release_caches()


def test_routes_agree_on_pair_values_under_df_cap(spark):
    docs = _docs(spark)
    cap = 4  # the boilerplate shingles (df=8) are dropped by the cap
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.1, max_shingle_df=cap).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs_routed(
            docs, threshold=0.1, max_shingle_df=cap, route="lsh").collect()
    }
    from autoner_spark.caching import release_caches

    release_caches()
    assert exact, "fixture produced no exact pairs"
    assert lsh, "fixture produced no LSH pairs"
    # every pair found by BOTH routes carries the identical capped-universe
    # jaccard (recall may differ — the LSH band guarantee — values not)
    common = set(exact) & set(lsh)
    assert common, "no overlapping pairs to compare"
    for pair in common:
        assert exact[pair] == lsh[pair], (pair, exact[pair], lsh[pair])
    # and the cap actually bit: an uncapped exact run scores differently
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.1, max_shingle_df=None).collect()
    }
    release_caches()
    assert any(uncapped.get(p) != exact[p] for p in exact), (
        "df cap did not change any value; fixture too weak")


def test_registry_wrapper_rejects_lossy_route_override(spark, monkeypatch):
    """Only 'exact' (lossless) is honored from the environment: an
    inherited 'lsh' would shrink the emitted row set to the LSH band
    guarantee while the oracle twin stays exact — the r06 review's
    spurious-gate-red scenario — so it must fail loudly at plan build."""
    import pytest

    from autoner_spark import queries as Q

    monkeypatch.setenv("AUTONER_JACCARD_ROUTE", "lsh")
    with pytest.raises(ValueError, match="row set"):
        Q.q_dedup_jaccard_routed(spark, "/root/testdata/sf0.001")
