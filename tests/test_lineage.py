"""Resumable runs: kill a bucket, rerun, only that bucket recomputes."""

import os
import shutil

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.lineage import (
    bucketize_transcripts,
    completed_buckets,
    metrics_df,
    read_lineage,
    tag_resumable,
)
from autoner_spark.tagger import tag_transcripts

N_BUCKETS = 4


def test_resume_skips_completed_buckets(spark, tmp_path):
    out = str(tmp_path / "run")
    trie = build_trie(synth.dict_spec())
    transcripts = synth.synth_transcripts(spark, 25, partitions=4)
    bucketize_transcripts(transcripts, out, N_BUCKETS)

    m1 = tag_resumable(spark, trie, out, N_BUCKETS)
    full = {tuple(r) for r in m1.drop("bucket").collect()}
    assert completed_buckets(out) == set(range(N_BUCKETS))
    lineage1 = read_lineage(out)
    assert len(lineage1) == N_BUCKETS
    assert sum(r["n_turns"] for r in lineage1) == transcripts.count()

    # baseline: direct tagging of the same corpus matches the bucketed run
    direct = {
        tuple(r) for r in tag_transcripts(transcripts, trie).collect()
    }
    assert full == direct

    # simulate a failed bucket: delete its output and lineage row
    victim = 2
    shutil.rmtree(os.path.join(out, "mentions", f"bucket={victim}"))
    rows = [r for r in read_lineage(out) if r["bucket"] != victim]
    with open(os.path.join(out, "lineage.jsonl"), "w") as f:
        import json

        for r in rows:
            f.write(json.dumps(r) + "\n")

    # record mtimes of surviving bucket outputs
    def mtimes():
        out_m = {}
        for b in range(N_BUCKETS):
            p = os.path.join(out, "mentions", f"bucket={b}")
            if os.path.exists(p):
                out_m[b] = max(
                    os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
                )
        return out_m

    before = mtimes()
    m2 = tag_resumable(spark, trie, out, N_BUCKETS)
    after = mtimes()

    # only the victim was recomputed
    for b in range(N_BUCKETS):
        if b == victim:
            assert after[b] >= before.get(b, 0) or b not in before
        else:
            assert after[b] == before[b], f"bucket {b} was needlessly rewritten"

    assert {tuple(r) for r in m2.drop("bucket").collect()} == full
    assert completed_buckets(out) == set(range(N_BUCKETS))


def test_resume_tolerates_empty_buckets(spark, tmp_path):
    """A hash bucket that received zero conversations has no bucket=N
    directory; the resumable run must record it as completed-empty instead
    of aborting on PATH_NOT_FOUND."""
    out = str(tmp_path / "run")
    trie = build_trie(synth.dict_spec())
    transcripts = synth.synth_transcripts(spark, 3, partitions=2)
    n_buckets = 16  # >> n_convs: some buckets are guaranteed empty
    bucketize_transcripts(transcripts, out, n_buckets)

    m = tag_resumable(spark, trie, out, n_buckets)
    assert completed_buckets(out) == set(range(n_buckets))
    lineage = read_lineage(out)
    empties = [r for r in lineage if r["n_turns"] == 0]
    assert empties, "fixture should produce at least one empty bucket"
    assert all(r["n_mentions"] == 0 for r in empties)
    assert sum(r["n_turns"] for r in lineage) == transcripts.count()

    direct = {tuple(r) for r in tag_transcripts(transcripts, trie).collect()}
    assert {tuple(r) for r in m.drop("bucket").collect()} == direct

    # rerun: nothing recomputes, nothing breaks
    m2 = tag_resumable(spark, trie, out, n_buckets)
    assert {tuple(r) for r in m2.drop("bucket").collect()} == direct
    assert len(read_lineage(out)) == n_buckets


def test_metrics_table(spark, tmp_path):
    out = str(tmp_path / "run")
    trie = build_trie(synth.dict_spec())
    bucketize_transcripts(
        synth.synth_transcripts(spark, 8, partitions=2), out, 2
    )
    tag_resumable(spark, trie, out, 2)
    m = metrics_df(spark, out)
    rows = m.collect()
    assert {r.bucket for r in rows} == {0, 1}
    assert all(r.wall_ms >= 0 and r.n_turns > 0 for r in rows)
