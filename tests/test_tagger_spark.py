"""Distributed tagger vs single-node oracle: the P/R >= 0.95 gate.

The Spark tagger (autoner_spark.tagger — independent optimized
implementation) must emit exactly the oracle's typed spans on the synthetic
transcripts table. Since the oracle itself is byte-for-byte identical to the
compiled reference binary (tests/test_reference_binary.py), this transitively
pins the distributed pipeline to the reference tagger at P = R = 1.0.
"""

import pytest

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.oracle import tag_turn
from autoner_spark.tagger import compile_trie, tag_tokens_compiled, tag_transcripts
from autoner_spark.textutil import tokenize_turn

N_CONVS = 30


@pytest.fixture(scope="module")
def trie():
    return build_trie(synth.dict_spec())


def oracle_spans(rows, trie):
    gold = set()
    for row in rows:
        toks = tokenize_turn(row["text"])
        for m in tag_turn(toks, trie):
            gold.add(
                (row["conv_id"], row["turn_idx"], m.begin_tok, m.end_tok,
                 m.surface, m.entity_type)
            )
    return gold


def test_compiled_dp_matches_oracle_per_turn(trie):
    """Fast path vs readable oracle, turn by turn (no Spark)."""
    compiled = compile_trie(trie)
    rows = synth.local_rows(n_convs=N_CONVS)
    for row in rows:
        toks = tokenize_turn(row["text"])
        fast = tag_tokens_compiled(toks, compiled)
        slow = [
            (m.begin_tok, m.end_tok, m.surface, m.entity_type)
            for m in tag_turn(toks, trie)
        ]
        assert fast == slow, f"mismatch on {row['conv_id']}#{row['turn_idx']}: {row['text']!r}"


def test_spark_tagger_matches_oracle_exactly(spark, trie):
    rows = synth.local_rows(n_convs=N_CONVS)
    transcripts = synth.synth_transcripts(spark, N_CONVS, partitions=5)
    mentions = tag_transcripts(transcripts, trie)
    got = {
        (r.conv_id, r.turn_idx, r.begin_tok, r.end_tok, r.surface, r.entity_type)
        for r in mentions.collect()
    }
    gold = oracle_spans(rows, trie)
    assert gold, "fixture must produce mentions"
    # exact parity -> P = R = 1.0 (gate is >= 0.95)
    assert got == gold


def test_spark_tagger_deterministic_across_partitioning(spark, trie):
    a = tag_transcripts(synth.synth_transcripts(spark, 10, partitions=1), trie)
    b = tag_transcripts(synth.synth_transcripts(spark, 10, partitions=7), trie)
    sa = {tuple(r) for r in a.collect()}
    sb = {tuple(r) for r in b.collect()}
    assert sa == sb


def test_per_turn_text_equality_invariant(spark):
    """input_hint invariant: reassembled per-turn token stream == text."""
    from pyspark.sql import functions as F

    t = synth.synth_transcripts(spark, 10, partitions=3)
    bad = t.filter(
        F.array_join(F.split(F.col("text"), " "), " ") != F.col("text")
    ).count()
    assert bad == 0
