"""Salted skew operators: identical results to unsalted, any partitioning."""

from pyspark.sql import functions as F

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.skew import (
    conversation_entities,
    replicated_salt_join,
    salted_collect_list,
)
from autoner_spark.tagger import tag_transcripts


def mentions_with_hot_conv(spark):
    # conv 0 is the synthetic hot conversation (160 turns)
    trie = build_trie(synth.dict_spec())
    return tag_transcripts(synth.synth_transcripts(spark, 15, partitions=5), trie)


def test_salted_collect_matches_plain(spark):
    m = mentions_with_hot_conv(spark).cache()
    salted = {
        (r.conv_id, tuple(r.items))
        for r in salted_collect_list(
            m, ["conv_id"], F.col("surface"), F.col("turn_idx"), n_salts=8
        ).collect()
    }
    plain = {
        (r.conv_id, tuple(sorted(r.items)))
        for r in m.groupBy("conv_id")
        .agg(F.collect_list("surface").alias("items"))
        .collect()
    }
    assert salted == plain
    hot = [items for cid, items in salted if cid == "conv-000000"]
    assert hot and len(hot[0]) > 100  # the hot key really is hot


def test_salted_collect_partition_invariant(spark):
    m = mentions_with_hot_conv(spark)
    a = salted_collect_list(
        m.repartition(1), ["conv_id"], F.col("surface"), F.col("turn_idx"), 4
    )
    b = salted_collect_list(
        m.repartition(11), ["conv_id"], F.col("surface"), F.col("turn_idx"), 16
    )
    assert {(r.conv_id, tuple(r.items)) for r in a.collect()} == {
        (r.conv_id, tuple(r.items)) for r in b.collect()
    }


def test_replicated_salt_join_matches_plain(spark):
    m = mentions_with_hot_conv(spark).cache()
    dim = m.select("surface").distinct().withColumn(
        "surface_len", F.length("surface")
    )
    salted = replicated_salt_join(
        m, dim, "surface", distributor=F.col("turn_idx"), n_salts=8
    )
    plain = m.join(dim, "surface")
    cols = ["conv_id", "turn_idx", "begin_tok", "surface", "surface_len"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_conversation_entities(spark):
    m = mentions_with_hot_conv(spark).cache()
    ce = {r.conv_id: list(r.entities) for r in conversation_entities(m).collect()}
    want = {
        r.conv_id: sorted({x.surface for x in m.filter(m.conv_id == r.conv_id).collect()})
        for r in m.select("conv_id").distinct().collect()
    }
    assert {k: sorted(v) for k, v in ce.items()} == want
