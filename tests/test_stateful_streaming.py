"""applyInPandasWithState operator: streaming totals == batch totals."""

from pyspark.sql import functions as F

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.streaming.stateful import conversation_state
from autoner_spark.streaming.stream_tagger import (
    read_transcripts_stream,
    run_available_now,
    tag_stream,
)
from autoner_spark.tagger import tag_transcripts


def test_stateful_conversation_totals(spark, tmp_path):
    path = str(tmp_path / "in")
    # spread each conversation across files so per-file micro-batches
    # exercise state ACROSS batches
    synth.synth_transcripts(spark, 10, partitions=4).repartition(
        6, "turn_idx"
    ).write.parquet(path)
    trie = build_trie(synth.dict_spec())

    # several micro-batches so state carries ACROSS batches
    stream = read_transcripts_stream(spark, path, max_files_per_trigger=1)
    mentions = tag_stream(stream, trie, spark=spark)
    totals = conversation_state(mentions.drop("ts"))
    run_available_now(
        totals, "conv_state", str(tmp_path / "ck"), output_mode="update"
    )
    # update mode re-emits a conversation each time it changes; the LAST
    # emission (max totals — they only grow) is the final state
    got = {
        r.conv_id: (r.n_mentions, r.n_distinct_surfaces)
        for r in spark.table("conv_state")
        .groupBy("conv_id")
        .agg(
            F.max("n_mentions").alias("n_mentions"),
            F.max("n_distinct_surfaces").alias("n_distinct_surfaces"),
        )
        .collect()
    }

    batch = tag_transcripts(spark.read.parquet(path), trie)
    want = {
        r.conv_id: (r.n, r.d)
        for r in batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("surface").alias("d"),
        )
        .collect()
    }
    assert got == want and got

    # state really did span multiple micro-batches: at least one conv was
    # emitted more than once
    emissions = (
        spark.table("conv_state").groupBy("conv_id").count().collect()
    )
    assert any(r["count"] > 1 for r in emissions)
