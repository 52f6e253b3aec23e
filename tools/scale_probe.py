"""spark-submit target: time the tag job inside the submitted application.

Prints one JSON line {"cores": N, "n_turns": ..., "sec": median, ...};
tools/run_scaling_submit.py orchestrates two cluster sizes.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    corpus = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("scale-probe").getOrCreate()
    cores = spark.sparkContext.defaultParallelism

    from autoner_spark import synth
    from autoner_spark.dictionary import build_trie
    from autoner_spark.tagger import tag_transcripts

    trie = build_trie(synth.bench_dict_spec())
    df = spark.read.parquet(corpus)
    n_turns = tag_transcripts(df, trie).count() and df.count()
    tag_transcripts(df, trie).count()  # full warmup (workers + broadcast)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        tag_transcripts(df, trie).count()
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[len(times) // 2]
    print(json.dumps({
        "cores": cores,
        "n_turns": n_turns,
        "sec": round(sec, 3),
        "turns_per_sec": round(n_turns / sec),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
