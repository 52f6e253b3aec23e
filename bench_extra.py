"""Supplementary measurements for OPTIMIZATION_r07 (bench.py is frozen).

Usage:
  python bench_extra.py tag [cores ...]     # tag-stage timing, bench corpus
  python bench_extra.py query NAME [...]    # noop-sink isolation per query
  python bench_extra.py explain NAME [...]  # dump .explain("formatted")

Never run concurrently with bench.py or the correctness gate.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from autoner_spark import queries as Q  # noqa: E402
from autoner_spark import synth  # noqa: E402
from autoner_spark.dictionary import build_trie  # noqa: E402
from autoner_spark.session import get_spark  # noqa: E402
from autoner_spark.tagger import tag_transcripts  # noqa: E402

CORPUS = "/tmp/autoner_bench_corpus_v2_sf0.1_c300000_f12-30"


def tag_cmd(cores_list: list[int]) -> None:
    trie = build_trie(synth.bench_dict_spec())
    for cores in cores_list:
        spark = get_spark(
            f"bx-tag-{cores}",
            cores=cores,
            shuffle_partitions=cores,
            extra_conf={
                "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
                "spark.sql.files.openCostInBytes": str(256 * 1024),
            },
        )
        try:
            df = spark.read.parquet(os.path.join(CORPUS, "transcripts"))
            tag_transcripts(df, trie).count()  # warmup
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = tag_transcripts(df, trie).count()
                times.append(time.perf_counter() - t0)
            med = sorted(times)[1]
            print(
                f"tag cores={cores}: med={med:.2f}s min={min(times):.2f}s "
                f"all={[round(t, 2) for t in times]} rows={n}",
                flush=True,
            )
        finally:
            spark.stop()


def query_cmd(names: list[str], runs: int = 3) -> None:
    from autoner_spark.caching import release_caches

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bx-query", cores=cpus, shuffle_partitions=cpus)
    Q.QUERIES["kg_tag_mentions_dp"](spark, sf_dir).count()  # warmup
    for name in names:
        times = []
        for _ in range(runs):
            release_caches()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            f"query {name}: med={med:.3f}s all={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


def explain_cmd(names: list[str], out_dir: str | None = None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bx-explain", cores=cpus, shuffle_partitions=cpus)
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {out_dir}/{name}.txt", flush=True)
        else:
            print(f"===== {name} =====\n{plan}", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "tag"
    if cmd == "tag":
        tag_cmd([int(c) for c in (sys.argv[2:] or ["4", "16"])])
    elif cmd == "query":
        query_cmd(sys.argv[2:])
    elif cmd == "explain":
        out = None
        args = sys.argv[2:]
        if args and args[0] == "--out":
            out = args[1]
            args = args[2:]
        explain_cmd(args, out)
    else:
        raise SystemExit(f"unknown command {cmd}")
