"""North-rule-shaped scaling measurement: the SAME spark-submit --py-files
job at two cluster sizes (N and 4N cores — the sandbox stand-in for N and
4N executors), identical input, throughput at both + efficiency.

Usage: python tools/run_scaling_submit.py [corpus_dir] [lo] [hi]
(defaults: the bench corpus at sf0.1; lo=4, hi=16 — see BENCH.md for the
pairing rationale). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cores: int, corpus: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    res = subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--conf", "spark.sql.shuffle.partitions=%d" % cores,
            "--conf", "spark.sql.files.maxPartitionBytes=4194304",
            "--conf", "spark.ui.enabled=false",
            "--py-files", os.path.join(ROOT, "dist", "autoner_spark.zip"),
            os.path.join(ROOT, "tools", "scale_probe.py"),
            corpus,
        ],
        capture_output=True, text=True, env=env, check=True,
    )
    for line in res.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from probe: {res.stdout[-500:]}\n{res.stderr[-500:]}")


def main() -> None:
    default_corpus = None
    for d in sorted(os.listdir("/tmp")):
        if d.startswith("autoner_bench_corpus") and os.path.exists(
            f"/tmp/{d}/transcripts/_SUCCESS"
        ):
            default_corpus = f"/tmp/{d}/transcripts"
    corpus = sys.argv[1] if len(sys.argv) > 1 else default_corpus
    if not corpus:
        raise SystemExit("no corpus found; run bench.py once first")
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "package.py")],
                   check=True, capture_output=True)
    r_lo = probe(lo, corpus)
    r_hi = probe(hi, corpus)
    eff = (r_lo["sec"] * lo) / (r_hi["sec"] * hi)
    print(json.dumps({
        "mode": "spark-submit --py-files",
        "corpus": corpus,
        "lo": r_lo,
        "hi": r_hi,
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
