"""Materialize the DP-chain golden tables (see autoner_spark/golden.py).

    python tools/make_golden.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.01, out_dir=golden/sf0.01 (the paths the
committed oracle_sql() twins read). Pure Python — no SparkSession.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from autoner_spark.golden import write_golden  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "golden/sf0.01"
    counts = write_golden(sf_dir, out_dir)
    for name, n in counts.items():
        print(f"{name}: {n} rows -> {out_dir}/{name}.parquet")


if __name__ == "__main__":
    main()
