"""Driver-divergence repro harness.

When the driver's correctness gate records a hash-red that the local gate
(tools/check_correctness.py) cannot reproduce, the divergence must live in
one of the free variables the local gate pins: the Spark session config
(the driver hands queries ITS session, not session.py's UTC-pinned one),
the comparison normalization (the local gate rounds floats at 6dp; the
driver may hash raw values), or the engine version skew (the driver's
DuckDB need not be this sandbox's 1.0.0 — only the Spark side of THAT gap
is sweepable here).

This harness runs a named query on BOTH engines across a matrix of Spark
session configurations:

  base       session.py defaults (UTC, AQE, arrow, 32 shuffle parts)
  bare       a plain ``SparkSession.builder.master(...)`` with NO configs —
             the closest stand-in for the driver's own session
  tz_ny      session timeZone America/New_York (timestamp-literal casts
             resolve in session TZ; parquet-naive micros do not)
  tz_tokyo   session timeZone Asia/Tokyo (shifts the other direction)
  ansi       spark.sql.ansi.enabled=true
  noaqe      adaptive execution off
  parts200   spark.sql.shuffle.partitions=200 (the stock default)
  noarrow    arrow collect off (collect() falls back to pickle path)

and compares the Spark result against the DuckDB oracle RAW — values via
``repr`` with NO float rounding — printing the first differing rows
un-normalized, plus a second comparison under the local gate's 6dp
normalization so "driver-red but gate-green" divergences (sub-6dp float
noise, raw-repr mismatches) are immediately visible as RAW=DIFF/NORM=ok.

Each config uses a fresh SparkSession (stop + rebuild); sweep multiple
scale factors by passing --sf more than once.

Usage:
    python tools/repro_divergence.py QUERY [QUERY...]
        [--sf /root/testdata/sf0.01 ...] [--configs base,bare,tz_ny,...]
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

CONFIG_MATRIX: dict[str, dict[str, str] | None] = {
    # None => bare builder, no configs at all (driver-session stand-in)
    "base": {},
    "bare": None,
    "tz_ny": {"spark.sql.session.timeZone": "America/New_York"},
    "tz_tokyo": {"spark.sql.session.timeZone": "Asia/Tokyo"},
    "ansi": {"spark.sql.ansi.enabled": "true"},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "parts200": {"spark.sql.shuffle.partitions": "200"},
    "noarrow": {"spark.sql.execution.arrow.pyspark.enabled": "false"},
}


def norm6(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def raw(v):
    if isinstance(v, float):
        return repr(v)  # full shortest-repr precision, ULP-visible
    return "NULL" if v is None else str(v)


def canon(rows, cols, normalizer):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalizer(r[i]) for i in order) for r in rows)


def build_session(cfg_name: str):
    from pyspark.sql import SparkSession

    cfg = CONFIG_MATRIX[cfg_name]
    if cfg is None:
        return (
            SparkSession.builder.appName(f"repro-{cfg_name}")
            .master("local[8]")
            .getOrCreate()
        )
    from autoner_spark.session import get_spark

    return get_spark(f"repro-{cfg_name}", cores=8, extra_conf=cfg)


def run_matrix(query_names, sf_dirs, cfg_names):
    import duckdb

    import __spark_entry__ as entrymod
    from autoner_spark.caching import release_caches

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        duck_cache: dict[str, tuple[list, list]] = {}
        for cfg_name in cfg_names:
            spark = build_session(cfg_name)
            for name in query_names:
                if name not in qs:
                    print(f"?? unknown query {name}")
                    continue
                try:
                    df = qs[name](spark, sf_dir)
                    spark_rows = [tuple(r) for r in df.collect()]
                    spark_cols = df.columns
                    release_caches()
                except Exception as e:  # noqa: BLE001
                    print(f"[{sf_dir} {cfg_name}] {name}: SPARK ERROR {e}")
                    bad.append((sf_dir, cfg_name, name, "spark-error"))
                    continue
                if name not in oracles:
                    print(f"[{sf_dir} {cfg_name}] {name}: no oracle, "
                          f"{len(spark_rows)} rows")
                    continue
                if name not in duck_cache:
                    res = con.execute(oracles[name])
                    duck_cache[name] = (
                        [d[0] for d in res.description], res.fetchall())
                duck_cols, duck_rows = duck_cache[name]
                status = []
                if len(spark_rows) != len(duck_rows):
                    status.append(
                        f"ROWS spark={len(spark_rows)} duck={len(duck_rows)}")
                a_raw = canon(spark_rows, spark_cols, raw)
                b_raw = canon(duck_rows, duck_cols, raw)
                a_n = canon(spark_rows, spark_cols, norm6)
                b_n = canon(duck_rows, duck_cols, norm6)
                raw_ok, norm_ok = a_raw == b_raw, a_n == b_n
                tag = (
                    "ok" if raw_ok
                    else ("RAW=DIFF/NORM=ok" if norm_ok else "DIFF")
                )
                print(f"[{sf_dir} {cfg_name}] {name}: {tag} "
                      f"{' '.join(status)}")
                if not raw_ok:
                    diffs = [(x, y) for x, y in zip(a_raw, b_raw) if x != y]
                    for x, y in diffs[:3]:
                        print(f"    spark={x}")
                        print(f"    duck ={y}")
                    if len(a_raw) != len(b_raw):
                        print(f"    (row-count diff {len(a_raw)} vs "
                              f"{len(b_raw)})")
                    bad.append((sf_dir, cfg_name, name, tag))
            spark.stop()
        con.close()
    print()
    if bad:
        print("DIVERGENCES:")
        for row in bad:
            print("  ", row)
    else:
        print("no divergence reproduced across the matrix")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", action="append", default=None)
    ap.add_argument("--configs", default=",".join(CONFIG_MATRIX))
    args = ap.parse_args()
    sf_dirs = args.sf or ["/root/testdata/sf0.01"]
    cfg_names = [c for c in args.configs.split(",") if c]
    bad = run_matrix(args.queries, sf_dirs, cfg_names)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
