"""Robustness: every registry query must run (not crash) on EMPTY tables.

Zero-row inputs exercise the edge paths that blow up distributed jobs in
production: descending sequence() ranges, first()/head() on empty
relations, empty broadcast sides, CC with no edges, windows over nothing.
Expected: every query returns a DataFrame and collect() succeeds (0 rows,
or a single all-zero/null aggregate row).
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        df = spark.read.parquet(f"{SF}/{t}.parquet")
        df.limit(0).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_empty_tables(spark, empty_sf):
    from autoner_spark.caching import release_caches
    from autoner_spark.queries import QUERIES

    failures = {}
    for name, fn in QUERIES.items():
        try:
            rows = fn(spark, empty_sf).collect()
            assert isinstance(rows, list)
        except Exception as e:  # noqa: BLE001 — collect everything, report once
            failures[name] = f"{type(e).__name__}: {str(e)[:160]}"
        finally:
            release_caches()
    assert not failures, failures
