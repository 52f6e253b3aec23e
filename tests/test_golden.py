"""Golden-table pinning: the pure-Python oracle replay (autoner_spark.golden)
must equal the distributed Spark queries exactly, and the COMMITTED sf0.01
golden parquet files must equal a fresh regeneration (no staleness)."""

import os

import pyarrow.parquet as pq
import pytest

from autoner_spark import golden
from autoner_spark import queries as Q

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "golden", "sf0.01")

SPARK_QUERIES = {
    "kg_tag_mentions_dp": Q.q_kg_tag_mentions_dp,
    "kg_labels_dp": Q.q_kg_labels_dp,
    "kg_mentions_markup": Q.q_kg_mentions_markup,
    "kg_triples_dp": Q.q_kg_triples_dp,
}


@pytest.fixture(scope="module")
def golden_small():
    return golden.compute_golden(SF_SMALL)


@pytest.mark.parametrize("name", sorted(golden.GOLDEN_BUILDERS))
def test_golden_matches_spark(spark, golden_small, name):
    """Independent-implementation cross-check at sf0.001: distributed
    mapInArrow/mapInPandas chain == single-node oracle replay."""
    got = sorted(tuple(r) for r in SPARK_QUERIES[name](spark, SF_SMALL).collect())
    want = sorted(golden_small[name])
    assert got == want


def test_raw_ingestion_reproduces_pretokenized(spark, golden_small):
    """Char-class raw-text ingestion (kg_tag_mentions_raw): punctuated
    untokenized prose must yield exactly the pre-tokenized DP mentions
    (separator tokens are dropped from the stream)."""
    got = sorted(
        tuple(r)
        for r in Q.q_kg_tag_mentions_raw(spark, SF_SMALL).collect()
    )
    assert got == sorted(golden_small["kg_tag_mentions_dp"])


@pytest.mark.parametrize("name", sorted(golden.GOLDEN_BUILDERS))
def test_committed_golden_not_stale(name):
    """The sf0.01 parquet files the oracle_sql() twins read must match a
    fresh regeneration (rerun `python tools/make_golden.py` if this fails)."""
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"missing committed golden: {path}"
    committed = sorted(
        tuple(r) for r in zip(*(c.to_pylist() for c in pq.read_table(path).columns))
    )
    turns = golden.golden_transcripts(f"{SF_GATE}/documents.parquet")
    fresh = sorted(golden.GOLDEN_BUILDERS[name][0](turns, golden._kg_trie()))
    assert committed == fresh
