"""Deduplication operators for large-scale training-data pipelines.

All four families are DataFrame-native (no Python in the hot path) and use
**cross-engine-portable hashing** (md5 hex -> int) so each operator has an
exact DuckDB SQL twin for the correctness gate:

* exact_dedup        — md5(text) hash-groupBy; representative = min doc_id.
* ngram_jaccard_pairs — token n-gram shingles; candidate pairs share >=1
  shingle; Jaccard via |A ∩ B| / (|A| + |B| - |A ∩ B|), all relational.
* minhash_lsh_pairs  — k salted min-hashes per doc, banded; pairs sharing a
  band bucket are near-dup candidates (classic MinHash-LSH; Broder '97 /
  Leskovec MMDS ch.3). Signatures and band hashing are pure SQL expressions.
* simhash            — 32-bit SimHash (Charikar '02) computed RELATIONALLY:
  per-token 32-bit hash, per-bit +-1 vote aggregation, bit recomposition.

Scale notes: exact dedup and minhash banding shuffle on the hash key only
(small); ngram_jaccard's shingle self-join explodes on frequent shingles —
at corpus scale, frequent-shingle filtering (drop shingles with df > K) caps
the join fan-out; parameterized here as ``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-hex prefix -> unsigned 32-bit int; identical in DuckDB via
# cast(('0x' || substring(md5(x),1,8)) as bigint)
def md5_int32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def shingles_df(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, shingle): distinct n-token shingles per document (positional
    slide over the token array, JVM-side).

    Documents with fewer than ``n`` tokens yield NO shingles: the index
    sequence is guarded with ``when(k >= 1, ...)`` because Spark's
    ``sequence(0, -1)`` is the DESCENDING [0, -1] (not empty), which would
    drive ``slice`` with an invalid start and abort the job — matching the
    SQL twins' ``t3 IS NOT NULL`` filter instead."""
    toks = _tokens(text_col)
    k = F.size(toks) - (n - 1)
    sh = F.transform(
        F.when(k >= 1, F.sequence(F.lit(0), k - 1))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(text_hash, keep_id, n_dups): groups of byte-identical texts."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"),
                    F.col(id_col).alias("id"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard >= threshold.

    Fully relational: sizes per doc, intersection via shingle equi-join,
    union by inclusion-exclusion. ``max_shingle_df`` drops ubiquitous
    shingles before the self-join (the scale guard)."""
    sh = shingles_df(docs, n, id_col, text_col)
    if max_shingle_df:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, h, minhash): k salted min-hashes over n-gram shingles."""
    sh = shingles_df(docs, n, id_col, text_col)
    salted = sh.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        "shingle",
    ).withColumn(
        "hv",
        md5_int32(F.concat_ws(":", F.col("h").cast("string"), F.col("shingle"))),
    )
    return salted.groupBy("id", "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, n_bands): candidate near-dup pairs sharing >= 1 LSH band.

    Bands: the k minhashes are grouped into k/band_size bands; a band's
    bucket key is the md5 of its concatenated minhashes; docs colliding in a
    band bucket are candidates. Shuffle key = (band, bucket) — hot buckets
    (boilerplate docs) are the skew point; AQE skew-join handles moderate
    skew, and a bucket-size cap is the production guard."""
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    banded = (
        sig.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(
            # deterministic order within band: aggregate min/max pattern not
            # enough — collect h->minhash sorted by h
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("minhash")))
            ).alias("sig_parts")
        )
        .withColumn(
            "bucket",
            F.md5(
                F.array_join(
                    F.transform(
                        F.col("sig_parts"),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ),
        )
        .select("id", "band", "bucket")
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(y, ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit SimHash over tokens, computed relationally.

    Each token's 32-bit hash votes +1/-1 per bit position; the sign of each
    bit's vote sum sets that bit. Pure integer math -> bit-identical across
    engines."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("token")
    ).withColumn("hv", md5_int32(F.col("token")))
    votes = (
        toks.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
            "hv",
        )
        .withColumn(
            "vote",
            (F.floor(F.col("hv") / F.pow(F.lit(2), F.col("b"))).cast("long")
             % 2) * 2 - 1,
        )
        .groupBy("id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2), F.col("b")).cast("long"))
            .otherwise(0)
        ).cast("long").alias("simhash")
    )
