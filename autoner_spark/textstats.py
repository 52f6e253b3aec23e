"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting — all JVM-side expressions (no UDFs).

Language ID is a marker-word heuristic (per-language stopword hit-ratio);
real corpora would use char-n-gram profiles, but the operator shape —
explode -> broadcast-join marker table -> ratio -> argmax — is the same and
is what matters at scale. The multilingual behavior is pytest-covered with
real sentences; the SQL-twin query applies the same expression to the
documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .money import half_up_scaled

STOPWORDS_EN = ["the", "a", "of", "and", "is", "to", "in"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to", "a"],
    "fr": ["le", "la", "et", "est", "les", "de"],
    "de": ["der", "die", "und", "ist", "das", "ein"],
    "es": ["el", "la", "y", "es", "los", "de"],
}


def _tokens(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len). avg_token_len is the
    integer-HALF_UP e4 mean then an exact /1e4 (r06 money sweep): the
    rational chars/tokens can sit exactly on a 4dp half (e.g. 32 tokens),
    where a fixed double round diverges across engines; the div form is
    exact integer math on both."""
    toks = _tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
    return base.select(
        "id", "n_tokens", "n_chars",
        (half_up_scaled("cast(n_chars as bigint) - (n_tokens - 1)",
                        "n_tokens", 10_000)
         / F.lit(10000.0)).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, n_tokens, stopword_ratio, distinct_ratio, quality):
    quality = distinct_ratio * (1 - stopword_ratio), rounded — a
    length/stopword/diversity heuristic in the C4/Gopher-rules family."""
    toks = _tokens(text_col)
    sw = F.array([F.lit(w) for w in STOPWORDS_EN])
    # integer HALF_UP at ppm scale then exact /1e6 (r06 money sweep):
    # s/n, d/n and d*(n-s)/n^2 are rationals that can sit exactly on a
    # 6dp half, where Spark's decimal-exact round and DuckDB's
    # FP-multiply round diverge; the div form is exact on both engines.
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("_n"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .alias("_s"),
        F.size(F.array_distinct(toks)).alias("_d"),
    )
    return base.select(
        "id",
        F.col("_n").alias("n_tokens"),
        (half_up_scaled("_s", "_n", 1_000_000)
         / F.lit(1000000.0)).alias("stopword_ratio"),
        (half_up_scaled("_d", "_n", 1_000_000)
         / F.lit(1000000.0)).alias("distinct_ratio"),
        (half_up_scaled("cast(_d as bigint) * (_n - _s)",
                        "cast(_n as bigint) * _n", 1_000_000)
         / F.lit(1000000.0)).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, lang_pred, marker_ratio): argmax over per-language marker-word
    hit ratios; 'und' (undetermined) when no language reaches 5%."""
    toks = _tokens(text_col)
    # integer HALF_UP ppm ratios (r06 money sweep): hits/n is a rational
    # that can sit exactly on a 6dp half; the threshold and argmax also
    # compare the exact bigints, identical on both engines.
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("_n"),
        *[
            F.size(
                F.filter(toks, lambda t: t.isin(markers))  # noqa: B023
            ).alias(f"_h_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    ppm = {
        lang: half_up_scaled(f"_h_{lang}", "_n", 1_000_000)
        for lang in LANG_MARKERS
    }
    best_ppm = F.greatest(*ppm.values())
    # first-wins among alphabetically sorted langs: build the when-chain in
    # reverse so the earliest language is the outermost condition
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (ppm[lang] >= 50000) & (ppm[lang] == best_ppm), lang
        ).otherwise(pred)
    return base.select(
        "id",
        pred.alias("lang_pred"),
        (best_ppm / F.lit(1000000.0)).alias("marker_ratio"),
    )


def pack_token_bins(
    docs: DataFrame,
    bin_tokens: int = 2048,
    block_docs: int = 4096,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, bin, n_docs, n_tokens, first_doc, last_doc): token-budget
    packing — within each source shard, documents laid out in id order are
    cut into ``bin_tokens``-token bins by starting offset (LLM sample
    packing, relational form).

    The running sum is a TWO-PASS DISTRIBUTED PREFIX SUM, not a single
    window over the whole source: a real corpus has a handful of sources,
    so ``Window.partitionBy(source)`` would serialize ~the entire corpus
    through one window partition (a driver-style bottleneck hiding in an
    executor). Instead:

    1. pass 1 — running sum within (source, block), where block =
       floor(id / block_docs): every window partition is <= block_docs
       rows, so the pass parallelizes across corpus/block_docs tasks;
    2. pass 2 — per-block subtotals (one algebraic groupBy, map-side
       combined) are turned into exclusive per-block offsets with a window
       over the TINY subtotal relation (corpus/block_docs rows), then
       broadcast-joined back; cum = local_cum + block_offset.

    Identical output to the naive single-window form (pinned by pytest on
    a one-dominant-source fixture); at 10^10 docs the subtotal relation is
    ~10^6 rows — still a driver-safe broadcast; raise ``block_docs`` to
    shrink it further."""
    n_tok = F.size(F.split(F.col(text_col), " "))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        n_tok.alias("n_tokens"),
        F.floor(F.col(id_col) / block_docs).cast("long").alias("blk"),
    )
    w_local = Window.partitionBy("source", "blk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    sub = base.groupBy("source", "blk").agg(F.sum("n_tokens").alias("tot"))
    w_off = Window.partitionBy("source").orderBy("blk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sub.select(
        "source", "blk",
        (F.sum("tot").over(w_off) - F.col("tot")).alias("blk_off"),
    )
    laid = (
        local.join(F.broadcast(offsets), ["source", "blk"])
        .withColumn("cum", F.col("local_cum") + F.col("blk_off"))
        .withColumn(
            "bin",
            F.floor((F.col("cum") - F.col("n_tokens")) / bin_tokens).cast("int"),
        )
    )
    return laid.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def repetition_stats(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_shingles, max_repeat, rep_ratio): within-document n-gram
    repetition — the Gopher-rules family's "fraction of characters in
    duplicated n-grams" quality signal, in token-n-gram form. rep_ratio =
    fraction of n-gram occurrences whose n-gram appears more than once in
    the document; max_repeat = the most-repeated n-gram's count. Boilerplate
    and looping generations score high; documents shorter than n tokens
    yield no shingles and are absent (match with a left join if 0-rows are
    needed). Two algebraic aggregations, map-side combined — scale-safe."""
    from .dedup import shingles_df

    # r07 note: an in-row sort + run-length-aggregate form (zero shuffles)
    # was tried and MEASURED SLOWER (1.68s vs 0.89s at sf0.1): Spark's
    # higher-order aggregate() with a struct accumulator evaluates
    # interpreted per element, and the two aggregations below are algebraic
    # map-side-combined shuffles of per-doc-bounded groups — kept.
    per = (
        shingles_df(docs, n, id_col, text_col, distinct=False)
        .groupBy("id", "shingle")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("id").agg(
        F.sum("c").alias("_tot"),
        F.max("c").cast("int").alias("max_repeat"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
    )
    # integer HALF_UP ppm then exact /1e6 (r06 money sweep): dup/tot is a
    # rational that can sit exactly on a 6dp half across engines
    return agg.select(
        "id",
        F.col("_tot").cast("int").alias("n_shingles"),
        "max_repeat",
        (half_up_scaled("_dup", "_tot", 1_000_000)
         / F.lit(1000000.0)).alias("rep_ratio"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, fp, n_tokens, len_bucket): md5 fingerprint of the
    whitespace-normalized text + coarse length bucket (dedup/sharding key)."""
    norm = F.array_join(F.split(F.col(text_col), " "), " ")
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fp"),
        F.size(_tokens(text_col)).alias("n_tokens"),
        F.floor(F.log2(F.length(F.col(text_col)) + 1)).cast("int").alias("len_bucket"),
    )
