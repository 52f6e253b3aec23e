"""Span-set evaluation: typed exact-match P/R/F1 as distributed joins.

Re-expresses the reference's ``evaluate_ner`` (model_partial_ner/
utils.py:119-180) — set intersection of typed spans with +1e-6-smoothed
precision/recall/F1, plus the per-type breakdown — as DataFrame joins and
hash aggregations. Spans are deduplicated before counting (the reference
compares Python SETS of ``type@(l,r)`` strings). This is the P/R >= 0.95
gate's measurement operator (BASELINE.json).

At scale the inner join shuffles on the span key; both sides are
pre-aggregated (distinct) so the shuffle carries unique spans only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SPAN_KEYS = ["conv_id", "turn_idx", "begin_tok", "end_tok", "entity_type"]
_SMOOTH = 0.000001  # utils.py:171-173


def _prf(overlap: float, guess: float, gold: float) -> tuple[float, float, float]:
    pre = overlap / (guess + _SMOOTH)
    rec = overlap / (gold + _SMOOTH)
    f1 = 2 * pre * rec / (pre + rec + _SMOOTH)
    return pre, rec, f1


def span_prf(pred: DataFrame, gold: DataFrame,
             keys: list[str] = SPAN_KEYS) -> dict[str, float]:
    """Overall typed-span precision/recall/F1 (utils.py:152-173)."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    overlap = p.join(g, keys, "inner").count()
    return dict(zip(
        ("precision", "recall", "f1"),
        _prf(float(overlap), float(p.count()), float(g.count())),
    ))


def spans_from_labels(labels_long: DataFrame) -> DataFrame:
    """Tie-or-Break labels (long form: conv_id, turn_idx, tok_idx, boundary,
    entity_type) -> typed spans, the relational analogue of
    ``NER.to_span``/``to_typed_span`` (model_partial_ner/ner.py:176-239):
    consecutive Break positions (boundary == 1) delimit segments, a
    segment's type is the type at its start, and None-typed segments are
    not emitted. The final segment is closed at the turn end (the
    reference's <eof> break). One window pass + one length join; no UDF.
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("tok_idx")
    lens = labels_long.groupBy("conv_id", "turn_idx").agg(
        (F.max("tok_idx") + 1).alias("n_toks")
    )
    breaks = labels_long.filter(F.col("boundary") == 1).select(
        "conv_id", "turn_idx", "tok_idx", "entity_type"
    )
    sp = (
        breaks.withColumn("next_break", F.lead("tok_idx").over(w))
        .join(lens, ["conv_id", "turn_idx"])
        .select(
            "conv_id", "turn_idx",
            F.col("tok_idx").alias("begin_tok"),
            F.coalesce("next_break", "n_toks").cast("int").alias("end_tok"),
            "entity_type",
        )
    )
    return sp.filter(F.col("entity_type") != "None")


def single_row_prf(pred: DataFrame, gold: DataFrame,
                   keys: list[str]) -> DataFrame:
    """(gold_cnt, guess_cnt, overlap_cnt, precision, recall, f1) as ONE row
    — the overall-metric shape of evaluate_chunking / evaluate_typing
    (model_partial_ner/utils.py:28-117), +1e-6 smoothing included."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    guess = p.agg(F.count("*").alias("guess_cnt"))
    golds = g.agg(F.count("*").alias("gold_cnt"))
    over = p.join(g, keys, "inner").agg(F.count("*").alias("overlap_cnt"))
    row = golds.crossJoin(guess).crossJoin(over)
    pre = F.col("overlap_cnt") / (F.col("guess_cnt") + F.lit(_SMOOTH))
    rec = F.col("overlap_cnt") / (F.col("gold_cnt") + F.lit(_SMOOTH))
    return row.select(
        "gold_cnt", "guess_cnt", "overlap_cnt",
        F.round(pre, 6).alias("precision"),  # money: coprime
        F.round(rec, 6).alias("recall"),  # money: coprime
        F.round(2 * pre * rec / (pre + rec + F.lit(_SMOOTH)), 6).alias("f1"),  # money: coprime
    )


def per_type_prf(pred: DataFrame, gold: DataFrame,
                 keys: list[str] = SPAN_KEYS) -> DataFrame:
    """Per-entity-type counts + P/R/F1 (utils.py:160-178) as a DataFrame:
    (entity_type, gold_cnt, guess_cnt, overlap_cnt, precision, recall, f1).
    """
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    guess = p.groupBy("entity_type").agg(F.count("*").alias("guess_cnt"))
    golds = g.groupBy("entity_type").agg(F.count("*").alias("gold_cnt"))
    over = (
        p.join(g, keys, "inner")
        .groupBy("entity_type")
        .agg(F.count("*").alias("overlap_cnt"))
    )
    joined = (
        golds.join(guess, "entity_type", "full")
        .join(over, "entity_type", "full")
        .fillna(0, ["gold_cnt", "guess_cnt", "overlap_cnt"])
    )
    pre = F.col("overlap_cnt") / (F.col("guess_cnt") + F.lit(_SMOOTH))
    rec = F.col("overlap_cnt") / (F.col("gold_cnt") + F.lit(_SMOOTH))
    return joined.select(
        "entity_type", "gold_cnt", "guess_cnt", "overlap_cnt",
        pre.alias("precision"),
        rec.alias("recall"),
        (2 * pre * rec / (pre + rec + F.lit(_SMOOTH))).alias("f1"),
    )
