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
