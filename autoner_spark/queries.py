"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Each public query here is exposed through ``__spark_entry__.py``. The
correctness protocol: the driver runs the Spark implementation and the
paired ANSI-SQL oracle on the same parquet tables and compares row counts,
schemas and value hashes. Queries whose semantics are not SQL-expressible
(the DP tagger and everything downstream of it) have no SQL twin and are
covered instead by the pytest oracle chain (Spark tagger == Python oracle ==
compiled C++ reference, see tests/).

The transcripts table required by BASELINE.json's input_hint does not exist
in the test data, so it is DERIVED deterministically from ``documents`` with
pure relational expressions — identically expressible in Spark and DuckDB —
and the KG dictionary over the documents vocabulary is an inline constant
rendered into SQL VALUES from the same Python list (single source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .caching import persist_tracked
from .canonicalize import connected_components
from .dictionary import DictionarySpec, build_trie
from .money import half_up_scaled
from .tagger import tag_transcripts
from .triples import dict_surfaces_df, link_mentions

# ---------------------------------------------------------------------------
# inline KG dictionary over the documents vocabulary (single source of truth)
# ---------------------------------------------------------------------------

KG_DICT_CORE: list[tuple[str, str]] = [
    ("Operator", "hash join"),
    ("Operator", "table scan"),
    ("Operator", "sort merge"),
    ("Operator", "window agg"),
    ("Operator", "merge batch"),
    ("Operator", "filter"),
    ("Object", "big table"),
    ("Object", "small table"),
    ("Object", "vector"),
    ("Object,Operator", "stream"),
    ("Metric", "key value"),
]

KG_DICT_FULL: list[str] = ["slow merge", "fast scan", "query batch", "window"]
KG_STOPWORDS: list[str] = ["the", "a"]

TURNS_PER_CONV = 8

# golden tables for the non-SQL-expressible DP chain (see autoner_spark/
# golden.py; regenerate with `python tools/make_golden.py`), materialized at
# sf0.01 — the scale the driver gate runs at. Single source of truth for
# every golden-twin SQL string AND bench.py's golden-twin skip filter.
# Derived from the package location so a relocated checkout keeps working;
# GOLDEN_SF_DIR records the ONLY sf_dir the golden twins are valid against
# (tools/check_correctness.py skips them with a warning elsewhere).
import pathlib as _pathlib

GOLDEN_DIR = str(_pathlib.Path(__file__).resolve().parents[1]
                 / "golden" / "sf0.01")
GOLDEN_SF_DIR = "/root/testdata/sf0.01"


def kg_dict_spec() -> DictionarySpec:
    return DictionarySpec(
        core=list(KG_DICT_CORE), full=list(KG_DICT_FULL),
        stopwords=list(KG_STOPWORDS),
    )


def _dict_values_sql() -> str:
    """Render KG_DICT_CORE as a SQL VALUES relation d(entity_type, surface)."""
    rows = ", ".join(f"('{t}', '{s}')" for t, s in KG_DICT_CORE)
    return f"(VALUES {rows}) AS d(entity_type, surface)"


# ---------------------------------------------------------------------------
# transcripts derivation (documents -> input_hint shape)
# ---------------------------------------------------------------------------

TRANSCRIPTS_CTE = f"""
transcripts AS (
    SELECT
        concat('conv-', lpad(cast(cast(floor(doc_id / {TURNS_PER_CONV}) AS bigint) AS varchar), 6, '0')) AS conv_id,
        cast(doc_id % {TURNS_PER_CONV} AS integer) AS turn_idx,
        CASE cast(doc_id % 3 AS integer) WHEN 0 THEN 'user'
             WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
        text,
        CASE WHEN cast(doc_id % 3 AS integer) = 2 THEN source END AS tool
    FROM documents
)
"""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_parallel(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan with a minimum-parallelism guard.

    The test-scale parquet files are single row groups, so Spark's file
    splitter gives the whole scan ONE task and every per-row-heavy map
    stage (shingling, hashing, tokenization, DP tagging) runs on one core.
    At production scale a table has thousands of row groups and this guard
    is a structural no-op (scan splits >= cluster parallelism → no
    repartition, no shuffle); when it does trigger, the shuffle it inserts
    moves only the tiny input itself."""
    df = load(spark, sf_dir, table)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def transcripts_df(spark: SparkSession, sf_dir: str,
                   docs: DataFrame | None = None) -> DataFrame:
    """Derive the input_hint transcripts shape from the documents table
    (or a pre-filtered ``docs`` relation — e.g. run_job's --dedup stage)."""
    d = docs if docs is not None else load_parallel(spark, sf_dir,
                                                    "documents")
    conv = F.concat(
        F.lit("conv-"),
        F.lpad(F.floor(F.col("doc_id") / TURNS_PER_CONV).cast("long").cast("string"), 6, "0"),
    )
    mod3 = (F.col("doc_id") % 3).cast("int")
    return d.select(
        conv.alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        F.when(mod3 == 0, "user").when(mod3 == 1, "assistant")
        .otherwise("tool").alias("role"),
        F.col("text"),
        F.when(mod3 == 2, F.col("source")).alias("tool"),
    )


def q_kg_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_df(spark, sf_dir)


SQL_KG_TRANSCRIPTS = f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts"


def q_kg_dict_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(KG_DICT_CORE, "entity_type string, surface string")


SQL_KG_DICT_CORE = f"SELECT entity_type, surface FROM {_dict_values_sql()}"


# ---------------------------------------------------------------------------
# exact-match mention detection (relational; the M11 phrase-matcher analogue)
# ---------------------------------------------------------------------------

# tokens CTE: 0-based positions via zipped unnest (DuckDB-portable)
_TOKENS_CTE = """
toks AS (
    SELECT conv_id, turn_idx,
           unnest(string_split(text, ' ')) AS token,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM transcripts
)
"""

_EXACT_MENTIONS_CTE = f"""
{_TOKENS_CTE},
bigrams AS (
    SELECT conv_id, turn_idx, pos,
           token,
           lead(token) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS next_token
    FROM toks
),
mentions AS (
    SELECT b.conv_id, b.turn_idx,
           cast(b.pos AS integer) AS begin_tok,
           cast(b.pos + 1 AS integer) AS end_tok,
           b.token AS surface, d.entity_type
    FROM bigrams b JOIN {_dict_values_sql()}
      ON d.surface = b.token
    UNION ALL
    SELECT b.conv_id, b.turn_idx,
           cast(b.pos AS integer) AS begin_tok,
           cast(b.pos + 2 AS integer) AS end_tok,
           concat(b.token, ' ', b.next_token) AS surface, d.entity_type
    FROM bigrams b JOIN {_dict_values_sql()}
      ON b.next_token IS NOT NULL
     AND d.surface = concat(b.token, ' ', b.next_token)
)
"""


def exact_mentions_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All exact unigram/bigram dictionary occurrences (overlaps allowed).

    Pure relational and SHUFFLE-FREE before the dictionary join: the
    (unigram, bigram) candidates at each position are built in-row from the
    token array (element_at on i and i+1 — a turn's tokens are already
    co-located in its row, so a window/lead shuffle would be pure waste),
    exploded, and broadcast-joined with the dictionary. No UDF; whole-stage
    codegen end to end; zero shuffles regardless of n-gram width count.
    """
    t = transcripts_df(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    cands_arr = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(toks, i + 1).alias("t1"),
            F.element_at(toks, F.when(i + 2 <= n, i + 2)).alias("t2"),
        ),
    )
    ex = t.select(
        "conv_id", "turn_idx", F.explode(cands_arr).alias("c")
    )
    uni_c = F.struct(F.col("c.t1").alias("surface"), F.lit(1).alias("w"))
    bi_c = F.struct(
        F.concat_ws(" ", F.col("c.t1"), F.col("c.t2")).alias("surface"),
        F.lit(2).alias("w"),
    )
    cands = ex.select(
        "conv_id", "turn_idx", F.col("c.pos").alias("pos"),
        F.explode(
            F.when(F.col("c.t2").isNotNull(), F.array(uni_c, bi_c))
            .otherwise(F.array(uni_c))
        ).alias("s"),
    ).select(
        "conv_id", "turn_idx", "pos",
        F.col("s.surface").alias("surface"), F.col("s.w").alias("w"),
    )
    dict_df = F.broadcast(exact_dict_df(spark))
    return cands.join(dict_df, "surface").select(
        "conv_id", "turn_idx",
        F.col("pos").cast("int").alias("begin_tok"),
        (F.col("pos") + F.col("w")).cast("int").alias("end_tok"),
        "surface", "entity_type",
    )


def exact_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(t, s) for t, s in KG_DICT_CORE], "entity_type string, surface string"
    )


def q_kg_mentions_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_mentions_df(spark, sf_dir)


SQL_KG_MENTIONS_EXACT = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}
SELECT conv_id, turn_idx, begin_tok, end_tok, surface, entity_type
FROM mentions
"""


def q_kg_entity_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mention counts per (surface, single entity type) — type SET exploded."""
    m = exact_mentions_df(spark, sf_dir)
    return (
        m.withColumn("entity_type", F.explode(F.split("entity_type", ",")))
        .groupBy("surface", "entity_type")
        .agg(F.count("*").alias("n_mentions"))
    )


SQL_KG_ENTITY_LINK = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}
SELECT surface, unnest(string_split(entity_type, ',')) AS entity_type,
       count(*) AS n_mentions
FROM mentions
GROUP BY surface, entity_type
"""


# ---------------------------------------------------------------------------
# canonicalization: CC over the shared-token graph of mentioned surfaces
# ---------------------------------------------------------------------------

_CC_CTES = f"""
nodes AS (SELECT DISTINCT surface FROM mentions),
surface_tokens AS (
    SELECT surface, unnest(string_split(surface, ' ')) AS tok FROM nodes
),
edges AS (
    SELECT a.surface AS src, b.surface AS dst
    FROM surface_tokens a JOIN surface_tokens b USING (tok)
),
reach AS (
    SELECT surface AS node, surface AS comp FROM nodes
    UNION
    SELECT e.dst AS node, r.comp
    FROM reach r JOIN edges e ON e.src = r.node
),
components AS (
    SELECT node AS surface, min(comp) AS component FROM reach GROUP BY node
)
"""


def surface_components_df(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """(surface, component): connected components over surfaces that share a
    token (e.g. 'big table' ~ 'small table' ~ 'table scan'). The mention
    stream supplies the node set; component id = min surface."""
    nodes = mentions.select("surface").distinct()
    st = nodes.select(
        "surface", F.explode(F.split("surface", " ")).alias("tok")
    )
    a, b = st.alias("a"), st.alias("b")
    edges = a.join(b, "tok").select(
        F.col("a.surface").alias("src"), F.col("b.surface").alias("dst")
    )
    comp = connected_components(edges)
    return comp.select(
        F.col("node").alias("surface"), F.col("comp").alias("component")
    )


def q_kg_canonicalize_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return surface_components_df(spark, exact_mentions_df(spark, sf_dir))


SQL_KG_CANONICALIZE_CC = f"""
WITH RECURSIVE {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}, {_CC_CTES}
SELECT surface, component FROM components
"""


def q_kg_triples_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj, conv_id, turn_idx) from the exact-match path:
    subj = 'ent:' || component; has_type per type; mentioned_in per mention.

    The mentions lineage has two consumers (the CC node set and the linked
    join), so it is persisted — one scan+window pass instead of two; the CC
    edge-count action populates the cache."""
    m = persist_tracked(exact_mentions_df(spark, sf_dir))
    comp = F.broadcast(surface_components_df(spark, m))
    linked = m.join(comp, "surface").withColumn(
        "subj", F.concat(F.lit("ent:"), F.col("component"))
    )
    # both triple kinds from ONE pass over the cached mentions (shared
    # single-pass emitter) instead of a two-select union that read the
    # cache twice (r07); row multiset identical
    from .triples import explode_triple_pairs

    return explode_triple_pairs(linked)


SQL_KG_TRIPLES_EXACT = f"""
WITH RECURSIVE {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}, {_CC_CTES},
linked AS (
    SELECT m.*, concat('ent:', c.component) AS subj
    FROM mentions m JOIN components c USING (surface)
)
SELECT subj, 'has_type' AS pred,
       unnest(string_split(entity_type, ',')) AS obj, conv_id, turn_idx
FROM linked
UNION ALL
SELECT subj, 'mentioned_in' AS pred,
       concat(conv_id, '#', cast(turn_idx AS varchar)) AS obj,
       conv_id, turn_idx
FROM linked
"""


def q_kg_vocab_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1's vocabulary filter as a broadcast LEFT SEMI join: corpus tokens
    retained iff they appear in any dictionary surface (encode_folder.py:
    11-30 kept embedding rows whose word occurs in the corpus — same shape,
    roles swapped). Output: (token, n_occurrences) for retained tokens."""
    t = transcripts_df(spark, sf_dir)
    toks = t.select(F.explode(F.split("text", " ")).alias("token"))
    dict_tokens = (
        exact_dict_df(spark)
        .select(F.explode(F.split("surface", " ")).alias("token"))
        .distinct()
    )
    return (
        toks.join(F.broadcast(dict_tokens), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )


SQL_KG_VOCAB_SEMIJOIN = f"""
WITH {TRANSCRIPTS_CTE},
toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM transcripts),
dict_tokens AS (
    SELECT DISTINCT unnest(string_split(surface, ' ')) AS token
    FROM {_dict_values_sql()}
)
SELECT token, count(*) AS n_occurrences
FROM toks WHERE token IN (SELECT token FROM dict_tokens)
GROUP BY token
"""


def q_kg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-occurrence edges: pairs of surfaces mentioned in the same
    turn, with counts — the graph-enrichment triples source. NO self-join:
    each turn's distinct surface set is collected in-row (bounded by the
    turn length, never corpus-sized — the safe collect_list case) and its
    pairs exploded, so the mention lineage runs once through a single
    (conv_id, turn_idx) shuffle. Hot surface PAIRS only meet at the final
    count aggregation, which is algebraic (map-side combined) — the
    skew-safe formulation."""
    # r07 note: an in-row form (candidate n-grams intersected with the
    # literal dictionary array, no mention shuffle) was tried and MEASURED
    # SLOWER (2.45s vs 1.20s at sf0.1) — the higher-order transform over
    # every token position evaluates interpreted, while this join+groupBy
    # is whole-stage codegen with a mention-sized (not corpus-sized)
    # shuffle — kept.
    m = exact_mentions_df(spark, sf_dir).select(
        "conv_id", "turn_idx", "surface"
    )
    per_turn = m.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.array_distinct(F.collect_list("surface"))).alias("ss")
    )
    return (
        per_turn.select(F.explode("ss").alias("surface_a"), F.col("ss"))
        .select("surface_a", F.explode("ss").alias("surface_b"))
        .filter(F.col("surface_a") < F.col("surface_b"))
        .groupBy("surface_a", "surface_b")
        .agg(F.count("*").alias("n_turns"))
    )


SQL_KG_COOCCURRENCE = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions)
SELECT a.surface AS surface_a, b.surface AS surface_b, count(*) AS n_turns
FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
WHERE a.surface < b.surface
GROUP BY a.surface, b.surface
"""


def q_kg_conversation_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation entity set via the hot-key-safe salted two-phase
    collect (autoner_spark.skew). Output array is rendered as a sorted
    joined string so the value-hash comparison is order-free."""
    from .skew import conversation_entities

    m = exact_mentions_df(spark, sf_dir)
    ce = conversation_entities(m)
    return ce.select(
        "conv_id",
        F.array_join(F.array_sort("entities"), "|").alias("entities"),
        F.size("entities").alias("n_entities"),
    )


SQL_KG_CONVERSATION_ENTITIES = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}
SELECT conv_id,
       string_agg(DISTINCT surface, '|' ORDER BY surface) AS entities,
       cast(count(DISTINCT surface) AS integer) AS n_entities
FROM mentions
GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# evaluation join (A1/A2): typed exact-span P/R on a deterministic split
# ---------------------------------------------------------------------------


def q_kg_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pred = all exact mentions; gold = deterministic subset (begin_tok%3!=0)
    -> per-type counts + smoothed P/R/F1 (model_partial_ner/utils.py:119-180
    semantics), rounded for cross-engine comparison."""
    from .evaluate import per_type_prf

    # pred feeds guess/gold/overlap counting (4 consumers) — persist
    pred = persist_tracked(exact_mentions_df(spark, sf_dir))
    gold = pred.filter(F.col("begin_tok") % 3 != 0)
    out = per_type_prf(pred, gold)
    return out.select(
        "entity_type", "gold_cnt", "guess_cnt", "overlap_cnt",
        F.round("precision", 6).alias("precision"),  # money: coprime
        F.round("recall", 6).alias("recall"),  # money: coprime
        F.round("f1", 6).alias("f1"),  # money: coprime
    )


SQL_KG_EVAL_PR = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
pred AS (SELECT DISTINCT conv_id, turn_idx, begin_tok, end_tok, entity_type FROM mentions),
gold AS (SELECT * FROM pred WHERE begin_tok % 3 <> 0),
guess_c AS (SELECT entity_type, count(*) AS guess_cnt FROM pred GROUP BY entity_type),
gold_c AS (SELECT entity_type, count(*) AS gold_cnt FROM gold GROUP BY entity_type),
over_c AS (
    SELECT p.entity_type, count(*) AS overlap_cnt
    FROM pred p JOIN gold g USING (conv_id, turn_idx, begin_tok, end_tok, entity_type)
    GROUP BY p.entity_type
),
j AS (
    SELECT coalesce(gc.entity_type, uc.entity_type, oc.entity_type) AS entity_type,
           coalesce(gold_cnt, 0) AS gold_cnt,
           coalesce(guess_cnt, 0) AS guess_cnt,
           coalesce(overlap_cnt, 0) AS overlap_cnt
    FROM gold_c gc
    FULL JOIN guess_c uc ON gc.entity_type = uc.entity_type
    FULL JOIN over_c oc ON coalesce(gc.entity_type, uc.entity_type) = oc.entity_type
)
SELECT entity_type, gold_cnt, guess_cnt, overlap_cnt,
       round(overlap_cnt / (guess_cnt + 0.000001), 6) AS precision,
       round(overlap_cnt / (gold_cnt + 0.000001), 6) AS recall,
       round(2 * (overlap_cnt / (guess_cnt + 0.000001)) * (overlap_cnt / (gold_cnt + 0.000001))
             / ((overlap_cnt / (guess_cnt + 0.000001)) + (overlap_cnt / (gold_cnt + 0.000001)) + 0.000001), 6) AS f1
FROM j
"""


# chunking / typing eval breakdowns (model_partial_ner/utils.py:28-117):
# spans are derived from the Tie-or-Break LABELS table (to_span semantics),
# so the Spark side exercises the full DP labeling chain while the DuckDB
# twin derives the same spans from the golden labels parquet with identical
# relational SQL.

_SPANS_FROM_GOLDEN_LABELS_CTE = f"""
l AS (SELECT * FROM read_parquet('{{golden_dir}}/kg_labels_dp.parquet')),
lens AS (
    SELECT conv_id, turn_idx, max(tok_idx) + 1 AS n_toks
    FROM l GROUP BY conv_id, turn_idx
),
breaks AS (
    SELECT conv_id, turn_idx, tok_idx, entity_type FROM l WHERE boundary = 1
),
sp AS (
    SELECT b.conv_id, b.turn_idx, b.tok_idx AS begin_tok,
           cast(coalesce(
               lead(b.tok_idx) OVER (PARTITION BY b.conv_id, b.turn_idx
                                     ORDER BY b.tok_idx),
               lens.n_toks) AS integer) AS end_tok,
           b.entity_type
    FROM breaks b JOIN lens USING (conv_id, turn_idx)
),
spans AS (SELECT * FROM sp WHERE entity_type <> 'None')
"""


def _label_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .evaluate import spans_from_labels

    return spans_from_labels(q_kg_labels_dp(spark, sf_dir))


def q_kg_eval_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking-level eval (utils.py:28-72): UNTYPED span P/R/F1. pred =
    spans from the DP labels; gold = the deterministic subset
    (begin_tok % 3 != 0), mirroring kg_eval_pr's split."""
    from .evaluate import single_row_prf

    spans = persist_tracked(_label_spans(spark, sf_dir))
    pred = spans.select("conv_id", "turn_idx", "begin_tok", "end_tok")
    gold = pred.filter(F.col("begin_tok") % 3 != 0)
    return single_row_prf(pred, gold,
                          ["conv_id", "turn_idx", "begin_tok", "end_tok"])


SQL_KG_EVAL_CHUNKING_TMPL = f"""
WITH {_SPANS_FROM_GOLDEN_LABELS_CTE},
pred AS (SELECT DISTINCT conv_id, turn_idx, begin_tok, end_tok FROM spans),
gold AS (SELECT * FROM pred WHERE begin_tok % 3 <> 0),
c AS (
    SELECT (SELECT count(*) FROM gold) AS gold_cnt,
           (SELECT count(*) FROM pred) AS guess_cnt,
           (SELECT count(*) FROM pred JOIN gold
              USING (conv_id, turn_idx, begin_tok, end_tok)) AS overlap_cnt
)
SELECT gold_cnt, guess_cnt, overlap_cnt,
       round(overlap_cnt / (guess_cnt + 0.000001), 6) AS precision,
       round(overlap_cnt / (gold_cnt + 0.000001), 6) AS recall,
       round(2 * (overlap_cnt / (guess_cnt + 0.000001))
               * (overlap_cnt / (gold_cnt + 0.000001))
             / ((overlap_cnt / (guess_cnt + 0.000001))
                + (overlap_cnt / (gold_cnt + 0.000001)) + 0.000001), 6) AS f1
FROM c
"""


def q_kg_eval_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typing-level eval (utils.py:74-117): typed spans over the SAME
    (gold) chunking, with a deterministic typing disagreement planted on a
    third of the spans (begin_tok % 3 == 0 -> 'Metric') on the gold side."""
    from .evaluate import single_row_prf

    spans = persist_tracked(_label_spans(spark, sf_dir))
    keys = ["conv_id", "turn_idx", "begin_tok", "end_tok", "entity_type"]
    gold = spans.withColumn(
        "entity_type",
        F.when(F.col("begin_tok") % 3 == 0, F.lit("Metric"))
        .otherwise(F.col("entity_type")),
    )
    return single_row_prf(spans, gold, keys)


SQL_KG_EVAL_TYPING_TMPL = f"""
WITH {_SPANS_FROM_GOLDEN_LABELS_CTE},
pred AS (SELECT DISTINCT conv_id, turn_idx, begin_tok, end_tok, entity_type
         FROM spans),
gold AS (
    SELECT DISTINCT conv_id, turn_idx, begin_tok, end_tok,
           CASE WHEN begin_tok % 3 = 0 THEN 'Metric' ELSE entity_type END
               AS entity_type
    FROM spans
),
c AS (
    SELECT (SELECT count(*) FROM gold) AS gold_cnt,
           (SELECT count(*) FROM pred) AS guess_cnt,
           (SELECT count(*) FROM pred JOIN gold
              USING (conv_id, turn_idx, begin_tok, end_tok, entity_type))
               AS overlap_cnt
)
SELECT gold_cnt, guess_cnt, overlap_cnt,
       round(overlap_cnt / (guess_cnt + 0.000001), 6) AS precision,
       round(overlap_cnt / (gold_cnt + 0.000001), 6) AS recall,
       round(2 * (overlap_cnt / (guess_cnt + 0.000001))
               * (overlap_cnt / (gold_cnt + 0.000001))
             / ((overlap_cnt / (guess_cnt + 0.000001))
                + (overlap_cnt / (gold_cnt + 0.000001)) + 0.000001), 6) AS f1
FROM c
"""


# ---------------------------------------------------------------------------
# invariant check: per-turn text equality (input_hint)
# ---------------------------------------------------------------------------


def q_kg_turn_text_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    return t.select(
        F.count("*").alias("total_turns"),
        F.sum(
            F.when(
                F.array_join(F.split("text", " "), " ") != F.col("text"), 1
            ).otherwise(0)
        ).alias("mismatches"),
    )


SQL_KG_TURN_TEXT_EQUALITY = f"""
WITH {TRANSCRIPTS_CTE}
SELECT count(*) AS total_turns,
       cast(sum(CASE WHEN array_to_string(string_split(text, ' '), ' ') <> text
                THEN 1 ELSE 0 END) AS bigint) AS mismatches
FROM transcripts
"""


# ---------------------------------------------------------------------------
# DP tagger + full KG over the derived transcripts (non-SQL-expressible:
# covered by the pytest oracle chain; driver records rows-only)
# ---------------------------------------------------------------------------


def q_kg_tag_mentions_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    trie = build_trie(kg_dict_spec())
    return tag_transcripts(transcripts_df(spark, sf_dir), trie)


def q_kg_tag_mentions_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text ingestion (M12): transcripts are re-rendered as UNtokenized
    punctuated prose (comma-joined words + trailing period) and tagged with
    the char-class tokenizer (utils.h:195-247 semantics). Separator tokens
    are dropped from the stream, so the result must equal the pre-tokenized
    DP path exactly — the twin reads the SAME golden table."""
    trie = build_trie(kg_dict_spec())
    raw = transcripts_df(spark, sf_dir).withColumn(
        "text", F.concat(F.regexp_replace(F.col("text"), " ", ", "), F.lit("."))
    )
    return tag_transcripts(raw, trie, tokenizer="charclass")


SQL_KG_TAG_MENTIONS_RAW = f"""
SELECT conv_id, turn_idx, begin_tok, end_tok, surface, entity_type
FROM read_parquet('{GOLDEN_DIR}/kg_tag_mentions_dp.parquet')
"""


def q_kg_triples_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .triples import build_kg

    t = transcripts_df(spark, sf_dir)
    return build_kg(spark, t, kg_dict_spec())["triples"]


def q_kg_linked_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    trie = build_trie(kg_dict_spec())
    mentions = tag_transcripts(transcripts_df(spark, sf_dir), trie)
    dict_df = dict_surfaces_df(spark, kg_dict_spec())
    return link_mentions(mentions, dict_df)


def q_kg_mentions_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 literal front-end over AutoPhrase-style marked transcripts:
    markup is injected for two dictionary surfaces, then the exact-lookup
    phrase tagger runs (rows-only check; semantics pinned by test_markup)."""
    from .markup import tag_marked_transcripts

    t = transcripts_df(spark, sf_dir)
    marked = t.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"), "hash join", "<phrase>hash join</phrase>"
            ),
            "table scan", "<phrase>table scan</phrase>",
        ),
    )
    return tag_marked_transcripts(marked, build_trie(kg_dict_spec()), spark)


def q_kg_labels_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-or-Break labels table (D6) over the derived transcripts,
    exploded to long form (rows-only; .ck serialization is pinned
    byte-for-byte to the compiled reference binary in pytest)."""
    from .labels import label_transcripts

    labels = label_transcripts(
        transcripts_df(spark, sf_dir), build_trie(kg_dict_spec()), spark
    )
    return labels.select(
        "conv_id", "turn_idx",
        F.posexplode(F.arrays_zip("tokens", "boundary", "types", "safe"))
        .alias("tok_idx", "z"),
    ).select(
        "conv_id", "turn_idx", "tok_idx",
        F.col("z.tokens").alias("token"),
        F.col("z.boundary").alias("boundary"),
        F.col("z.types").alias("entity_type"),
        F.col("z.safe").alias("safe"),
    )


# DuckDB twins for the DP chain: the DP itself is not SQL-expressible, so
# the oracle side reads a GOLDEN parquet table materialized by the
# single-node Python oracle (autoner_spark/golden.py) — the same oracle
# code that is pinned byte-for-byte against the compiled C++ reference
# binary in pytest. The driver gate therefore compares two independent
# implementations: the distributed mapInArrow tagger vs the Python oracle
# replay.

SQL_KG_TAG_MENTIONS_DP = f"""
SELECT conv_id, turn_idx, begin_tok, end_tok, surface, entity_type
FROM read_parquet('{GOLDEN_DIR}/kg_tag_mentions_dp.parquet')
"""

SQL_KG_TRIPLES_DP = f"""
SELECT subj, pred, obj, conv_id, turn_idx
FROM read_parquet('{GOLDEN_DIR}/kg_triples_dp.parquet')
"""

SQL_KG_MENTIONS_MARKUP = f"""
SELECT conv_id, turn_idx, begin_tok, end_tok, surface, entity_type
FROM read_parquet('{GOLDEN_DIR}/kg_mentions_markup.parquet')
"""

SQL_KG_LABELS_DP = f"""
SELECT conv_id, turn_idx, tok_idx, token, boundary, entity_type, safe
FROM read_parquet('{GOLDEN_DIR}/kg_labels_dp.parquet')
"""


# ---------------------------------------------------------------------------
# relational coverage (SURVEY.md §2.6): joins, window, agg, sort/limit
# ---------------------------------------------------------------------------


def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Half-boundary discipline (r05 money sweep):
    sum_disc_price's true value is a 4dp-exact rational (2dp price x 2dp
    discount), so it is rounded at 4dp — an identity round with no
    half-representable boundary — instead of 2dp, where a x.xx50 sum sits
    exactly on the Spark-HALF_UP/DuckDB-binary divergence point. avg_qty
    (a non-terminating s/c) is computed as integer HALF_UP at e4 scale
    ((2*s*10^4 + c) div (2c), quantities are integral) then divided by
    10^4 — exact on both engines at any scale."""
    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),  # money: grid
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),  # money: grid
            F.round(  # money: grid
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.sum(F.col("l_quantity").cast("long")).alias("_sq"),
            F.count("*").alias("count_order"),
        )
    )
    return (
        agg.select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price",
            (half_up_scaled("_sq", "count_order", 10_000)
             / F.lit(10000.0)).alias("avg_qty"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_REL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ((2 * sum(cast(floor(l_quantity) AS bigint)) * 10000 + count(*))
        // (2 * count(*))) / 10000.0 AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_rel_top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey",
                F.round("c_acctbal", 2).alias("acctbal"))  # money: grid
    )


SQL_REL_TOP_CUSTOMERS_WINDOW = """
SELECT c_mktsegment, cast(rnk AS integer) AS rnk, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rnk
    FROM customer
) WHERE rnk <= 3
"""


def q_rel_order_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join orders->customer->nation. Only the fixed-cardinality
    nation side (25 rows at every sf) carries a broadcast hint; customer
    grows linearly with sf, so its join is left to AQE, which promotes
    genuinely-small sides at runtime instead of pinning a multi-GB
    driver-side build at the 100x scale bar (the r04 static-broadcast
    discipline)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),  # money: grid
        )
    )


SQL_REL_ORDER_REVENUE_JOIN = """
SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_rel_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set coverage: ROLLUP over (priority, status)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))  # money: grid
    )


SQL_REL_ROLLUP_ORDERS = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_rel_setop_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage: customers WITH orders EXCEPT the BUILDING
    segment, INTERSECTed with positive-balance customers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positive = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return with_orders.exceptAll(building).intersect(positive)


SQL_REL_SETOP_CUSTOMERS = """
-- parenthesized: standard SQL binds INTERSECT tighter than EXCEPT
SELECT c_custkey FROM (
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
"""


def q_rel_events_json_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function coverage over the events stream table: JSON
    extraction (props -> k) + event-time truncation + hash aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            "value",
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),  # money: grid
            # integer HALF_UP at e4 scale (r05 money sweep): avg of ints
            # is a non-terminating s/c a fixed double round can sit on
            F.sum(F.col("k").cast("long")).alias("_sk"),
            F.count("k").alias("_ck"),
        )
        .select(
            "hour", "event_type", "n_events", "total_value",
            F.when(
                F.col("_ck") > 0,
                half_up_scaled("_sk", "_ck", 10_000)
                / F.lit(10000.0),
            ).alias("avg_k"),
        )
    )


SQL_REL_EVENTS_JSON_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       CASE WHEN count(cast(json_extract_string(props, '$.k') AS integer)) > 0
            THEN ((2 * sum(cast(json_extract_string(props, '$.k') AS bigint))
                   * 10000
                   + count(cast(json_extract_string(props, '$.k') AS integer)))
                  // (2 * count(cast(json_extract_string(props, '$.k')
                                     AS integer))))
                 / 10000.0
       END AS avg_k
FROM events
GROUP BY 1, 2
"""


def q_rel_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part + supplier dimension coverage: revenue by part type and
    supplier nation against the lineitem fact. part and supplier grow
    linearly with sf, so their joins carry NO broadcast hint — AQE
    promotes them when runtime stats say they fit; pinning them was the
    r04 static-broadcast scale bug class (VERDICT r05 #2). Only the
    25-row nation dimension is hinted."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("p_type", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            # 4dp round = identity on the 4dp-exact price x discount sum;
            # 2dp sat on the half-cent HALF_UP divergence (r05 money sweep)
            F.round(  # money: grid
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


SQL_REL_PART_TYPE_REVENUE = """
SELECT p_type, n_name, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_type, n_name
"""


def q_rel_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / correlated-semi-join coverage (TPC-H Q4 shape): orders with
    at least one returned lineitem, counted per priority. The semi join
    shuffles on the join key only and never widens the orders row."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


SQL_REL_ORDERS_EXISTS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_rel_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS / anti-join coverage: customers with no large order
    (o_totalprice > 300000), per market segment. The filter is pushed below
    the anti-join's build side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big_orders = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(big_orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_REL_CUSTOMERS_NO_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
"""


def q_rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery coverage (TPC-H Q17 shape): revenue from
    below-one-fifth-of-average-quantity orders of one brand's parts. The
    Spark side is explicitly DECORRELATED — per-part thresholds via one
    aggregation, then a joined filter (unhinted; AQE broadcasts the
    brand subset while it fits) — which is the plan shape the optimizer
    must reach at scale (a per-row subquery is quadratic).
    Threshold and output are INTEGER-EXACT (r05 money sweep): the per-part
    threshold 0.2*avg(qty) is HALF_UP-scaled to e6 with bigint math and the
    comparison runs on qty*10^6 < thr_e6 (quantities are integral), so no
    float summation order or round-boundary can flip the filter; the yearly
    average is HALF_UP integer cents ((2*sum_cents + 7) div 14) divided by
    100 — a 2dp-exact double on both engines."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    li2 = li.select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
    )
    thr = (
        li2.groupBy("l_partkey")
        .agg(F.sum("qty").alias("_s"), F.count("*").alias("_c"))
        .select(
            "l_partkey",
            F.expr("(2000000 * _s + 5 * _c) div (10 * _c)").alias("thr_e6"),
        )
    )
    # brand subset is part/|brands| — it still grows with sf, so the
    # join is unhinted (AQE promotes it to broadcast while it fits)
    brand = p.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    return (
        li2.join(brand, li2["l_partkey"] == brand["p_partkey"])
        .join(thr, "l_partkey")
        .filter(F.col("qty") * F.lit(1_000_000).cast("long")
                < F.col("thr_e6"))
        .agg(F.sum("cents").alias("_sc"))
        .select((F.expr("(2 * _sc + 7) div 14") / F.lit(100.0))
                .alias("avg_yearly"))
    )


SQL_REL_SMALL_QTY_REVENUE = """
WITH thr AS (
    SELECT l_partkey,
           (2000000 * sum(cast(floor(l_quantity) AS bigint)) + 5 * count(*))
           // (10 * count(*)) AS thr_e6
    FROM lineitem GROUP BY l_partkey
)
SELECT ((2 * sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) + 7)
        // 14) / 100.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN thr USING (l_partkey)
WHERE p_brand = 'Brand#4'
  AND cast(floor(l_quantity) AS bigint) * 1000000 < thr_e6
"""


def q_rel_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT coverage: order counts and revenue per priority, one column
    set per order status. Explicit pivot values (the status domain) keep
    the schema static — at scale an un-enumerated pivot forces an extra
    distinct-values job before planning."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))  # money: grid
        .select(
            "o_orderpriority",
            F.col("F").alias("rev_f"),
            F.col("O").alias("rev_o"),
            F.col("P").alias("rev_p"),
        )
    )


SQL_REL_PIVOT_STATUS = """
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
FROM orders
GROUP BY o_orderpriority
"""


def q_rel_acctbal_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate coverage: exact interpolated percentiles of
    account balance per market segment (Spark `percentile` == DuckDB
    `quantile_cont`, verified to agree to full precision; rounded 4dp for
    the gate). At scale exact percentiles sort within groups —
    `approx_percentile` (t-digest) is the sketch alternative, but its
    estimates are engine-specific and not gateable."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),  # money: grid
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),  # money: grid
        F.round(F.min("c_acctbal"), 4).alias("lo"),  # money: grid
        F.round(F.max("c_acctbal"), 4).alias("hi"),  # money: grid
    )


SQL_REL_ACCTBAL_QUANTILES = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
       round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
       round(min(c_acctbal), 4) AS lo,
       round(max(c_acctbal), 4) AS hi
FROM customer
GROUP BY c_mktsegment
"""


def q_rel_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch form of streaming session
    windows): per user, a >30-min silence starts a new session; sessions
    are numbered with a running sum over one window pass and aggregated.
    Time math in integer epoch-microseconds so both engines agree exactly."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet gives TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
    # cast to TIMESTAMP is value-preserving
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = tus - F.lag(tus).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.select(
        "user_id", "event_id", "value", tus.alias("tus"),
        F.sum(new_sess).over(run).cast("int").alias("session_idx"),
    )
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),  # money: grid
            F.floor((F.max("tus") - F.min("tus")) / 1_000_000)
            .cast("long").alias("duration_sec"),
        )
    )


SQL_REL_EVENT_SESSIONS = """
WITH o AS (
    SELECT user_id, event_id, value, epoch_us(ts) AS tus,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
    FROM events
),
f AS (
    SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
    FROM o
),
s AS (
    SELECT *, cast(sum(new_sess) OVER (PARTITION BY user_id
                  ORDER BY tus, event_id
                  ROWS UNBOUNDED PRECEDING) AS integer) AS session_idx
    FROM f
)
SELECT user_id, session_idx, count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       cast(floor((max(tus) - min(tus)) / 1000000) AS bigint) AS duration_sec
FROM s GROUP BY user_id, session_idx
"""


def q_rel_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view -> click -> purchase, strictly ordered per
    user): each stage is the user's FIRST qualifying event at-or-after the
    previous stage — the product-analytics staple. Three per-user
    aggregates chained by equi-joins back into the filtered events scan:
    the events table streams once per stage and never self-joins. Stage
    relations are user-count-sized — deliberately NOT broadcast-hinted,
    because user count is unbounded (a 10^9-user corpus would OOM a
    forced broadcast); AQE picks broadcast whenever the stage relation is
    actually small, and the fallback is a plain shuffled equi-join on the
    same user_id key every stage reuses."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("tus").alias("vt"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("tus") >= F.col("vt"))
        .groupBy("user_id").agg(F.min("tus").alias("ct"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("tus") >= F.col("ct"))
        .groupBy("user_id").agg(F.min("tus").alias("pt"))
    )
    out = (
        v.join(c, "user_id", "left").join(p, "user_id", "left")
    )
    return out.select(
        "user_id",
        F.when(F.col("pt").isNotNull(), 3)
        .when(F.col("ct").isNotNull(), 2).otherwise(1).alias("stage"),
        F.floor(F.col("vt") / 1_000_000).cast("long").alias("view_sec"),
        F.floor((F.col("ct") - F.col("vt")) / 1_000_000).cast("long")
        .alias("click_gap_sec"),
        F.floor((F.col("pt") - F.col("ct")) / 1_000_000).cast("long")
        .alias("purchase_gap_sec"),
    )


SQL_REL_EVENT_FUNNEL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
v AS (
    SELECT user_id, min(tus) AS vt FROM e
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(tus) AS ct
    FROM e JOIN v USING (user_id)
    WHERE event_type = 'click' AND tus >= vt
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(tus) AS pt
    FROM e JOIN c USING (user_id)
    WHERE event_type = 'purchase' AND tus >= ct
    GROUP BY e.user_id
)
SELECT v.user_id,
       CASE WHEN pt IS NOT NULL THEN 3
            WHEN ct IS NOT NULL THEN 2 ELSE 1 END AS stage,
       cast(floor(vt / 1000000) AS bigint) AS view_sec,
       cast(floor((ct - vt) / 1000000) AS bigint) AS click_gap_sec,
       cast(floor((pt - ct) / 1000000) AS bigint) AS purchase_gap_sec
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def q_rel_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filter primitive, fully relational and
    engine-portable: a k=4-hash, m=8192-bit filter over the high-balance
    customers' keys, probed by the distinct order custkeys. This is the
    broadcast-bloom pattern that prunes a fact-table shuffle before an
    expensive join at 100 TB: the filter state is the distinct occupied-
    position set (bounded by m — tiny, broadcastable), a probe key passes
    iff all k positions are occupied, and the one-row output exposes the
    measured false-positive count next to the true semi-join count, so
    the filter's selectivity is auditable. The three small relations
    (keys, occupied positions, distinct probes) are persisted — each has
    multiple consumers across the audit aggregates."""
    m, k = 8192, 4
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")

    def positions(key_col):
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bloom{i}:"),
                                       key_col.cast("string"))), 1, 8),
                    16, 10,
                ).cast("long") % m
            )
            for i in range(k)
        ]

    # keys feeds occupied + the truth semi-join; occupied feeds the probe
    # join + its own count; probes feeds three consumers — persist all
    # three (each is bounded: distinct keys, <= m positions, distinct
    # probe keys) so the audit aggregates don't rescan the base tables
    keys = persist_tracked(
        cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    )
    occupied = persist_tracked(
        keys.select(F.explode(F.array(*positions(F.col("c_custkey"))))
                    .alias("pos"))
        .distinct()
    )
    probes = persist_tracked(
        orders.select(F.col("o_custkey").alias("key")).distinct()
    )
    hits = (
        probes.select("key", F.explode(F.array(*positions(F.col("key"))))
                      .alias("pos"))
        .join(F.broadcast(occupied), "pos")
        .groupBy("key")
        .agg(F.count("*").alias("hit"))
        .filter(F.col("hit") == k)
    )
    true_match = probes.join(
        keys.select(F.col("c_custkey").alias("key")).distinct(), "key",
        "left_semi",
    )
    return (
        occupied.agg(F.count("*").cast("long").alias("n_occupied"))
        .crossJoin(probes.agg(F.count("*").cast("long").alias("n_probes")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_pass")))
        .crossJoin(true_match.agg(F.count("*").cast("long").alias("n_true")))
        .select(
            "n_occupied", "n_probes", "n_pass", "n_true",
            (F.col("n_pass") - F.col("n_true")).cast("long")
            .alias("n_false_positives"),
        )
    )


SQL_REL_BLOOM_SEMIJOIN = """
WITH keys AS (
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
),
occupied AS (
    SELECT DISTINCT
           cast(('0x' || substring(md5(concat('bloom', i, ':',
                cast(c_custkey AS varchar))), 1, 8)) AS bigint) % 8192 AS pos
    FROM keys, unnest(range(0, 4)) AS u(i)
),
probes AS (SELECT DISTINCT o_custkey AS key FROM orders),
ppos AS (
    SELECT key,
           cast(('0x' || substring(md5(concat('bloom', i, ':',
                cast(key AS varchar))), 1, 8)) AS bigint) % 8192 AS pos
    FROM probes, unnest(range(0, 4)) AS u(i)
),
pass AS (
    SELECT key FROM ppos JOIN occupied USING (pos)
    GROUP BY key HAVING count(*) = 4
),
truth AS (
    SELECT DISTINCT p.key FROM probes p
    JOIN keys k ON k.c_custkey = p.key
)
SELECT (SELECT cast(count(*) AS bigint) FROM occupied) AS n_occupied,
       (SELECT cast(count(*) AS bigint) FROM probes) AS n_probes,
       (SELECT cast(count(*) AS bigint) FROM pass) AS n_pass,
       (SELECT cast(count(*) AS bigint) FROM truth) AS n_true,
       (SELECT cast(count(*) AS bigint) FROM pass)
         - (SELECT cast(count(*) AS bigint) FROM truth) AS n_false_positives
"""


def q_rel_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase gets the user's latest click at-or-before
    it (the point-in-time feature lookup). Spark side: union + one window
    pass (timejoin.asof_join); DuckDB twin: the engine's native ASOF JOIN —
    two independent implementations of the semantics."""
    from .timejoin import asof_join

    e = load(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", tus.alias("ctus"), F.col("event_id").alias("click_id")
    ).withColumn("tus", F.col("ctus"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), tus.alias("tus")
    )
    out = asof_join(purchases, clicks, ["user_id"], "tus",
                    ["ctus", "click_id"])
    return out.select(
        "purchase_id", "user_id",
        F.floor(F.col("tus") / 1_000_000).cast("long").alias("t_sec"),
        "click_id",
        F.floor((F.col("tus") - F.col("ctus")) / 1_000_000)
        .cast("long").alias("click_gap_sec"),
    )


SQL_REL_EVENTS_ASOF = """
-- native ASOF JOIN picks the max matching ctus (well-defined), but makes
-- no tiebreak guarantee among equal-ctus rows; click_id is therefore
-- re-resolved deterministically (max id at the matched ctus) to mirror
-- asof_join's greatest-value-tuple rule
WITH c AS (
    SELECT user_id, epoch_us(ts) AS ctus, event_id AS click_id
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS tus
    FROM events WHERE event_type = 'purchase'
),
matched AS (
    SELECT p.purchase_id, p.user_id, p.tus, c.ctus
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tus >= c.ctus
)
SELECT m.purchase_id, m.user_id,
       cast(floor(m.tus / 1000000) AS bigint) AS t_sec,
       max(c2.click_id) AS click_id,
       cast(floor((m.tus - m.ctus) / 1000000) AS bigint) AS click_gap_sec
FROM matched m
LEFT JOIN c c2 ON c2.user_id = m.user_id AND c2.ctus = m.ctus
GROUP BY m.purchase_id, m.user_id, m.tus, m.ctus
"""


def q_rel_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: clicks in the 60s window before each error, counted per
    error (burst attribution). Spark side: time-bucketed equi-join
    (timejoin.range_join — never a nested loop); DuckDB twin: the plain
    inequality join."""
    from .timejoin import range_join

    e = load(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), tus.alias("etus")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), tus.alias("ctus")
    )
    pairs = range_join(errors, clicks, ["user_id"], "etus", "ctus",
                       lo=-60_000_000, hi=0)
    counts = pairs.groupBy("error_id").agg(
        F.count("*").alias("n_clicks_60s")
    )
    return (
        errors.join(counts, "error_id", "left")
        .select(
            "error_id", "user_id",
            F.coalesce("n_clicks_60s", F.lit(0)).cast("long")
            .alias("n_clicks_60s"),
        )
    )


SQL_REL_EVENTS_RANGE_JOIN = """
WITH er AS (
    SELECT user_id, event_id AS error_id, epoch_us(ts) AS etus
    FROM events WHERE event_type = 'error'
),
c AS (
    SELECT user_id, event_id AS click_id, epoch_us(ts) AS ctus
    FROM events WHERE event_type = 'click'
)
SELECT er.error_id, er.user_id,
       cast(count(c.click_id) AS bigint) AS n_clicks_60s
FROM er LEFT JOIN c
  ON c.user_id = er.user_id
 AND c.ctus BETWEEN er.etus - 60000000 AND er.etus
GROUP BY er.error_id, er.user_id
"""


def q_rel_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup (continuous-aggregate
    shape): minute-level aggregates are computed ONCE from the raw events;
    hour re-aggregates the minute PARTIALS and day re-aggregates hours —
    the raw table is scanned exactly once regardless of how many
    granularities are materialized, because count/sum are algebraic. The
    DuckDB twin computes every level directly from raw, so the gate equality
    IS the proof that the partial re-aggregation composes correctly.

    Values are aggregated as SCALED INTEGERS (round-half-up to cents):
    float addition is non-associative, so summing raw doubles hierarchically
    (minute partials -> hour -> day) while the twin sums raw rows directly
    could diverge at a round() boundary — integer sums make the composition
    exact, not probabilistic. floor(x*100 + 0.5), not cast: DuckDB casts
    round while Spark casts truncate (the documented portability trap)."""
    e = load(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    minute = F.floor(tus / 60_000_000).cast("long")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    m = e.groupBy(minute.alias("b"), "event_type").agg(
        F.count("*").alias("n"), F.sum(cents).alias("v")
    )
    h = m.groupBy(F.floor(F.col("b") / 60).cast("long").alias("b"),
                  "event_type").agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )
    d = h.groupBy(F.floor(F.col("b") / 24).cast("long").alias("b"),
                  "event_type").agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )

    def lvl(df, name, secs):
        return df.select(
            F.lit(name).alias("level"),
            (F.col("b") * secs).cast("long").alias("bucket_start_sec"),
            "event_type", F.col("n").cast("long").alias("n_events"),
            F.round(F.col("v") / 100.0, 2).alias("total_value"),  # money: grid
        )

    return (
        lvl(m, "minute", 60)
        .unionByName(lvl(h, "hour", 3600))
        .unionByName(lvl(d, "day", 86400))
    )


SQL_REL_TIME_ROLLUP = """
WITH base AS (
    SELECT epoch_us(ts) AS tus, event_type,
           cast(floor(value * 100 + 0.5) AS bigint) AS cents
    FROM events
),
m AS (
    SELECT cast(floor(tus / 60000000) AS bigint) AS b, event_type,
           count(*) AS n, sum(cents) AS v
    FROM base GROUP BY 1, 2
),
h AS (
    SELECT cast(floor(tus / 3600000000) AS bigint) AS b, event_type,
           count(*) AS n, sum(cents) AS v
    FROM base GROUP BY 1, 2
),
d AS (
    SELECT cast(floor(tus / 86400000000) AS bigint) AS b, event_type,
           count(*) AS n, sum(cents) AS v
    FROM base GROUP BY 1, 2
)
SELECT 'minute' AS level, cast(b * 60 AS bigint) AS bucket_start_sec,
       event_type, cast(n AS bigint) AS n_events,
       round(v / 100.0, 2) AS total_value
FROM m
UNION ALL
SELECT 'hour', cast(b * 3600 AS bigint), event_type, cast(n AS bigint),
       round(v / 100.0, 2) FROM h
UNION ALL
SELECT 'day', cast(b * 86400 AS bigint), event_type, cast(n AS bigint),
       round(v / 100.0, 2) FROM d
"""


def q_rel_lpc_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count SKETCH, engine-portable: linear probabilistic
    counting (Whang et al. '90). Each user hashes into one of m=4096
    bitmap positions; estimate = -m * ln(empty_fraction). Unlike HLL
    (engine-specific registers, not gateable), the occupied-position count
    is plain relational math — and it is scale-safe: the aggregation state
    is bounded by m per group (map-side combinable), never by the number
    of distinct users. Exact count kept alongside to expose the error.

    NULL user_ids are filtered identically on BOTH engines before hashing:
    Spark concat(NULL) -> NULL md5 (silently ignored by countDistinct) while
    DuckDB concat('lpc:', NULL) keeps the prefix and would occupy a bitmap
    position — the documented cross-engine NULL-concat trap."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    m = 4096
    idx = (
        F.conv(F.substring(F.md5(F.concat(F.lit("lpc:"),
                                          F.col("user_id").cast("string"))),
                           1, 8), 16, 10).cast("long") % m
    )
    agg = e.groupBy("event_type").agg(
        F.countDistinct(idx).alias("occupied"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    # saturated bitmap (every position hit): the estimate is undefined
    # (ln 0) — emit NULL identically on both engines instead of letting
    # Spark return NULL while DuckDB raises; choose a larger m there
    return agg.select(
        "event_type",
        F.col("occupied").cast("long").alias("occupied"),
        F.when(
            F.col("occupied") < m,
            F.round(-m * F.log(1.0 - F.col("occupied") / float(m)), 2),  # money: irrational
        ).alias("lpc_estimate"),
        F.col("n_exact").cast("long").alias("n_exact"),
    )


SQL_REL_LPC_DISTINCT = """
WITH h AS (
    SELECT event_type, user_id,
           cast(('0x' || substring(md5(concat('lpc:',
                cast(user_id AS varchar))), 1, 8)) AS bigint) % 4096 AS idx
    FROM events
    WHERE user_id IS NOT NULL
),
agg AS (
    SELECT event_type, count(DISTINCT idx) AS occupied,
           count(DISTINCT user_id) AS n_exact
    FROM h GROUP BY event_type
)
SELECT event_type, cast(occupied AS bigint) AS occupied,
       CASE WHEN occupied < 4096
            THEN round(-4096 * ln(1.0 - occupied / 4096.0), 2)
       END AS lpc_estimate,
       cast(n_exact AS bigint) AS n_exact
FROM agg
"""


def q_dedup_apply_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the near-dup dedup: retain documents that are not the
    higher-id member of any >=0.5-Jaccard pair (standard MinHash-dedup
    retention rule: keep the smallest id per near-dup family edge). The
    victims set is tiny relative to the corpus -> broadcast anti-join; the
    corpus itself never shuffles."""
    from .dedup import ngram_jaccard_pairs

    docs = load_parallel(spark, sf_dir, "documents")
    victims = ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                  max_shingle_df=1000).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    return (
        docs.join(F.broadcast(victims), "doc_id", "left_anti")
        .select("doc_id")
    )


SQL_DEDUP_APPLY_NGRAM = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh0 AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
),
victims AS (
    SELECT DISTINCT id_b AS doc_id
    FROM inter
    JOIN sz sa ON sa.id = id_a
    JOIN sz sb ON sb.id = id_b
    WHERE (2 * 1000000 * n + (sa.sz + sb.sz - n))
          // (2 * (sa.sz + sb.sz - n)) >= 500000
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM victims)
"""


# ---------------------------------------------------------------------------
# dedup suite (documents)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import exact_dedup

    return exact_dedup(load_parallel(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(load_parallel(spark, sf_dir, "documents"), n=3,
                               threshold=0.5, max_shingle_df=1000)


def q_dedup_jaccard_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-routed Jaccard pairs (VERDICT r04 #4): a one-scalar profile
    of the candidate-pair mass picks the exact relational explosion
    (within budget — the gate scales land here, so this query SHARES the
    plain jaccard twin and the routing is pinned lossless) or reroutes
    to LSH+exact-verify where a flat-but-fat df profile would turn
    sum(df^2) superlinear (the 10x bench corpus). Harnesses that already
    know the regime (the local gate at a pinned sf, plan dumps) export
    AUTONER_JACCARD_ROUTE=exact to skip the eager profile job and build
    the plan lazily. ONLY "exact" is honored here (r06 review): it is
    the lossless route (complete recall, per-pair values identical), so
    the override cannot change the emitted row set; "lsh" would shrink
    recall to the band guarantee and silently diverge from the exact
    oracle twin, so a stray inherited value fails loudly instead."""
    import os

    from .dedup import ngram_jaccard_pairs_routed

    route = os.environ.get("AUTONER_JACCARD_ROUTE") or None
    if route is not None and route != "exact":
        raise ValueError(
            "AUTONER_JACCARD_ROUTE accepts only 'exact' (lossless; an "
            "'lsh' override would change the emitted row set vs the "
            f"exact twin): {route!r}"
        )
    return ngram_jaccard_pairs_routed(
        load_parallel(spark, sf_dir, "documents"), n=3, threshold=0.5,
        max_shingle_df=1000,
        route=route,
    )


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard (AllPairs/PPJoin prefix): same output
    as dedup_ngram_jaccard — it SHARES that query's DuckDB twin, so the
    gate pins the prefix optimization as lossless — at a candidate cost of
    rare-prefix collisions instead of the full sum(df^2) explosion."""
    from .dedup import ngram_jaccard_prefix_pairs

    return ngram_jaccard_prefix_pairs(
        load_parallel(spark, sf_dir, "documents"), n=3, threshold=0.5,
        max_shingle_df=1000,
    )


SQL_DEDUP_NGRAM_JACCARD = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh0 AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
-- frequent-shingle guard (df > 1000 dropped), matching
-- ngram_jaccard_pairs(max_shingle_df=1000); sizes are post-filter too
rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       -- integer HALF_UP ppm then exact /1e6 (r06 money sweep): the
       -- rational n/union can sit exactly on a 6dp half where the two
       -- engines' round() implementations diverge
       ((2 * 1000000 * n + (sa.sz + sb.sz - n))
        // (2 * (sa.sz + sb.sz - n))) / 1000000.0 AS jaccard
FROM inter
JOIN sz sa ON sa.id = id_a
JOIN sz sb ON sb.id = id_b
WHERE (2 * 1000000 * n + (sa.sz + sb.sz - n))
      // (2 * (sa.sz + sb.sz - n)) >= 500000
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load_parallel(spark, sf_dir, "documents"),
                             num_hashes=16, band_size=4, n=3,
                             max_bucket_size=64)


SQL_DEDUP_MINHASH_LSH = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
-- non-distinct shingles: min over a multiset == min over the set
sh AS (SELECT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
-- one md5 per shingle occurrence; 16 salted variants via integer math
-- ((2h+1)x + h*12582917 mod 2^31-1), identical to dedup._salted_hash
base AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS x
    FROM sh
),
salted AS (
    SELECT id, h, ((2 * h + 1) * x + h * 12582917) % 2147483647 AS hv
    FROM base, unnest(range(0, 16)) AS u(h)
),
sig AS (SELECT id, h, min(hv) AS minhash FROM salted GROUP BY id, h),
banded AS (
    -- floor, not cast: DuckDB's double->int cast ROUNDS, Spark's truncates
    SELECT id, cast(floor(h / 4) AS integer) AS band,
           md5(string_agg(cast(minhash AS varchar), ',' ORDER BY h)) AS bucket
    FROM sig GROUP BY id, cast(floor(h / 4) AS integer)
),
-- bucket-size cap (skew guard): buckets larger than 64 are dropped whole,
-- matching minhash_lsh_pairs(max_bucket_size=64)
capped AS (
    SELECT band, bucket FROM banded GROUP BY band, bucket
    HAVING count(*) BETWEEN 2 AND 64
)
SELECT x.id AS id_a, y.id AS id_b, count(*) AS n_bands
FROM banded x JOIN banded y
  ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
JOIN capped c ON c.band = x.band AND c.bucket = x.bucket
GROUP BY x.id, y.id
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-shaped) dedup: the corpus is split into an existing
    OLD side and a NEW ingest batch (doc_id % 5 == 0 stands in for the
    batch); only pairs involving the batch are emitted — old-old pairs were
    settled by the original batch dedup and are filtered inside the pair
    explosion, before any shuffle."""
    from .dedup import incremental_minhash_pairs

    docs = load_parallel(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_minhash_pairs(old, new, num_hashes=16, band_size=4,
                                     n=3, max_bucket_size=64)


SQL_DEDUP_INCREMENTAL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
base AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS x
    FROM sh
),
salted AS (
    SELECT id, h, ((2 * h + 1) * x + h * 12582917) % 2147483647 AS hv
    FROM base, unnest(range(0, 16)) AS u(h)
),
sig AS (SELECT id, h, min(hv) AS minhash FROM salted GROUP BY id, h),
banded AS (
    SELECT id, cast(floor(h / 4) AS integer) AS band,
           md5(string_agg(cast(minhash AS varchar), ',' ORDER BY h)) AS bucket,
           CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END AS new
    FROM sig GROUP BY id, cast(floor(h / 4) AS integer)
),
capped AS (
    SELECT band, bucket FROM banded GROUP BY band, bucket
    HAVING count(*) BETWEEN 2 AND 64
)
SELECT x.id AS id_a, y.id AS id_b, count(*) AS n_bands,
       CASE WHEN max(x.new + y.new) = 2 THEN 'new_new'
            ELSE 'new_old' END AS involves_new
FROM banded x JOIN banded y
  ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
 AND (x.new = 1 OR y.new = 1)
JOIN capped c ON c.band = x.band AND c.bucket = x.bucket
GROUP BY x.id, y.id
"""


def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates + exact-Jaccard verification: the production near-dup
    composition (bounded candidate cost, exact-similarity output)."""
    from .dedup import minhash_verified_pairs

    return minhash_verified_pairs(load_parallel(spark, sf_dir, "documents"),
                                  num_hashes=16, band_size=4, n=3,
                                  threshold=0.5, max_bucket_size=64)


SQL_DEDUP_MINHASH_VERIFIED = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
base AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS x
    FROM sh
),
salted AS (
    SELECT id, h, ((2 * h + 1) * x + h * 12582917) % 2147483647 AS hv
    FROM base, unnest(range(0, 16)) AS u(h)
),
sig AS (SELECT id, h, min(hv) AS minhash FROM salted GROUP BY id, h),
banded AS (
    SELECT id, cast(floor(h / 4) AS integer) AS band,
           md5(string_agg(cast(minhash AS varchar), ',' ORDER BY h)) AS bucket
    FROM sig GROUP BY id, cast(floor(h / 4) AS integer)
),
capped AS (
    SELECT band, bucket FROM banded GROUP BY band, bucket
    HAVING count(*) BETWEEN 2 AND 64
),
cand AS (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
    JOIN capped c ON c.band = x.band AND c.bucket = x.bucket
),
dsh AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
sz AS (SELECT id, count(*) AS sz FROM dsh GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS n
    FROM cand c
    JOIN dsh a ON a.id = c.id_a
    JOIN dsh b ON b.id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       -- integer HALF_UP ppm then exact /1e6 (r06 money sweep)
       ((2 * 1000000 * n + (sa.sz + sb.sz - n))
        // (2 * (sa.sz + sb.sz - n))) / 1000000.0 AS jaccard
FROM inter
JOIN sz sa ON sa.id = id_a
JOIN sz sb ON sb.id = id_b
WHERE (2 * 1000000 * n + (sa.sz + sb.sz - n))
      // (2 * (sa.sz + sb.sz - n)) >= 500000
"""


def q_dedup_jaccard_drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the frequent-shingle guard: what
    ngram_jaccard_pairs(max_shingle_df=1000) would discard on this corpus.
    One row; zero drops on healthy data (the counter must not cry wolf)."""
    from .dedup import ngram_jaccard_drop_stats

    return ngram_jaccard_drop_stats(load_parallel(spark, sf_dir, "documents"),
                                    n=3, max_shingle_df=1000)


SQL_DEDUP_JACCARD_DROP_STATS = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
freq AS (SELECT shingle, count(*) AS n FROM sh GROUP BY shingle),
dropped AS (SELECT n FROM freq WHERE n > 1000)
SELECT count(*) AS n_dropped_groups,
       cast(coalesce(sum(n), 0) AS bigint) AS n_dropped_rows
FROM dropped
"""


def q_dedup_lsh_drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the MinHash-LSH bucket cap (max_bucket_size=64)."""
    from .dedup import minhash_lsh_drop_stats

    return minhash_lsh_drop_stats(load_parallel(spark, sf_dir, "documents"),
                                  num_hashes=16, band_size=4, n=3,
                                  max_bucket_size=64)


SQL_DEDUP_LSH_DROP_STATS = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
base AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS x
    FROM sh
),
salted AS (
    SELECT id, h, ((2 * h + 1) * x + h * 12582917) % 2147483647 AS hv
    FROM base, unnest(range(0, 16)) AS u(h)
),
sig AS (SELECT id, h, min(hv) AS minhash FROM salted GROUP BY id, h),
banded AS (
    SELECT id, cast(floor(h / 4) AS integer) AS band,
           md5(string_agg(cast(minhash AS varchar), ',' ORDER BY h)) AS bucket
    FROM sig GROUP BY id, cast(floor(h / 4) AS integer)
),
freq AS (SELECT band, bucket, count(*) AS n FROM banded GROUP BY band, bucket),
dropped AS (SELECT n FROM freq WHERE n > 64)
SELECT count(*) AS n_dropped_groups,
       cast(coalesce(sum(n), 0) AS bigint) AS n_dropped_rows
FROM dropped
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures via the zero-shuffle Arrow map stage (default
    production path); the DuckDB twin runs the relational vote pipeline —
    so the gate ALSO pins arrow == relational, on top of the pytest pin."""
    from .dedup import simhash_arrow

    return simhash_arrow(load_parallel(spark, sf_dir, "documents"))


SQL_DEDUP_SIMHASH = """
WITH toks AS (
    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
th AS (
    SELECT id, cast(('0x' || substring(md5(token), 1, 8)) AS bigint) AS hv
    FROM toks
),
votes AS (
    SELECT id, b, sum((cast(floor(hv / pow(2, b)) AS bigint) % 2) * 2 - 1) AS v
    FROM th, unnest(range(0, 32)) AS u(b)
    GROUP BY id, b
)
SELECT id, cast(sum(CASE WHEN v > 0 THEN cast(pow(2, b) AS bigint) ELSE 0 END) AS bigint) AS simhash
FROM votes GROUP BY id
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming<=3 near-dup pairs (Manku et al. WWW'07): block-bucket
    candidates with pigeonhole-exact recall + one bit_count(xor) verify."""
    from .dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(load_parallel(spark, sf_dir, "documents"),
                                 max_hamming=3, bits=32, n_blocks=4,
                                 max_bucket_size=256)


SQL_DEDUP_SIMHASH_PAIRS = """
WITH toks AS (
    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
th AS (
    SELECT id, cast(('0x' || substring(md5(token), 1, 8)) AS bigint) AS hv
    FROM toks
),
votes AS (
    SELECT id, b, sum((cast(floor(hv / pow(2, b)) AS bigint) % 2) * 2 - 1) AS v
    FROM th, unnest(range(0, 32)) AS u(b)
    GROUP BY id, b
),
sig AS (
    SELECT id, cast(sum(CASE WHEN v > 0 THEN cast(pow(2, b) AS bigint)
                        ELSE 0 END) AS bigint) AS simhash
    FROM votes GROUP BY id
),
blocks AS (
    SELECT id, b, cast(floor(simhash / pow(2, b * 8)) AS bigint) % 256 AS block
    FROM sig, unnest(range(0, 4)) AS u(b)
),
freq AS (
    SELECT b, block FROM blocks GROUP BY b, block
    HAVING count(*) BETWEEN 2 AND 256
),
cand AS (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM blocks x
    JOIN blocks y ON x.b = y.b AND x.block = y.block AND x.id < y.id
    JOIN freq f ON f.b = x.b AND f.block = x.block
)
SELECT c.id_a, c.id_b,
       cast(bit_count(xor(sa.simhash, sb.simhash)) AS integer) AS hamming
FROM cand c
JOIN sig sa ON sa.id = c.id_a
JOIN sig sb ON sb.id = c.id_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors whose cosine >= 0.45
    (the synthetic embeddings are near-orthogonal; max pairwise cosine ~0.51).
    Brute-force pair scan (the correctness baseline; the LSH/IVF queries are
    the scale path) — GUARDED: refuses inputs beyond 50k vectors so the
    exact baseline cannot be lifted into a production pipeline by accident.
    Deterministic double math, rounded."""
    from .similarity import guard_brute_force, with_cosine

    emb = load_parallel(spark, sf_dir, "embeddings")
    guard_brute_force(emb, 50_000, "dedup_embedding_lsh")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("qvec"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("embedding"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs)
        .filter(F.round(F.col("cosine"), 6) >= 0.45)  # money: irrational
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))  # money: irrational
    )


SQL_DEDUP_EMBEDDING_COSINE = """
WITH pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           cast(unnest(a.embedding) AS double) AS x,
           cast(unnest(b.embedding) AS double) AS y
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
),
scored AS (
    SELECT id_a, id_b,
           sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cosine
    FROM pairs GROUP BY id_a, id_b
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM scored WHERE round(cosine, 6) >= 0.45
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at SCALE: sign-LSH candidates + exact verify —
    no crossJoin anywhere in the plan (contrast q_dedup_embedding_cosine,
    the exhaustive exact baseline). The corpus is augmented with planted
    rescaled duplicates (vec_id+100000, 1.25x) — sign-identical vectors
    collide in every band, so their recall is structurally guaranteed."""
    from .similarity import embedding_lsh_pairs

    emb = load_parallel(spark, sf_dir, "embeddings")
    orig = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    copies = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * F.lit(1.25)
        ).alias("embedding"),
    )
    return embedding_lsh_pairs(orig.unionByName(copies), threshold=0.99,
                               bits_per_band=16, n_bands=4)


SQL_DEDUP_EMBEDDING_LSH = """
WITH aug AS (
    SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS embedding
    FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           list_transform(embedding, x -> cast(x AS double) * 1.25)
    FROM embeddings WHERE vec_id < 25
),
ex AS (
    SELECT vec_id, unnest(range(0, len(embedding))) AS d,
           unnest(embedding) AS x
    FROM aug
),
-- in-engine hyperplanes: w[j][d] = md5_int32('j:d') / 2^31 - 1; the
-- dimension indices come from the DATA (not a hardcoded width) so the twin
-- stays in lockstep with hyperplane_bits' dim discovery
dims AS (SELECT DISTINCT unnest(range(0, len(embedding))) AS d FROM aug),
hyp AS (
    SELECT j, d,
           cast(('0x' || substring(md5(concat(j, ':', d)), 1, 8)) AS bigint)
               / 2147483648.0 - 1.0 AS w
    FROM range(0, 64) t1(j), dims t2
),
dots AS (
    SELECT e.vec_id, h.j, sum(e.x * h.w) AS dot
    FROM ex e JOIN hyp h USING (d)
    GROUP BY e.vec_id, h.j
),
-- sign on the 6dp-rounded dot: raw double sums are aggregation-order
-- dependent; a dot within rounding distance of 0 must not flip between
-- engines
bits AS (
    SELECT vec_id, j, CASE WHEN round(dot, 6) > 0 THEN 1 ELSE 0 END AS bit
    FROM dots
),
bucketed AS (
    SELECT vec_id, cast(floor(j / 16) AS integer) AS band,
           cast(sum(bit * cast(pow(2, j % 16) AS bigint)) AS bigint) AS bucket
    FROM bits GROUP BY vec_id, cast(floor(j / 16) AS integer)
),
sizes AS (
    SELECT band, bucket, count(*) AS n FROM bucketed GROUP BY band, bucket
),
cand AS (
    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
    FROM bucketed x
    JOIN bucketed y ON x.band = y.band AND x.bucket = y.bucket
                   AND x.vec_id < y.vec_id
    JOIN sizes s ON s.band = x.band AND s.bucket = x.bucket
                AND s.n BETWEEN 2 AND 64
),
pairs AS (
    SELECT c.id_a, c.id_b,
           unnest(a.embedding) AS xa, unnest(b.embedding) AS xb
    FROM cand c
    JOIN aug a ON a.vec_id = c.id_a
    JOIN aug b ON b.vec_id = c.id_b
),
scored AS (
    SELECT id_a, id_b,
           sum(xa * xb) / (sqrt(sum(xa * xa)) * sqrt(sum(xb * xb))) AS cosine
    FROM pairs GROUP BY id_a, id_b
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM scored WHERE round(cosine, 6) >= 0.99
"""


def q_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: documents sharing any 4-gram with the
    deterministic 'eval set' stand-in (doc_id % 20 == 0). Broadcast
    benchmark shingles; the corpus streams once."""
    from .dedup import decontaminate

    docs = load_parallel(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(docs, benchmark, n=4)


SQL_DEDUP_DECONTAMINATE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
four AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                             lead(tok, 3) OVER w) AS shingle,
           lead(tok, 3) OVER w AS t4
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM four WHERE t4 IS NOT NULL),
bench_sh AS (SELECT DISTINCT shingle FROM sh WHERE id % 20 = 0)
SELECT sh.id AS doc_id, count(*) AS n_shared_ngrams
FROM sh JOIN bench_sh USING (shingle)
WHERE sh.id % 20 <> 0
GROUP BY sh.id
"""


def q_text_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-minima fingerprint (winnowing-style rolling fingerprint):
    the 3 smallest hashed trigram shingles per document, concatenated — a
    content-locality-preserving dedup/sharding key."""
    from .dedup import md5_int32, shingles_df

    sh = shingles_df(load_parallel(spark, sf_dir, "documents"), n=3)
    hashed = sh.withColumn("hv", md5_int32(F.col("shingle")))
    return (
        hashed.groupBy("id")
        .agg(F.array_sort(F.collect_list("hv")).alias("hs"))
        .select(
            "id",
            F.array_join(F.slice("hs", 1, 3), "-").alias("fp"),
            F.size("hs").alias("n_shingles"),
        )
    )


SQL_TEXT_WINNOW_FP = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
hashed AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS hv
    FROM sh
)
SELECT id,
       string_agg(cast(hv AS varchar), '-' ORDER BY hv) FILTER (
           WHERE rnk <= 3) AS fp,
       cast(count(*) AS integer) AS n_shingles
FROM (SELECT id, hv, row_number() OVER (PARTITION BY id ORDER BY hv) AS rnk
      FROM hashed)
GROUP BY id
"""


def q_text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    (letter runs / digit runs / single other chars) — the pre-tokenizer
    shape used when budgeting LLM training tokens."""
    d = load_parallel(spark, sf_dir, "documents")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return d.select(
        F.col("doc_id").alias("id"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(pattern)).cast("int")
        .alias("n_bpe_tokens"),
    )


SQL_TEXT_TOKEN_COUNT_BPE = """
SELECT doc_id AS id,
       cast(len(string_split(text, ' ')) AS integer) AS n_ws_tokens,
       cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
            AS integer) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------

_COSINE_PAIRS_CTE = """
pairs AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           cast(unnest(q.embedding) AS double) AS a,
           cast(unnest(e.embedding) AS double) AS b
    FROM embeddings q, embeddings e
    WHERE q.vec_id < {maxq} AND q.vec_id <> e.vec_id
),
scored AS (
    SELECT query_id, vec_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cosine
    FROM pairs GROUP BY query_id, vec_id
)
"""


def q_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import brute_force_topk, queries_from_ids

    emb = load_parallel(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, queries_from_ids(emb, 10), k=5)


SQL_SIM_TOPK_COSINE = f"""
WITH {_COSINE_PAIRS_CTE.format(maxq=10)}
SELECT query_id, cast(rnk AS integer) AS rnk, vec_id, round(cosine, 6) AS cosine
FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rnk
    FROM scored
) WHERE rnk <= 5
"""


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import ivf_topk

    return ivf_topk(load_parallel(spark, sf_dir, "embeddings"), k=3,
                    n_centroids=32, max_query_id=10)


SQL_SIM_IVF_TOPK = """
WITH cents AS (
    -- fixed-k hash-ordered centroid sample, matching similarity.ivf_centroids
    SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
    ORDER BY cast(('0x' || substring(md5(cast(vec_id AS varchar)), 1, 8)) AS bigint),
             vec_id
    LIMIT 32
),
apairs AS (
    SELECT e.vec_id, c.centroid_id,
           cast(unnest(e.embedding) AS double) AS a,
           cast(unnest(c.cvec) AS double) AS b
    FROM embeddings e, cents c
),
ascored AS (
    SELECT vec_id, centroid_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cos
    FROM apairs GROUP BY vec_id, centroid_id
),
assign AS (
    SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rnk
        FROM ascored
    ) WHERE rnk = 1
),
base AS (
    SELECT e.vec_id, e.embedding, a.centroid_id
    FROM embeddings e JOIN assign a USING (vec_id)
),
qpairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           cast(unnest(q.embedding) AS double) AS a,
           cast(unnest(c.embedding) AS double) AS b
    FROM base q JOIN base c ON q.centroid_id = c.centroid_id
    WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
qscored AS (
    SELECT query_id, vec_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cosine
    FROM qpairs GROUP BY query_id, vec_id
)
SELECT query_id, rnk, vec_id, round(cosine, 6) AS cosine
FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rnk
    FROM qscored
) WHERE rnk <= 3
"""


def q_dedup_embedding_drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the sign-LSH bucket cap (max_bucket_size=64) over
    the raw embeddings table."""
    from .similarity import embedding_lsh_drop_stats

    return embedding_lsh_drop_stats(load_parallel(spark, sf_dir, "embeddings"),
                                    bits_per_band=16, n_bands=4,
                                    max_bucket_size=64)


SQL_DEDUP_EMBEDDING_DROP_STATS = """
WITH ex AS (
    SELECT vec_id, unnest(range(0, len(embedding))) AS d,
           cast(unnest(embedding) AS double) AS x
    FROM embeddings
),
dims AS (SELECT DISTINCT unnest(range(0, len(embedding))) AS d FROM embeddings),
hyp AS (
    SELECT j, d,
           cast(('0x' || substring(md5(concat(j, ':', d)), 1, 8)) AS bigint)
               / 2147483648.0 - 1.0 AS w
    FROM range(0, 64) t1(j), dims t2
),
dots AS (
    SELECT e.vec_id, h.j, sum(e.x * h.w) AS dot
    FROM ex e JOIN hyp h USING (d)
    GROUP BY e.vec_id, h.j
),
bits AS (
    SELECT vec_id, j, CASE WHEN round(dot, 6) > 0 THEN 1 ELSE 0 END AS bit
    FROM dots
),
bucketed AS (
    SELECT vec_id, cast(floor(j / 16) AS integer) AS band,
           cast(sum(bit * cast(pow(2, j % 16) AS bigint)) AS bigint) AS bucket
    FROM bits GROUP BY vec_id, cast(floor(j / 16) AS integer)
),
freq AS (SELECT band, bucket, count(*) AS n FROM bucketed GROUP BY band, bucket),
dropped AS (SELECT n FROM freq WHERE n > 64)
SELECT count(*) AS n_dropped_groups,
       cast(coalesce(sum(n), 0) AS bigint) AS n_dropped_rows
FROM dropped
"""


def q_sim_ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-probe (nprobe=2): each query unions its two
    nearest clusters' candidates, bounding the recall loss at cluster
    boundaries that nprobe=1 cannot. Candidate storage is unchanged; only
    the query fan-out doubles."""
    from .similarity import ivf_topk

    return ivf_topk(load_parallel(spark, sf_dir, "embeddings"), k=3,
                    n_centroids=32, max_query_id=10, nprobe=2)


SQL_SIM_IVF_TOPK_NPROBE = """
WITH cents AS (
    SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
    ORDER BY cast(('0x' || substring(md5(cast(vec_id AS varchar)), 1, 8)) AS bigint),
             vec_id
    LIMIT 32
),
apairs AS (
    SELECT e.vec_id, c.centroid_id,
           cast(unnest(e.embedding) AS double) AS a,
           cast(unnest(c.cvec) AS double) AS b
    FROM embeddings e, cents c
),
ascored AS (
    SELECT vec_id, centroid_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cos
    FROM apairs GROUP BY vec_id, centroid_id
),
ranked AS (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, centroid_id) AS rnk
    FROM ascored
),
assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rnk = 1),
probes AS (SELECT vec_id, centroid_id FROM ranked WHERE rnk <= 2
           AND vec_id < 10),
cand AS (
    SELECT e.vec_id, e.embedding, a.centroid_id
    FROM embeddings e JOIN assign a USING (vec_id)
),
qpairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           cast(unnest(q.embedding) AS double) AS a,
           cast(unnest(c.embedding) AS double) AS b
    FROM embeddings q
    JOIN probes p ON p.vec_id = q.vec_id
    JOIN cand c ON c.centroid_id = p.centroid_id
    WHERE q.vec_id <> c.vec_id
),
qscored AS (
    SELECT query_id, vec_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cosine
    FROM qpairs GROUP BY query_id, vec_id
)
SELECT query_id, cast(rnk AS integer) AS rnk, vec_id, round(cosine, 6) AS cosine
FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rnk
    FROM qscored
) WHERE rnk <= 3
"""


def q_sim_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration over the md5-seeded hash-sample
    init, output as EXACT INTEGERS: per (centroid, dim) the scaled-component
    sum (micro-units) and member count, i.e. the mean as an un-divided
    ratio. Gating the ratio instead of round(sum/count/1e6, 6) is
    deliberate: integer sums over even counts land the mean EXACTLY on the
    0.5e-6 rounding boundary systematically, where Spark's BigDecimal
    HALF_UP and DuckDB's double rounding disagree — the exact pair pins the
    Lloyd step with zero FP at all. Runs the same code path
    (similarity.kmeans_component_sums) ivf_centroids_kmeans consumes."""
    from .similarity import ivf_centroids, kmeans_component_sums

    emb = load_parallel(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    return kmeans_component_sums(base, ivf_centroids(emb, 32))


SQL_SIM_KMEANS_CENTROIDS = """
WITH cents AS (
    SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
    ORDER BY cast(('0x' || substring(md5(cast(vec_id AS varchar)), 1, 8)) AS bigint),
             vec_id
    LIMIT 32
),
apairs AS (
    SELECT e.vec_id, c.centroid_id,
           cast(unnest(e.embedding) AS double) AS a,
           cast(unnest(c.cvec) AS double) AS b
    FROM embeddings e, cents c
),
ascored AS (
    SELECT vec_id, centroid_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cos
    FROM apairs GROUP BY vec_id, centroid_id
),
assign AS (
    SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rnk
        FROM ascored
    ) WHERE rnk = 1
),
-- scaled-integer components (micro-units): exact integer sums, so the
-- Lloyd state is aggregation-order-independent on both engines; the gate
-- compares the un-divided (sum, count) ratio — zero FP
comp AS (
    SELECT a.centroid_id,
           cast(unnest(range(0, len(e.embedding))) AS integer) AS d,
           cast(floor(cast(unnest(e.embedding) AS double) * 1000000 + 0.5)
                AS bigint) AS xs
    FROM embeddings e JOIN assign a USING (vec_id)
)
SELECT centroid_id, d, cast(sum(xs) AS bigint) AS sum_micro,
       cast(count(*) AS bigint) AS n
FROM comp GROUP BY centroid_id, d
"""


def q_sim_ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k=3, nprobe=2) over the k-means-refined coarse quantizer
    (1 Lloyd iteration) — the production IVF shape: refined centroids give
    better-balanced clusters and strictly better recall than the raw hash
    sample at equal nprobe (pinned by pytest)."""
    from .similarity import ivf_topk

    return ivf_topk(load_parallel(spark, sf_dir, "embeddings"), k=3,
                    n_centroids=32, max_query_id=10, nprobe=2,
                    kmeans_iters=1)


SQL_SIM_IVF_TOPK_KMEANS = """
WITH cents0 AS (
    SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
    ORDER BY cast(('0x' || substring(md5(cast(vec_id AS varchar)), 1, 8)) AS bigint),
             vec_id
    LIMIT 32
),
ap0 AS (
    SELECT e.vec_id, c.centroid_id,
           cast(unnest(e.embedding) AS double) AS a,
           cast(unnest(c.cvec) AS double) AS b
    FROM embeddings e, cents0 c
),
as0 AS (
    SELECT vec_id, centroid_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cos
    FROM ap0 GROUP BY vec_id, centroid_id
),
assign0 AS (
    SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, centroid_id) AS rnk
        FROM as0
    ) WHERE rnk = 1
),
comp AS (
    SELECT a.centroid_id,
           cast(unnest(range(0, len(e.embedding))) AS integer) AS d,
           cast(floor(cast(unnest(e.embedding) AS double) * 1000000 + 0.5)
                AS bigint) AS xs
    FROM embeddings e JOIN assign0 a USING (vec_id)
),
means AS (
    SELECT centroid_id, d, sum(xs) / count(*) / 1000000.0 AS m
    FROM comp GROUP BY centroid_id, d
),
ex AS (
    SELECT vec_id, cast(unnest(range(0, len(embedding))) AS integer) AS d,
           cast(unnest(embedding) AS double) AS x
    FROM embeddings
),
as1 AS (
    SELECT e.vec_id, m.centroid_id,
           sum(e.x * m.m) / (sqrt(sum(e.x * e.x)) * sqrt(sum(m.m * m.m))) AS cos
    FROM ex e JOIN means m USING (d)
    GROUP BY e.vec_id, m.centroid_id
),
ranked AS (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, centroid_id) AS rnk
    FROM as1
),
assign AS (SELECT vec_id, centroid_id FROM ranked WHERE rnk = 1),
probes AS (SELECT vec_id, centroid_id FROM ranked WHERE rnk <= 2
           AND vec_id < 10),
cand AS (
    SELECT e.vec_id, e.embedding, a.centroid_id
    FROM embeddings e JOIN assign a USING (vec_id)
),
qpairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           cast(unnest(q.embedding) AS double) AS a,
           cast(unnest(c.embedding) AS double) AS b
    FROM embeddings q
    JOIN probes p ON p.vec_id = q.vec_id
    JOIN cand c ON c.centroid_id = p.centroid_id
    WHERE q.vec_id <> c.vec_id
),
qscored AS (
    SELECT query_id, vec_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cosine
    FROM qpairs GROUP BY query_id, vec_id
)
SELECT query_id, cast(rnk AS integer) AS rnk, vec_id, round(cosine, 6) AS cosine
FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rnk
    FROM qscored
) WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# text analysis (documents)
# ---------------------------------------------------------------------------


def q_text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-stable train/val/test split (80/10/10): every
    training pipeline needs one, and it must be a pure function of the key
    (re-runs, new shards and different partitionings all agree). Portable
    hash -> bucket in [0,100)."""
    d = load(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long") % 100
    )
    return d.select(
        "doc_id",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
        .alias("split"),
    )


SQL_TEXT_SPLIT_ASSIGN = """
SELECT doc_id,
       CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           cast(('0x' || substring(md5(cast(doc_id AS varchar)), 1, 8))
                AS bigint) % 100 AS h
    FROM documents
)
"""


def q_text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (context-window sharding): within each source
    shard, documents are laid out in doc_id order and cut into 2048-token
    bins by starting offset — the deterministic relational form of LLM
    sample packing. The running sum is a two-pass distributed prefix sum
    (textstats.pack_token_bins): a single per-source window would serialize
    nearly the whole corpus through one partition, since real corpora have
    few sources. The DuckDB twin keeps the naive single-window form — same
    output, so the gate also pins two-pass == naive."""
    from .textstats import pack_token_bins

    # scale-safe default block size (4096): the broadcast offsets relation
    # stays ~N/4096 rows; the multi-block two-pass path itself is pinned by
    # the pytest fixture, which forces many small blocks explicitly
    return pack_token_bins(load_parallel(spark, sf_dir, "documents"),
                           bin_tokens=2048)


SQL_TEXT_PACK_BINS = """
WITH laid AS (
    SELECT doc_id, source,
           len(string_split(text, ' ')) AS n_tokens,
           sum(len(string_split(text, ' '))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
    FROM documents
)
SELECT source, cast(floor((cum - n_tokens) / 2048) AS integer) AS bin,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM laid
GROUP BY source, cast(floor((cum - n_tokens) / 2048) AS integer)
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document n-gram repetition stats (Gopher-rules family): the
    quality filter that catches boilerplate and looping generations."""
    from .textstats import repetition_stats

    return repetition_stats(load_parallel(spark, sf_dir, "documents"), n=3)


SQL_TEXT_REPETITION = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
per AS (
    SELECT doc_id AS id, shingle, count(*) AS c
    FROM tri WHERE t3 IS NOT NULL
    GROUP BY doc_id, shingle
)
SELECT id, cast(sum(c) AS integer) AS n_shingles,
       cast(max(c) AS integer) AS max_repeat,
       ((2 * 1000000 * sum(CASE WHEN c > 1 THEN c ELSE 0 END) + sum(c))
        // (2 * sum(c))) / 1000000.0 AS rep_ratio
FROM per GROUP BY id
"""


def q_dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER dedup: the pairwise jaccard edges are closed into
    connected components (transitive near-duplication) and every document
    is assigned its cluster's canonical representative (min doc_id) — the
    production retention rule when A~B and B~C but A!~C. Composes the
    guarded pair generator with the adaptive CC operator; CC runs on the
    PAIR EDGES ONLY (bounded by the near-dup families, not the corpus) and
    singletons get their own id via a left-join coalesce — the corpus never
    enters the iterative graph. Ids run through a fixed-width string key so
    CC's string-min equals numeric min."""
    from .dedup import ngram_jaccard_pairs

    docs = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_shingle_df=1000)
    from .canonicalize import fixed_width_key

    kid = lambda c: fixed_width_key(F.col(c))  # noqa: E731
    edges = pairs.select(kid("id_a").alias("src"), kid("id_b").alias("dst"))
    comp = connected_components(edges)
    return (
        docs.select("doc_id", kid("doc_id").alias("node"))
        .join(comp, "node", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp").cast("long"), F.col("doc_id"))
            .alias("keep_id"),
        )
    )


SQL_DEDUP_CLUSTER_ASSIGN = """
WITH RECURSIVE toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh0 AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
),
pairs AS (
    SELECT lpad(cast(id_a AS varchar), 20, '0') AS src,
           lpad(cast(id_b AS varchar), 20, '0') AS dst
    FROM inter
    JOIN sz sa ON sa.id = id_a
    JOIN sz sb ON sb.id = id_b
    WHERE (2 * 1000000 * n + (sa.sz + sb.sz - n))
          // (2 * (sa.sz + sb.sz - n)) >= 500000
),
edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
nodes AS (SELECT lpad(cast(doc_id AS varchar), 20, '0') AS node FROM documents),
reach AS (
    SELECT node, node AS comp FROM nodes
    UNION
    SELECT e.dst AS node, r.comp FROM reach r JOIN edges e ON e.src = r.node
),
comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
SELECT cast(node AS bigint) AS doc_id, cast(comp AS bigint) AS keep_id
FROM comps
"""


def q_text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: each source keeps a different
    fraction (web 25%, books 75%, everything else 50%) — the data-mixing
    primitive for training-set composition. Content-stable (hash of
    doc_id, not rand()): re-runs, resharding and different partitionings
    all select the same rows, and the sample composes with the split
    assignment. Map-only: no shuffle, no sampling state.

    doc_id is a key (never NULL), but the NOT NULL guard is kept explicit
    on both engines anyway: the md5(concat(...)) pattern diverges on NULL
    keys (Spark drops, DuckDB keeps the prefix), so every query using it
    carries the guard rather than relying on schema knowledge."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("strat:"),
                                          F.col("doc_id").cast("string"))),
                           1, 8), 16, 10).cast("long") % 100
    )
    rate = (
        F.when(F.col("source") == "web", 25)
        .when(F.col("source") == "books", 75)
        .otherwise(50)
    )
    return d.select("doc_id", "source", h.alias("h")).filter(
        F.col("h") < rate
    ).select("doc_id", "source")


SQL_TEXT_STRATIFIED_SAMPLE = """
SELECT doc_id, source
FROM (
    SELECT doc_id, source,
           cast(('0x' || substring(md5(concat('strat:',
                cast(doc_id AS varchar))), 1, 8)) AS bigint) % 100 AS h,
           CASE WHEN source = 'web' THEN 25
                WHEN source = 'books' THEN 75 ELSE 50 END AS rate
    FROM documents
    WHERE doc_id IS NOT NULL
)
WHERE h < rate
"""


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: emails and international phone numbers
    found, counted and replaced with typed placeholders — the scrub every
    web-scale training pipeline runs before anything else. Pure JVM-side
    regexp expressions (patterns kept in the Java/RE2 common dialect so
    the DuckDB twin is exact). The fixture corpus carries no PII, so the
    query PLANTS deterministic doc_id-derived contacts on a tenth of the
    documents first; the gate then pins detection counts AND the md5 of
    the scrubbed text."""
    email_re = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
    phone_re = "\\+[0-9]{8,15}"
    d = load(spark, sf_dir, "documents")
    planted = d.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" contact user"),
                     F.col("doc_id").cast("string"),
                     F.lit("@example.com now")),
        ).when(
            F.col("doc_id") % 10 == 5,
            F.concat(F.col("text"), F.lit(" call +1555"),
                     F.lpad((F.col("doc_id") % 10_000_000).cast("string"),
                            7, "0")),
        ).otherwise(F.col("text")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), email_re, "<EMAIL>"),
        phone_re, "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(email_re)).cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(phone_re)).cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


SQL_TEXT_PII_SCRUB = """
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0
                THEN concat(text, ' contact user', cast(doc_id AS varchar),
                            '@example.com now')
                WHEN doc_id % 10 = 5
                THEN concat(text, ' call +1555',
                            lpad(cast(doc_id % 10000000 AS varchar), 7, '0'))
                ELSE text END AS t
    FROM documents
)
SELECT doc_id,
       cast(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+'))
            AS bigint) AS n_emails,
       cast(len(regexp_extract_all(t, '\\+[0-9]{8,15}')) AS bigint)
            AS n_phones,
       md5(regexp_replace(
           regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
           '\\+[0-9]{8,15}', '<PHONE>', 'g')) AS scrubbed_md5
FROM planted
"""


def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary mining: the 20 trigram shingles with the
    highest document frequency (deterministic tie-break by shingle). The
    top-k runs as a TakeOrdered over the aggregated df relation —
    O(log k) heap per partition, no global sort materialization."""
    from .dedup import shingles_df

    sh = shingles_df(load_parallel(spark, sf_dir, "documents"), n=3)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


SQL_TEXT_NGRAM_TOPK = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL)
SELECT shingle, cast(count(*) AS bigint) AS df
FROM sh GROUP BY shingle
ORDER BY df DESC, shingle
LIMIT 20
"""


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: fixed-width (16-token) histogram of document
    token counts with per-bucket extremes — the one-pass shape every
    corpus audit starts with. Integer bucket math only (floor(n/16)):
    a log2-based bucket would sit exactly on power-of-two boundaries
    where the two engines' log implementations can disagree by 1 ulp."""
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    return (
        d.select(F.floor(n / 16).cast("int").alias("len_bucket"),
                 n.alias("n"))
        .groupBy("len_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n").cast("long").alias("min_tokens"),
            F.max("n").cast("long").alias("max_tokens"),
        )
    )


SQL_TEXT_LENGTH_HISTOGRAM = """
SELECT cast(floor(len(string_split(text, ' ')) / 16) AS integer) AS len_bucket,
       cast(count(*) AS bigint) AS n_docs,
       cast(min(len(string_split(text, ' '))) AS bigint) AS min_tokens,
       cast(max(len(string_split(text, ' '))) AS bigint) AS max_tokens
FROM documents
GROUP BY 1
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import token_stats

    return token_stats(load_parallel(spark, sf_dir, "documents"))


SQL_TEXT_TOKEN_STATS = """
SELECT doc_id AS id,
       cast(len(string_split(text, ' ')) AS integer) AS n_tokens,
       cast(length(text) AS integer) AS n_chars,
       ((2 * 10000 * (cast(length(text) AS bigint)
                      - (len(string_split(text, ' ')) - 1))
         + len(string_split(text, ' ')))
        // (2 * cast(len(string_split(text, ' ')) AS bigint)))
           / 10000.0 AS avg_token_len
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import quality_score

    return quality_score(load_parallel(spark, sf_dir, "documents"))


SQL_TEXT_QUALITY = """
WITH toks AS (
    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
agg AS (
    SELECT id, count(*) AS n,
           sum(CASE WHEN tok IN ('the','a','of','and','is','to','in')
               THEN 1 ELSE 0 END) AS n_sw,
           count(DISTINCT tok) AS n_distinct
    FROM toks GROUP BY id
)
SELECT id, cast(n AS integer) AS n_tokens,
       ((2 * 1000000 * n_sw + n) // (2 * n)) / 1000000.0 AS stopword_ratio,
       ((2 * 1000000 * n_distinct + n) // (2 * n)) / 1000000.0
           AS distinct_ratio,
       ((2 * 1000000 * n_distinct * (n - n_sw) + n * n) // (2 * n * n))
           / 1000000.0 AS quality
FROM agg
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import lang_id

    return lang_id(load_parallel(spark, sf_dir, "documents"))


SQL_TEXT_LANGID = """
WITH toks AS (
    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
    FROM documents
),
agg AS (
    SELECT id, count(*) AS n,
        sum(CASE WHEN tok IN ('the','and','is','of','to','a') THEN 1 ELSE 0 END) AS h_en,
        sum(CASE WHEN tok IN ('le','la','et','est','les','de') THEN 1 ELSE 0 END) AS h_fr,
        sum(CASE WHEN tok IN ('der','die','und','ist','das','ein') THEN 1 ELSE 0 END) AS h_de,
        sum(CASE WHEN tok IN ('el','la','y','es','los','de') THEN 1 ELSE 0 END) AS h_es
    FROM toks GROUP BY id
),
-- integer HALF_UP ppm ratios (r06 money sweep); threshold/argmax on the
-- exact bigints, identical on both engines
p AS (
    SELECT id,
        (2 * 1000000 * h_en + n) // (2 * n) AS r_en,
        (2 * 1000000 * h_fr + n) // (2 * n) AS r_fr,
        (2 * 1000000 * h_de + n) // (2 * n) AS r_de,
        (2 * 1000000 * h_es + n) // (2 * n) AS r_es
    FROM agg
)
SELECT id,
       CASE WHEN r_de >= 50000 AND r_de = greatest(r_de, r_en, r_es, r_fr) THEN 'de'
            WHEN r_en >= 50000 AND r_en = greatest(r_de, r_en, r_es, r_fr) THEN 'en'
            WHEN r_es >= 50000 AND r_es = greatest(r_de, r_en, r_es, r_fr) THEN 'es'
            WHEN r_fr >= 50000 AND r_fr = greatest(r_de, r_en, r_es, r_fr) THEN 'fr'
            ELSE 'und' END AS lang_pred,
       greatest(r_de, r_en, r_es, r_fr) / 1000000.0 AS marker_ratio
FROM p
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import fingerprint

    return fingerprint(load_parallel(spark, sf_dir, "documents"))


SQL_TEXT_FINGERPRINT = """
SELECT doc_id AS id,
       md5(array_to_string(string_split(text, ' '), ' ')) AS fp,
       cast(len(string_split(text, ' ')) AS integer) AS n_tokens,
       cast(floor(log2(length(text) + 1)) AS integer) AS len_bucket
FROM documents
"""


# ---------------------------------------------------------------------------
# multimodal plumbing (documents -> synthetic manifest)
# ---------------------------------------------------------------------------


def q_mm_manifest_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import synth_manifest

    return synth_manifest(load_parallel(spark, sf_dir, "documents")).select(
        "item_id", "modality", "width", "height", "n_frames"
    )


SQL_MM_MANIFEST_META = """
WITH m AS (
    SELECT doc_id AS item_id,
           CASE cast(doc_id % 3 AS integer) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           cast(('0x' || substring(md5(text), 1, 8)) AS bigint) AS hi
    FROM documents
)
SELECT item_id, modality,
       cast(hi % 1920 + 16 AS integer) AS width,
       -- floor, not cast: DuckDB's double->int cast ROUNDS, Spark's truncates
       cast(cast(floor(hi / 1920) AS bigint) % 1080 + 16 AS integer) AS height,
       cast(hi % 240 + 1 AS integer) AS n_frames
FROM m
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import frame_sample, synth_manifest

    return frame_sample(synth_manifest(load_parallel(spark, sf_dir, "documents")),
                        every=30)


SQL_MM_FRAME_SAMPLE = """
WITH m AS (
    SELECT doc_id AS item_id,
           CASE cast(doc_id % 3 AS integer) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           cast(('0x' || substring(md5(text), 1, 8)) AS bigint) AS hi
    FROM documents
)
SELECT item_id, cast(unnest(generate_series(0, cast(hi % 240 + 1 AS integer) - 1, 30)) AS integer) AS frame_idx
FROM m WHERE modality = 'video'
"""


# ---------------------------------------------------------------------------
# round-4 wave 2: retrieval scoring, chunking, graph centrality, sketches,
# warehouse merge
# ---------------------------------------------------------------------------


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking (Robertson/Sparck-Jones; k1=1.2, b=0.75) of
    documents against a fixed 3-term query — the retrieval primitive a
    training-data curator uses to mine topical subsets. Shape at 100 TB:
    the term filter prunes the exploded token stream BEFORE the first
    shuffle (only query-term postings survive), the per-term df relation
    is vocabulary-bounded (broadcast), and corpus stats (N, avgdl) are a
    single broadcast row. The corpus streams twice — once for the stats
    aggregate (no explode, map-side combined) and once for the postings —
    and the tiny surviving tf relation is PERSISTED for its two consumers
    (df build + scoring probe) so the tokenize/explode lineage runs
    exactly once. Scores are rounded to 6dp BEFORE the top-k ordering so
    both engines pick the same 20 docs (tie-break doc_id)."""
    k1, b = 1.2, 0.75
    terms = ["join", "scan", "filter"]
    d = load_parallel(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # per-term tf is counted IN-ROW (size of the filtered token array,
    # one struct per query term), so the postings relation is born tiny:
    # the former explode-the-token-stream + groupBy(doc_id, dl, tok)
    # pass shuffled every query-term occurrence just to count per doc
    # (r07: 1 Exchange + the corpus-sized explode removed)
    tf_arr = F.array(*[
        F.struct(
            F.lit(t).alias("tok"),
            F.size(
                F.filter(F.col("toks"), lambda x: x == F.lit(t))
            ).cast("long").alias("tf"),
        )
        for t in terms
    ])
    tf = persist_tracked(
        dl.select("doc_id", "dl", F.explode(tf_arr).alias("s"))
        .select("doc_id", "dl", F.col("s.tok").alias("tok"),
                F.col("s.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    df_rel = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_rel), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            F.round(F.sum("w"), 6).alias("score"),  # money: irrational
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(20)


SQL_TEXT_BM25_TOPK = """
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
stats AS (
    SELECT cast(count(*) AS bigint) AS n_docs, avg(dl) AS avgdl FROM dl
),
tf AS (
    SELECT doc_id, dl, tok, cast(count(*) AS bigint) AS tf
    FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
    WHERE tok IN ('join', 'scan', 'filter')
    GROUP BY doc_id, dl, tok
),
dfr AS (SELECT tok, cast(count(*) AS bigint) AS df FROM tf GROUP BY tok),
scored AS (
    SELECT doc_id, cast(count(*) AS integer) AS n_terms,
           round(sum(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
           ), 6) AS score
    FROM tf JOIN dfr USING (tok) CROSS JOIN stats
    GROUP BY doc_id
)
SELECT doc_id, n_terms, score FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
"""


def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride document chunking with overlap (window=32 tokens,
    stride=24 -> 8-token overlap) — the context-window packing prep step
    for LLM training. Pure in-row integer/array expressions (sequence ->
    explode -> slice): map-only, zero shuffles, whole-stage codegen'd;
    chunk boundaries are token-index arithmetic so the op is
    embarrassingly parallel at any scale."""
    window, stride = 32, 24
    d = load_parallel(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        d.select("doc_id", F.explode(starts).alias("start"), "toks")
        .select(
            "doc_id",
            F.floor(F.col("start") / stride).cast("int").alias("chunk_idx"),
            F.slice(F.col("toks"), F.col("start") + 1, window).alias("chunk"),
        )
        .select(
            "doc_id", "chunk_idx",
            F.size("chunk").cast("int").alias("n_tokens"),
            F.array_join(F.col("chunk"), " ").alias("chunk_text"),
        )
    )


SQL_TEXT_CHUNK_OVERLAP = """
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
    SELECT doc_id, toks,
           unnest(range(0, greatest(len(toks) - 1, 0) + 1, 24)) AS start
    FROM d
),
c AS (
    SELECT doc_id, cast(floor(start / 24) AS integer) AS chunk_idx,
           list_slice(toks, start + 1, start + 32) AS chunk
    FROM s
)
SELECT doc_id, chunk_idx, cast(len(chunk) AS integer) AS n_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM c
"""


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Brin/Page; damping 0.85, 3 unrolled iterations) over the
    entity co-occurrence graph — graph centrality for KG entity salience.
    Each iteration is the canonical distributed shape: edges JOIN ranks on
    src, groupBy dst with an algebraic sum (map-side combined), so one
    shuffle per iteration keyed the same way. The edge list (near-dup-
    family-bounded, NOT corpus-sized) is persisted once; node count enters
    as a broadcast one-row relation, never a driver collect. The symmetric
    graph has no dangling nodes, so no leaked-mass correction term is
    needed. FP note: the per-dst sum is order-dependent float addition
    (same accepted 6dp-rounding risk class as rel_time_rollup)."""
    e = q_kg_cooccurrence(spark, sf_dir).select("surface_a", "surface_b")
    sym = (
        e.select(F.col("surface_a").alias("src"), F.col("surface_b").alias("dst"))
        .union(
            e.select(F.col("surface_b").alias("src"),
                     F.col("surface_a").alias("dst"))
        )
    )
    # deg is attached to the persisted edge relation ONCE (a window over
    # the src key — no second pass, no per-iteration deg join), and the
    # node set is the distinct window output's key set: each unrolled
    # iteration now costs exactly one join (ranks) + one aggregation,
    # instead of two joins + a recomputed distinct per rank rebuild
    # (r07: 3 joins + 3 distincts out of the plan). The contribution stays
    # sum(rank / deg) — identical float arithmetic to the two-join form.
    edges = persist_tracked(
        sym.withColumn(
            "deg",
            F.count("*").over(Window.partitionBy("src")).cast("long"),
        )
    )
    deg = edges.groupBy("src").agg(F.first("deg").alias("deg"))
    nodes = persist_tracked(deg.select(F.col("src").alias("node")))
    nstat = nodes.agg(F.count("*").cast("long").alias("n"))
    r = nodes.crossJoin(F.broadcast(nstat)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(3):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nstat))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (F.lit(0.15) / F.col("n")
                 + F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return r.join(deg, r["node"] == deg["src"]).select(
        "node", F.col("deg"), F.round("rank", 6).alias("rank")  # money: irrational
    )


SQL_KG_PAGERANK = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions),
pairs AS (
    -- DISTINCT: the Spark side's edge list is the aggregated co-occurrence
    -- relation (one edge per surface pair), not one edge per shared turn
    SELECT DISTINCT a.surface AS sa, b.surface AS sb
    FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    WHERE a.surface < b.surface
),
e AS (
    SELECT sa AS src, sb AS dst FROM pairs
    UNION ALL SELECT sb AS src, sa AS dst FROM pairs
),
deg AS (SELECT src, cast(count(*) AS bigint) AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e),
nst AS (SELECT cast(count(*) AS bigint) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nst),
c1 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r1 AS (
    SELECT nodes.node, 0.15 / n + 0.85 * coalesce(c1.c, 0) AS rank
    FROM nodes CROSS JOIN nst LEFT JOIN c1 ON c1.dst = nodes.node
),
c2 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r2 AS (
    SELECT nodes.node, 0.15 / n + 0.85 * coalesce(c2.c, 0) AS rank
    FROM nodes CROSS JOIN nst LEFT JOIN c2 ON c2.dst = nodes.node
),
c3 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r3 AS (
    SELECT nodes.node, 0.15 / n + 0.85 * coalesce(c3.c, 0) AS rank
    FROM nodes CROSS JOIN nst LEFT JOIN c3 ON c3.dst = nodes.node
)
SELECT r3.node, deg.deg, round(r3.rank, 6) AS rank
FROM r3 JOIN deg ON deg.src = r3.node
"""


def q_rel_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan; d=4 rows x w=512 cols)
    frequency estimation for event users, audited against exact counts on
    the top-10 heavy hitters. Sketch state is the (row, col) cell-count
    relation — bounded by d*w = 2048 rows regardless of corpus size, so
    it broadcasts; the probe is an explode + broadcast-join + min-agg.
    Integer-exact end to end (portable md5 hashing, no FP), and the CMS
    one-sided guarantee (est >= exact) is exposed as an overshoot column
    the gate verifies."""
    d_rows, w_cols = 4, 512
    ev = load(spark, sf_dir, "events").select("user_id").filter(
        F.col("user_id").isNotNull()
    )

    def pos(key_col, i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{i}:"), key_col.cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % w_cols
        )

    cells = (
        ev.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("row"),
                             pos(F.col("user_id"), i).alias("col"))
                    for i in range(d_rows)
                ])
            ).alias("rc")
        )
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("exact"))
    probes = exact.select(
        "user_id", "exact",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"),
                         pos(F.col("user_id"), i).alias("col"))
                for i in range(d_rows)
            ])
        ).alias("rc"),
    ).select("user_id", "exact", "rc.row", "rc.col")
    est = (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("user_id", "exact")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return (
        est.select(
            "user_id", "exact", "cms_est",
            (F.col("cms_est") - F.col("exact")).cast("long").alias("overshoot"),
        )
        .orderBy(F.col("exact").desc(), "user_id")
        .limit(10)
    )


SQL_REL_CMS_HEAVY_HITTERS = """
WITH ev AS (
    SELECT user_id FROM events WHERE user_id IS NOT NULL
),
pos AS (
    SELECT user_id, i AS row,
           cast(('0x' || substring(md5(concat('cms', i, ':',
                cast(user_id AS varchar))), 1, 8)) AS bigint) % 512 AS col
    FROM ev, unnest(range(0, 4)) AS u(i)
),
cells AS (
    SELECT row, col, cast(count(*) AS bigint) AS cnt
    FROM pos GROUP BY row, col
),
exact AS (
    SELECT user_id, cast(count(*) AS bigint) AS exact
    FROM ev GROUP BY user_id
),
probe AS (
    SELECT e.user_id, e.exact, i AS row,
           cast(('0x' || substring(md5(concat('cms', i, ':',
                cast(e.user_id AS varchar))), 1, 8)) AS bigint) % 512 AS col
    FROM exact e, unnest(range(0, 4)) AS u(i)
),
est AS (
    SELECT p.user_id, p.exact, cast(min(c.cnt) AS bigint) AS cms_est
    FROM probe p JOIN cells c USING (row, col)
    GROUP BY p.user_id, p.exact
)
SELECT user_id, exact, cms_est,
       cast(cms_est - exact AS bigint) AS overshoot
FROM est
ORDER BY exact DESC, user_id
LIMIT 10
"""


def q_rel_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge: apply a change batch to a dimension and emit
    versioned rows with [valid_from, valid_to) intervals and a current
    flag — the warehouse upsert. The change batch is derived
    deterministically (every 7th orderkey flips status 30 days later).
    Shape: union + ONE window pass per key ordered by effective time (no
    self-join); at 100 TB this is a single shuffle on the merge key, and
    the change batch unions in without touching base-table lineage twice.
    Times as epoch micros (longs); closed intervals use a -1 sentinel so
    no NULLs reach the hash compare."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("eff_us"),
    )
    changes = base.filter(F.col("key") % 7 == 0).select(
        "key", F.lit("R").alias("status"),
        (F.col("eff_us") + F.lit(30 * 86400 * 1_000_000).cast("long"))
        .alias("eff_us"),
    )
    ver = base.unionByName(changes)
    win = Window.partitionBy("key").orderBy("eff_us")
    nxt = F.lead("eff_us").over(win)
    return ver.select(
        "key", "status",
        F.col("eff_us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(-1).cast("long")).alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


SQL_REL_SCD2_MERGE = """
WITH base AS (
    SELECT o_orderkey AS key, o_orderstatus AS status,
           epoch_us(o_orderdate) AS eff_us
    FROM orders
),
changes AS (
    SELECT key, 'R' AS status,
           eff_us + 30 * 86400 * cast(1000000 AS bigint) AS eff_us
    FROM base WHERE key % 7 = 0
),
ver AS (
    SELECT * FROM base UNION ALL SELECT * FROM changes
)
SELECT key, status, eff_us AS valid_from_us,
       coalesce(lead(eff_us) OVER (PARTITION BY key ORDER BY eff_us),
                -1) AS valid_to_us,
       cast(CASE WHEN lead(eff_us) OVER (PARTITION BY key ORDER BY eff_us)
                 IS NULL THEN 1 ELSE 0 END AS integer) AS is_current
FROM ver
"""


def q_kg_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-alias resolution over the mention-surface vocabulary:
    candidate pairs share at least one token (the same blocking relation
    canonicalize.py's CC uses), then exact Levenshtein distance <= 6
    filters to plausible aliases. Classic ER blocking shape for 100 TB:
    the surface VOCABULARY (sublinear in corpus size) is what squares,
    and token blocking bounds the pair space to co-token families —
    never an all-pairs crossJoin over mentions. Levenshtein runs only on
    the surviving candidate pairs (both engines implement the classic
    Wagner-Fischer distance — integer-exact)."""
    nodes = exact_mentions_df(spark, sf_dir).select("surface").distinct()
    toks = nodes.select(
        "surface", F.explode(F.split("surface", " ")).alias("tok")
    )
    a = toks.select(F.col("surface").alias("surface_a"), "tok")
    b = toks.select(F.col("surface").alias("surface_b"), "tok")
    pairs = (
        a.join(b, "tok")
        .filter(F.col("surface_a") < F.col("surface_b"))
        .select("surface_a", "surface_b")
        .distinct()
    )
    return pairs.select(
        "surface_a", "surface_b",
        F.levenshtein("surface_a", "surface_b").cast("int").alias("dist"),
    ).filter(F.col("dist") <= 6)


SQL_KG_ENTITY_RESOLUTION = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
nodes AS (SELECT DISTINCT surface FROM mentions),
sur_toks AS (
    SELECT surface, unnest(string_split(surface, ' ')) AS tok FROM nodes
),
pairs AS (
    SELECT DISTINCT a.surface AS surface_a, b.surface AS surface_b
    FROM sur_toks a JOIN sur_toks b USING (tok)
    WHERE a.surface < b.surface
)
SELECT surface_a, surface_b,
       cast(levenshtein(surface_a, surface_b) AS integer) AS dist
FROM pairs
WHERE levenshtein(surface_a, surface_b) <= 6
"""


def _triangle_counts(p: DataFrame) -> DataFrame:
    """(node, n_triangles) from a canonically-oriented (surface_a <
    surface_b) DISTINCT pair relation via the two-join wedge closure —
    each triangle enumerated exactly once. Pass an already-persisted
    relation: all three join legs read it. Shared by q_kg_triangles and
    q_kg_clustering_coeff (r06 review: the closure lived in two copies
    that would drift — e.g. the planned degree-based orientation for
    skewed graphs must land in one place)."""
    xy = p.select(F.col("surface_a").alias("a"), F.col("surface_b").alias("b"))
    yz = p.select(F.col("surface_a").alias("b"), F.col("surface_b").alias("c"))
    xz = p.select(F.col("surface_a").alias("a"), F.col("surface_b").alias("c"))
    return (
        xy.join(yz, "b")
        .join(xz, ["a", "c"])
        .select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation counts on the co-occurrence graph
    — the clustering-structure primitive (community density, spam-graph
    detection). Edges are canonically oriented (a < b) so each triangle
    is enumerated exactly once by the two-join wedge closure; the edge
    list is persisted once and reused by all three join legs. At 100 TB
    graph scale the same plan applies with DEGREE-based orientation
    (orient toward the higher-degree endpoint, hash tie-break) to bound
    per-vertex wedge fan-out on skewed graphs; lexicographic orientation
    is the deterministic fixture-scale stand-in."""
    p = persist_tracked(
        q_kg_cooccurrence(spark, sf_dir).select("surface_a", "surface_b")
    )
    return _triangle_counts(p)


SQL_KG_TRIANGLES = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions),
p AS (
    SELECT DISTINCT a.surface AS sa, b.surface AS sb
    FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    WHERE a.surface < b.surface
),
tri AS (
    SELECT xy.sa AS a, xy.sb AS b, yz.sb AS c
    FROM p xy
    JOIN p yz ON yz.sa = xy.sb
    JOIN p xz ON xz.sa = xy.sa AND xz.sb = yz.sb
),
n AS (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT node, cast(count(*) AS bigint) AS n_triangles
FROM n GROUP BY node
"""


def q_text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): priority = ln(u)/w with u an md5-derived uniform and
    w the document token count, take the top 20 priorities — longer
    documents proportionally more likely, yet fully reproducible and
    engine-portable. Map-only until the TakeOrdered top-k (O(log k) heap
    per partition, no global sort): the content-stable-hash analogue of
    text_stratified_sample, but weight-proportional instead of uniform.
    Priorities are rounded to 6dp BEFORE ordering so both engines select
    the same rows (ulp-level ln/pow divergence cannot flip the
    comparator; ties break by doc_id)."""
    d = load_parallel(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("double")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
                    1, 8),
        16, 10,
    ).cast("long")
    u = (v + 0.5) / F.lit(4294967296.0)
    pri = F.round(F.log(u) / w, 6)  # money: irrational
    return (
        d.select(
            "doc_id", w.cast("int").alias("n_tokens"), pri.alias("priority")
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(20)
    )


SQL_TEXT_WEIGHTED_SAMPLE = """
WITH d AS (
    SELECT doc_id,
           cast(len(string_split(text, ' ')) AS integer) AS n_tokens,
           (cast(('0x' || substring(md5(concat('ws:',
                cast(doc_id AS varchar))), 1, 8)) AS bigint) + 0.5)
             / 4294967296.0 AS u
    FROM documents
)
SELECT doc_id, n_tokens,
       round(ln(u) / cast(n_tokens AS double), 6) AS priority
FROM d
ORDER BY priority DESC, doc_id
LIMIT 20
"""


def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per term, document frequency, total
    term frequency, and a BOUNDED postings sample (first 16 doc_ids,
    sorted) — the IR index-build materialization. One shuffle on the term
    key with map-side-combined counts; the postings list is capped with
    slice() AFTER array_sort so no term's row grows with corpus size (the
    full postings would live as the (term -> doc) relation itself at 100
    TB — the capped sample is the browsable index surface)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    per_doc = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    return per_doc.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.array_join(
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, 16), ","
        ).alias("postings_head"),
    )


SQL_TEXT_INVERTED_INDEX = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
per_doc AS (
    SELECT term, doc_id, cast(count(*) AS bigint) AS tf
    FROM toks GROUP BY term, doc_id
)
SELECT term, cast(count(*) AS bigint) AS df,
       cast(sum(tf) AS bigint) AS total_tf,
       array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 16),
                       ',') AS postings_head
FROM per_doc GROUP BY term
"""


def q_kg_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for community
    detection on the co-occurrence graph: every node starts as its own
    label; each of 2 unrolled rounds adopts the most frequent label among
    neighbors (ties -> lexicographically smallest, making the usually
    nondeterministic LPA fully deterministic and engine-portable). Per
    round: one edges-join-labels shuffle + one (node, label) count + one
    argmax window — the distributed LPA shape. Complements CC (connectivity)
    and PageRank (centrality) with density-based communities."""
    e = q_kg_cooccurrence(spark, sf_dir).select("surface_a", "surface_b")
    edges = persist_tracked(
        e.select(F.col("surface_a").alias("src"), F.col("surface_b").alias("dst"))
        .union(e.select(F.col("surface_b").alias("src"),
                        F.col("surface_a").alias("dst")))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(2):
        counted = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("n"))
        )
        win = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("label")
        )
        labels = (
            counted.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") == 1)
            .select("node", "label")
        )
    return labels


SQL_KG_LABEL_PROPAGATION = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions),
pairs AS (
    SELECT DISTINCT a.surface AS sa, b.surface AS sb
    FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    WHERE a.surface < b.surface
),
e AS (
    SELECT sa AS src, sb AS dst FROM pairs
    UNION ALL SELECT sb AS src, sa AS dst FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
c1 AS (
    SELECT e.dst AS node, l.label, count(*) AS n
    FROM e JOIN l0 l ON l.node = e.src
    GROUP BY e.dst, l.label
),
l1 AS (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY n DESC, label) AS rnk
        FROM c1
    ) WHERE rnk = 1
),
c2 AS (
    SELECT e.dst AS node, l.label, count(*) AS n
    FROM e JOIN l1 l ON l.node = e.src
    GROUP BY e.dst, l.label
),
l2 AS (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY n DESC, label) AS rnk
        FROM c2
    ) WHERE rnk = 1
)
SELECT node, label FROM l2
"""


def q_rel_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-frame window aggregates: per customer, order history in
    time order with a running total and a trailing 3-order moving average
    — the ROWS BETWEEN frame family (cumulative + bounded-preceding), one
    shuffle on the partition key.

    INTEGER-EXACT outputs (the r04 red-row fix): `cum_cents` is the raw
    bigint frame sum, and the trailing average is HALF_UP-rounded to
    integer cents with pure integer math — floor((2*sum + cnt)/(2*cnt)).
    The previous form rounded sum/(cnt*100.0) to 2dp, and a count=2 frame
    with an odd cents sum lands on an exact half-cent (e.g. 134279.985)
    where Spark's HALF_UP on the shortest-decimal repr (-> .99) and
    DuckDB's binary-double rounding (134279.98499.. -> .98) disagree —
    30/15,000 rows diverged at sf0.01. Never round a half-representable
    double; emit scaled integers instead."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ous"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
    )
    win = Window.partitionBy("custkey").orderBy("ous", "orderkey")
    cum = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trail = win.rowsBetween(-2, Window.currentRow)
    base = o.select(
        "custkey", "orderkey",
        F.row_number().over(win).cast("int").alias("order_seq"),
        F.sum("cents").over(cum).cast("long").alias("cum_cents"),
        F.sum("cents").over(trail).cast("long").alias("_s3"),
        F.count("*").over(trail).cast("long").alias("_c3"),
    )
    # integer HALF_UP: round-half-up(s/c) with s already at cents scale,
    # so scale=1 — bigint `div` keeps it exact past 2^53
    return base.select(
        "custkey", "orderkey", "order_seq", "cum_cents",
        half_up_scaled("_s3", "_c3", 1).alias("trailing3_avg_cents"),
    )


SQL_REL_ROLLING_SPEND = """
WITH o AS (
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           epoch_us(o_orderdate) AS ous,
           cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS cents
    FROM orders
)
SELECT custkey, orderkey,
       cast(row_number() OVER w AS integer) AS order_seq,
       cast(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS bigint) AS cum_cents,
       cast((2 * sum(cents) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             + count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
            // (2 * count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
            AS bigint) AS trailing3_avg_cents
FROM o
WINDOW w AS (PARTITION BY custkey ORDER BY ous, orderkey)
"""


def q_text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy (mean token surprisal in nats)
    against the corpus's own unigram distribution — the CCNet-style
    LM-based quality signal: boilerplate scores low, rare-token noise
    scores high. The unigram model is vocabulary-bounded (broadcast);
    the corpus streams once to build it and once to score — at 100 TB
    the model side stays a dictionary-sized table. Scoring is one
    broadcast join + an algebraic per-doc mean (map-side combined).
    Output rounded to 6dp (ln precedent: rel_lpc_distinct)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = persist_tracked(
        d.select("doc_id", F.explode(F.split(F.col("text"), " "))
                 .alias("tok"))
    )
    total = toks.agg(F.count("*").cast("long").alias("n_total"))
    uni = (
        toks.groupBy("tok").agg(F.count("*").cast("long").alias("n_tok"))
        .crossJoin(F.broadcast(total))
    )
    lp = F.log(F.col("n_tok") / F.col("n_total"))
    model = uni.select("tok", lp.alias("logp"))
    return (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.round(-F.avg("logp"), 6).alias("surprisal_nats"),  # money: irrational
        )
    )


SQL_TEXT_UNIGRAM_SURPRISAL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
total AS (SELECT cast(count(*) AS bigint) AS n_total FROM toks),
model AS (
    SELECT tok, ln(count(*) / (SELECT n_total FROM total)) AS logp
    FROM toks GROUP BY tok
)
SELECT t.doc_id, cast(count(*) AS integer) AS n_tokens,
       round(-avg(m.logp), 6) AS surprisal_nats
FROM toks t JOIN model m USING (tok)
GROUP BY t.doc_id
"""


def q_rel_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (10-minute windows sliding every 5):
    the batch twin of the streaming windowed aggregate — each event lands
    in exactly window_len/hop consecutive windows, enumerated in-row with
    sequence+explode (bounded 2x fan-out, no self-join, one shuffle on
    the window key). Value totals as scaled-integer cents (the
    rel_time_rollup discipline)."""
    win_us = 600 * 1_000_000
    hop_us = 300 * 1_000_000
    e = load(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.col("event_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
    )
    # window starts covering tus: the hop multiples in
    # (tus - win, tus] -> exactly win/hop = 2 consecutive hops
    first = (F.floor((F.col("tus") - win_us) / hop_us) + 1).cast("long")
    last = F.floor(F.col("tus") / hop_us).cast("long")
    return (
        e.select(
            "event_type", "cents",
            F.explode(F.sequence(first, last)).alias("hop"),
        )
        .groupBy((F.col("hop") * hop_us).alias("window_start_us"),
                 "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_value"),  # money: grid
        )
    )


SQL_REL_EVENTS_HOPPING = """
WITH e AS (
    SELECT epoch_us(ts) AS tus, event_type,
           cast(floor(value * 100 + 0.5) AS bigint) AS cents
    FROM events
),
hops AS (
    SELECT event_type, cents,
           unnest(range(cast(floor((tus - 600000000) / 300000000) + 1 AS bigint),
                        cast(floor(tus / 300000000) AS bigint) + 1)) AS hop
    FROM e
)
SELECT hop * 300000000 AS window_start_us, event_type,
       cast(count(*) AS bigint) AS n_events,
       round(sum(cents) / 100.0, 2) AS total_value
FROM hops
GROUP BY 1, 2
"""


def q_rel_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint audit (the dbt-test /
    Deequ-style gate a pipeline runs before publishing a table): one row
    per constraint with its violation count — key uniqueness, not-null,
    referential integrity (orders.custkey -> customer), domain membership
    (order status in its enum), and a range rule (non-negative price).
    Each check is an independent aggregate over one scan (the FK check is
    a broadcast-able anti-join); a real deployment unions exactly this
    shape per table. Integer-exact everywhere."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dup_keys = (
        o.groupBy("o_orderkey").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("v"))
        .select(F.lit("orders.o_orderkey unique").alias("constraint"), "v")
    )
    null_cust = o.agg(
        F.count_if(F.col("o_custkey").isNull()).cast("long").alias("v")
    ).select(F.lit("orders.o_custkey not_null").alias("constraint"), "v")
    fk = (
        o.join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"],
               "left_anti")
        .agg(F.count("*").cast("long").alias("v"))
        .select(F.lit("orders.o_custkey -> customer.c_custkey").alias(
            "constraint"), "v")
    )
    domain = o.agg(
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P"))
        .cast("long").alias("v")
    ).select(F.lit("orders.o_orderstatus in (O,F,P)").alias("constraint"),
             "v")
    rng = o.agg(
        F.count_if(F.col("o_totalprice") < 0).cast("long").alias("v")
    ).select(F.lit("orders.o_totalprice >= 0").alias("constraint"), "v")
    return (
        dup_keys.unionByName(null_cust).unionByName(fk)
        .unionByName(domain).unionByName(rng)
        .select("constraint", F.col("v").alias("violations"))
    )


SQL_REL_CONSTRAINT_CHECK = """
SELECT 'orders.o_orderkey unique' AS constraint,
       cast(coalesce(sum(n), 0) AS bigint) AS violations
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders.o_custkey not_null',
       cast(count(*) FILTER (WHERE o_custkey IS NULL) AS bigint)
FROM orders
UNION ALL
SELECT 'orders.o_custkey -> customer.c_custkey',
       cast(count(*) AS bigint)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'orders.o_orderstatus in (O,F,P)',
       cast(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
            AS bigint)
FROM orders
UNION ALL
SELECT 'orders.o_totalprice >= 0',
       cast(count(*) FILTER (WHERE o_totalprice < 0) AS bigint)
FROM orders
"""


def q_rel_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level table profiling (the schema-audit summary a catalog
    shows): per profiled orders column — row count, null count, distinct
    count, and min/max rendered as strings so heterogeneous column types
    share one schema. ONE scan for all columns: every per-column measure
    is an aggregate of the same pass (map-side combined; the exact
    countDistincts expand to one aggregation, not extra scans), and the
    wide one-row result unpivots with stack(). rel_lpc_distinct is the
    bounded-sketch alternative at extreme cardinality."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count_if(col.isNull()).cast("long").alias(f"{c}__null"),
            F.countDistinct(col).cast("long").alias(f"{c}__nd"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(`column`, n_null, n_distinct, min_str, max_str)"
        ),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_str",
             "max_str")


SQL_REL_PROFILE_COLUMNS = """
SELECT 'o_orderkey' AS "column", cast(count(*) AS bigint) AS n_rows,
       cast(count(*) FILTER (WHERE o_orderkey IS NULL) AS bigint) AS n_null,
       cast(count(DISTINCT o_orderkey) AS bigint) AS n_distinct,
       cast(min(o_orderkey) AS varchar) AS min_str,
       cast(max(o_orderkey) AS varchar) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', cast(count(*) AS bigint),
       cast(count(*) FILTER (WHERE o_custkey IS NULL) AS bigint),
       cast(count(DISTINCT o_custkey) AS bigint),
       cast(min(o_custkey) AS varchar), cast(max(o_custkey) AS varchar)
FROM orders
UNION ALL
SELECT 'o_orderstatus', cast(count(*) AS bigint),
       cast(count(*) FILTER (WHERE o_orderstatus IS NULL) AS bigint),
       cast(count(DISTINCT o_orderstatus) AS bigint),
       cast(min(o_orderstatus) AS varchar), cast(max(o_orderstatus) AS varchar)
FROM orders
UNION ALL
SELECT 'o_orderpriority', cast(count(*) AS bigint),
       cast(count(*) FILTER (WHERE o_orderpriority IS NULL) AS bigint),
       cast(count(DISTINCT o_orderpriority) AS bigint),
       cast(min(o_orderpriority) AS varchar), cast(max(o_orderpriority) AS varchar)
FROM orders
"""




# ---------------------------------------------------------------------------
# round-5 wave: graph analytics (PMI, common-neighbor similarity, k-core,
# degree profile), transcript hygiene, TF-IDF retrieval, Zipf profiling,
# relational coverage (cube, skyline, cohort retention), vector range search
# ---------------------------------------------------------------------------


def q_kg_entity_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between co-mentioned entities — the
    association strength behind distributional KG edge weighting:
    pmi(a,b) = ln(P(a,b) / (P(a) P(b))) over per-turn mention events.

    Scale shape: the per-turn distinct mention relation is persisted once
    and feeds three aggregations (pair counts via in-row explosion — no
    self-join; per-surface turn counts — vocabulary-bounded, broadcast;
    the turn total — one broadcast row). The double expression is built
    structurally identically in both engines so ln/round agree."""
    from .caching import persist_tracked

    m = persist_tracked(
        exact_mentions_df(spark, sf_dir)
        .select("conv_id", "turn_idx", "surface").distinct()
    )
    per_turn = m.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_list("surface")).alias("ss")
    )
    pairs = (
        per_turn.select(F.explode("ss").alias("sa"), F.col("ss"))
        .select("sa", F.explode("ss").alias("sb"))
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("n_ab"))
    )
    counts = m.groupBy("surface").agg(F.count("*").alias("n_s"))
    total = (
        m.select("conv_id", "turn_idx").distinct()
        .agg(F.count("*").cast("long").alias("n_turns"))
    )
    ca = counts.select(F.col("surface").alias("sa"),
                       F.col("n_s").alias("n_a"))
    cb = counts.select(F.col("surface").alias("sb"),
                       F.col("n_s").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "sa")
        .join(F.broadcast(cb), "sb")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("sa").alias("surface_a"),
            F.col("sb").alias("surface_b"),
            "n_ab",
            F.round(  # money: irrational
                F.log(F.col("n_ab").cast("double") * F.col("n_turns")
                      / (F.col("n_a") * F.col("n_b").cast("double"))), 6
            ).alias("pmi"),
        )
    )


SQL_KG_ENTITY_PMI = f"""
WITH {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions),
pairs AS (
    SELECT a.surface AS sa, b.surface AS sb, count(*) AS n_ab
    FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    WHERE a.surface < b.surface
    GROUP BY a.surface, b.surface
),
counts AS (SELECT surface, count(*) AS n_s FROM m GROUP BY surface),
total AS (SELECT count(*) AS n_turns
          FROM (SELECT DISTINCT conv_id, turn_idx FROM m))
SELECT sa AS surface_a, sb AS surface_b, n_ab,
       round(ln(cast(n_ab AS double) * n_turns
                / (ca.n_s * cast(cb.n_s AS double))), 6) AS pmi
FROM pairs
JOIN counts ca ON ca.surface = sa
JOIN counts cb ON cb.surface = sb, total
"""


def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized distinct co-occurrence edge list (src, dst) — shared
    base of the round-5 graph ops. Vocabulary-bounded (surface pairs),
    sublinear in corpus size."""
    pairs = q_kg_cooccurrence(spark, sf_dir).select("surface_a", "surface_b")
    return (
        pairs.select(F.col("surface_a").alias("src"),
                     F.col("surface_b").alias("dst"))
        .union(pairs.select(F.col("surface_b").alias("src"),
                            F.col("surface_a").alias("dst")))
        .distinct()
    )


_COOC_EDGES_CTE = f"""
{TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions),
cpairs AS (
    SELECT DISTINCT a.surface AS sa, b.surface AS sb
    FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    WHERE a.surface < b.surface
),
edges AS (
    SELECT sa AS src, sb AS dst FROM cpairs
    UNION SELECT sb AS src, sa AS dst FROM cpairs
)
"""


def q_kg_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction scores on the entity graph: for every node pair
    sharing >= 1 neighbor, the common-neighbor count and neighborhood
    Jaccard |N(a) n N(b)| / |N(a) u N(b)| — the classic wedge-join
    formulation (one equi-join through the shared neighbor, never an
    all-pairs product). The edge list is persisted (wedge + two degree
    consumers); degrees are vocabulary-bounded and broadcast."""
    from .caching import persist_tracked

    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    wedge = (
        edges.select(F.col("dst").alias("n"), F.col("src").alias("a"))
        .join(edges.select(F.col("dst").alias("n"),
                           F.col("src").alias("b")), "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("db"))
    return (
        wedge.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("surface_a"), F.col("b").alias("surface_b"),
            "n_common",
            # integer HALF_UP ppm then exact /1e6 (r06 money sweep): the
            # rational n_common/union can sit exactly on a 6dp half
            (half_up_scaled("n_common", "da + db - n_common", 1_000_000)
             / F.lit(1000000.0)).alias("nb_jaccard"),
        )
    )


SQL_KG_COMMON_NEIGHBORS = f"""
WITH {_COOC_EDGES_CTE},
wedge AS (
    SELECT e1.src AS a, e2.src AS b, count(*) AS n_common
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.dst
    WHERE e1.src < e2.src
    GROUP BY e1.src, e2.src
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
SELECT a AS surface_a, b AS surface_b, n_common,
       ((2 * 1000000 * n_common + (da.deg + db.deg - n_common))
        // (2 * (da.deg + db.deg - n_common))) / 1000000.0 AS nb_jaccard
FROM wedge
JOIN deg da ON da.src = a
JOIN deg db ON db.src = b
"""


def q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (k=2, two rounds, unrolled): nodes
    surviving two rounds of remove-degree-below-k, with their induced
    degree after the second peel. Each round is one degree aggregation +
    two semi-joins against the (vocabulary-bounded, broadcast) survivor
    set; production fixpoint = loop the same round until no node drops
    (O(peel depth) rounds, same per-round plan). The edge list is
    persisted across rounds."""
    from .caching import persist_tracked

    k = 2
    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    deg0 = edges.groupBy("src").agg(F.count("*").alias("deg"))
    surv1 = deg0.filter(F.col("deg") >= k).select("src")
    e1 = (
        edges.join(F.broadcast(surv1), "src", "left_semi")
        .join(F.broadcast(surv1.withColumnRenamed("src", "dst")),
              "dst", "left_semi")
    )
    deg1 = e1.groupBy("src").agg(F.count("*").alias("core_deg"))
    return (
        deg1.filter(F.col("core_deg") >= k)
        .select(F.col("src").alias("node"),
                F.col("core_deg").cast("int").alias("core_deg"))
    )


SQL_KG_KCORE = f"""
WITH {_COOC_EDGES_CTE},
deg0 AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
surv1 AS (SELECT src FROM deg0 WHERE deg >= 2),
e1 AS (
    SELECT e.src, e.dst FROM edges e
    WHERE e.src IN (SELECT src FROM surv1)
      AND e.dst IN (SELECT src FROM surv1)
),
deg1 AS (SELECT src, count(*) AS core_deg FROM e1 GROUP BY src)
SELECT src AS node, cast(core_deg AS integer) AS core_deg
FROM deg1 WHERE core_deg >= 2
"""


def q_kg_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profile: entity-degree histogram (degree -> node count) of
    the co-occurrence graph — the first sanity read on any KG build. Two
    algebraic aggregations, both map-side combined."""
    edges = _cooc_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return (
        deg.groupBy("deg").agg(F.count("*").cast("int").alias("n_nodes"))
        .select(F.col("deg").cast("int").alias("degree"), "n_nodes")
    )


SQL_KG_DEGREE_HIST = f"""
WITH {_COOC_EDGES_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
SELECT cast(deg AS integer) AS degree, cast(count(*) AS integer) AS n_nodes
FROM deg GROUP BY deg
"""


def q_kg_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation repeated-turn hygiene: for every distinct turn
    text keep the earliest (conv_id, turn_idx) occurrence and report per
    conversation how many turns survive — boilerplate turns (canned
    greetings, templated tool output) collapse to one retained copy.
    One shuffle on the text key (the window) + one on conv_id; at 100 TB
    the text key would be md5'd first (same plan, narrower shuffle)."""
    t = transcripts_df(spark, sf_dir)
    w = Window.partitionBy("text").orderBy("conv_id", "turn_idx")
    return (
        t.withColumn("rnk", F.row_number().over(w))
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).cast("int")
            .alias("n_kept"),
        )
    )


SQL_KG_TURN_DEDUP = f"""
WITH {TRANSCRIPTS_CTE},
r AS (
    SELECT conv_id,
           row_number() OVER (PARTITION BY text
                              ORDER BY conv_id, turn_idx) AS rnk
    FROM transcripts
)
SELECT conv_id, cast(count(*) AS integer) AS n_turns,
       cast(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS integer) AS n_kept
FROM r GROUP BY conv_id
"""


def q_rel_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE coverage (all four grouping sets of status x priority) with
    explicit grouping flags — the OLAP summary complement to the ROLLUP
    query. Cents are integer-summed (money discipline)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "g_status", "g_priority", "n_orders", "total_cents",
        )
    )


SQL_REL_CUBE_ORDERS = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       cast(GROUPING(o_orderstatus) AS integer) AS g_status,
       cast(GROUPING(o_orderpriority) AS integer) AS g_priority,
       count(*) AS n_orders,
       cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint)
           AS total_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_rel_order_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): days whose best order price beats
    every earlier day's — maximize price, minimize date. The per-day
    pre-aggregation shrinks the input to a calendar-bounded relation, so
    the running-max window's single ordered pass is over days, not
    orders (the per-day max is algebraic and map-side combined); the
    frontier is rows strictly above the prefix running max. Integer
    cents/days only."""
    o = load(spark, sf_dir, "orders").select(
        F.floor(F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86_400_000_000)).cast("long").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
    )
    daily = o.groupBy("day").agg(F.max("cents").alias("best_cents"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return (
        daily.withColumn("prev_max", F.max("best_cents").over(w))
        .filter(F.col("prev_max").isNull()
                | (F.col("best_cents") > F.col("prev_max")))
        .select("day", "best_cents")
    )


SQL_REL_ORDER_SKYLINE = """
WITH o AS (
    SELECT cast(floor(epoch_us(o_orderdate) / 86400000000) AS bigint) AS day,
           cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS cents
    FROM orders
),
daily AS (SELECT day, max(cents) AS best_cents FROM o GROUP BY day),
r AS (
    SELECT day, best_cents,
           max(best_cents) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_max
    FROM daily
)
SELECT day, best_cents FROM r
WHERE prev_max IS NULL OR best_cents > prev_max
"""


def q_rel_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted at
    each day offset they return — the product-analytics staple next to
    the funnel. Per-user first day is one aggregation; the join back is
    on the same user_id key (co-partitioned with the groupBy before it);
    the (cohort, offset) matrix is calendar-bounded. Deliberately NOT
    broadcast-hinted: user count is unbounded (same reasoning as the
    funnel stages) — AQE may pick broadcast when it is actually small."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .select("user_id", "cohort_day",
                (F.col("day") - F.col("cohort_day")).alias("offset_days"))
        .distinct()
        .groupBy("cohort_day", "offset_days")
        .agg(F.count("*").cast("int").alias("n_users"))
    )


SQL_REL_EVENTS_RETENTION = """
WITH e AS (
    SELECT user_id,
           cast(floor(epoch_us(ts) / 86400000000) AS bigint) AS day
    FROM events
),
f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
d AS (
    SELECT DISTINCT e.user_id, cohort_day,
           e.day - cohort_day AS offset_days
    FROM e JOIN f USING (user_id)
)
SELECT cohort_day, offset_days, cast(count(*) AS integer) AS n_users
FROM d GROUP BY cohort_day, offset_days
"""


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (first 20 docs): the second
    retrieval scorer next to BM25, sharing its scale shape — document
    frequencies are vocabulary-bounded (broadcast), the corpus size is
    one broadcast row, term frequencies for the QUERY docs are filtered
    before any join. Smoothed idf = ln((N+1)/(df+1))."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfr = tf.groupBy("tok").agg(F.count("*").alias("df"))
    total = d.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 20)
        .join(F.broadcast(dfr), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", "tok",
            F.round(  # money: irrational
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("int").alias("rnk"),
                F.col("tok").alias("term"), "tfidf")
    )


SQL_TEXT_TFIDF_TOPK = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
total AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, tok,
           round(tf * ln((n_docs + 1) / (df + 1.0)), 6) AS tfidf
    FROM tf JOIN dfr USING (tok), total
    WHERE doc_id < 20
),
r AS (
    SELECT doc_id, tok, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, tok) AS rnk
    FROM scored
)
SELECT doc_id, cast(rnk AS integer) AS rnk, tok AS term, tfidf
FROM r WHERE rnk <= 3
"""


def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile: least-squares slope of ln(freq) on ln(rank) over the
    corpus token-frequency table — natural text sits near -1; synthetic
    or templated corpora flatten. The frequency relation is
    vocabulary-bounded, so the single-partition rank window and the
    final one-row reduction are dictionary-sized regardless of corpus
    scale (the corpus itself is reduced map-side by the first count)."""
    d = load_parallel(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "tok")
    xy = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        F.col("k").cast("int").alias("n_terms"),
        F.round(  # money: irrational
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")), 6
        ).alias("zipf_slope"),
    )


SQL_TEXT_ZIPF_SLOPE = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
xy AS (
    SELECT ln(cast(row_number() OVER (ORDER BY n DESC, tok) AS double)) AS x,
           ln(cast(n AS double)) AS y
    FROM freq
),
agg AS (
    SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx
    FROM xy
)
SELECT cast(k AS integer) AS n_terms,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope
FROM agg
"""


def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: every vector within cosine >= 0.2 of the query
    vector (vec_id 0) — the radius-query complement to top-k. The single
    query row is broadcast and the corpus streams through one map stage
    (dot + norms in-row); no shuffle at all, any corpus size."""
    from .similarity import with_cosine

    e = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    scored = with_cosine(
        e.crossJoin(F.broadcast(q)).filter(
            F.col("vec_id") != F.col("query_id")
        )
    )
    # zero-norm guard: 0/0 is NaN in Spark (and NaN compares GREATER
    # than any number in Spark's ordering, so it would pass the
    # threshold) but NULL in DuckDB (dropped) — drop it on both engines
    return (
        scored.filter(~F.isnan("cosine")
                      & (F.round(F.col("cosine"), 6) >= 0.2))  # money: irrational
        .select("query_id", "vec_id",
                F.round("cosine", 6).alias("cosine"))  # money: irrational
    )


SQL_SIM_RANGE_SEARCH = """
WITH pairs AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           cast(unnest(q.embedding) AS double) AS a,
           cast(unnest(e.embedding) AS double) AS b
    FROM embeddings q, embeddings e
    WHERE q.vec_id = 0 AND e.vec_id <> 0
),
scored AS (
    SELECT query_id, vec_id,
           sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS cosine
    FROM pairs GROUP BY query_id, vec_id
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine
FROM scored WHERE round(cosine, 6) >= 0.2
"""



def q_kg_triple_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple support scoring: evidence counts per (subj, has_type, obj)
    triple — total supporting mentions and distinct conversations — the
    confidence signal a KG consumer ranks assertions by. Composes the
    triples chain and aggregates on the (entity x type)-bounded key set;
    the distinct-conv count is exact (count distinct inside the same
    grouped aggregation, one shuffle)."""
    t = q_kg_triples_exact(spark, sf_dir).filter(
        F.col("pred") == "has_type"
    )
    return t.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("support"),
        F.countDistinct("conv_id").cast("int").alias("n_convs"),
    )


SQL_KG_TRIPLE_SUPPORT = f"""
WITH RECURSIVE {TRANSCRIPTS_CTE}, {_EXACT_MENTIONS_CTE}, {_CC_CTES},
linked AS (
    SELECT m.*, concat('ent:', c.component) AS subj
    FROM mentions m JOIN components c USING (surface)
),
t AS (
    SELECT subj, 'has_type' AS pred,
           unnest(string_split(entity_type, ',')) AS obj, conv_id
    FROM linked
)
SELECT subj, pred, obj, count(*) AS support,
       cast(count(DISTINCT conv_id) AS integer) AS n_convs
FROM t GROUP BY subj, pred, obj
"""


def q_text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granularity duplication signal (the Lee et al. '22
    "Deduplicating Training Data" shape, window-hash approximation of
    the suffix-array pass): per document, the fraction of its 8-token
    windows that also occur in ANOTHER document. Plan: positional
    (non-distinct) windows stream once; the distinct-doc window
    frequency is one aggregation over the window vocabulary; the join
    back is SHUFFLE_HASH on the window key (both sides corpus-growing —
    never a broadcast build, the r04 scale-bug class); per-doc fractions
    are one algebraic aggregation. The positional window relation is
    PERSISTED: it feeds both the distinct-doc frequency aggregation and
    the join probe, and without the persist the scan + 8-gram explosion
    (the query's largest intermediate) runs twice."""
    from .caching import persist_tracked
    from .dedup import shingles_df

    d = load_parallel(spark, sf_dir, "documents")
    win = persist_tracked(shingles_df(d, n=8, distinct=False))
    dfr = (
        win.distinct()
        .groupBy("shingle")
        .agg(F.count("*").alias("docs_with"))
    )
    return (
        win.join(dfr.hint("shuffle_hash"), "shingle")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_windows"),
            F.sum(F.when(F.col("docs_with") >= 2, 1).otherwise(0))
            .cast("int").alias("n_dup_windows"),
        )
        .select(
            F.col("id").alias("doc_id"), "n_windows", "n_dup_windows",
            # integer HALF_UP ppm then exact /1e6 (r06 money sweep):
            # n_dup/n_windows can sit exactly on a 6dp half (e.g.
            # n_windows = 128, n_dup odd)
            (half_up_scaled("n_dup_windows", "n_windows", 1_000_000)
             / F.lit(1000000.0)).alias("dup_fraction"),
        )
    )


SQL_TEXT_SUBSTRING_DEDUP = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
win AS (
    SELECT doc_id,
           concat_ws(' ', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                     lead(tok, 3) OVER w, lead(tok, 4) OVER w,
                     lead(tok, 5) OVER w, lead(tok, 6) OVER w,
                     lead(tok, 7) OVER w) AS sh,
           lead(tok, 7) OVER w AS t8
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
w2 AS (SELECT doc_id, sh FROM win WHERE t8 IS NOT NULL),
dfr AS (
    SELECT sh, count(DISTINCT doc_id) AS docs_with FROM w2 GROUP BY sh
)
SELECT doc_id, cast(count(*) AS integer) AS n_windows,
       cast(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS integer)
           AS n_dup_windows,
       ((2 * 1000000 * sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END)
         + count(*)) // (2 * count(*))) / 1000000.0 AS dup_fraction
FROM w2 JOIN dfr USING (sh)
GROUP BY doc_id
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the fingerprint-clustering prep
    step): strip non-ASCII, lowercase, strip non-alphanumerics to
    spaces, collapse runs, trim — then a stable md5 fingerprint of the
    canonical form. Pure map stage, zero shuffle; idempotent on
    already-clean text.

    The ASCII pre-strip runs BEFORE lower(): Java's full case mapping
    (Spark) and DuckDB's simple mapping diverge on characters like
    U+0130 (Spark lowers it to 'i' + combining dot), so lowering may
    only ever see ASCII — the same ASCII-only case-folding discipline
    the reference tagger pins (CLAUDE.md)."""
    d = load_parallel(spark, sf_dir, "documents")
    ascii_only = F.regexp_replace(F.col("text"), "[^ -~]", " ")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(ascii_only), "[^a-z0-9 ]", " "),
            " +", " ",
        )
    )
    return d.select(
        "doc_id",
        F.length(norm).cast("int").alias("norm_len"),
        F.md5(norm).alias("norm_fingerprint"),
    )


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       cast(length(trim(regexp_replace(
           regexp_replace(lower(regexp_replace(text, '[^ -~]', ' ', 'g')),
                          '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g'))) AS integer) AS norm_len,
       md5(trim(regexp_replace(
           regexp_replace(lower(regexp_replace(text, '[^ -~]', ' ', 'g')),
                          '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g'))) AS norm_fingerprint
FROM documents
"""



def q_text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights per source domain (the DoReMi-lite prep
    step): each source's token share and the resampling weight that
    would equalize shares (target = uniform across sources). One
    aggregation keyed by source; corpus totals are one broadcast row.
    Outputs are integer HALF_UP parts-per-million / e6-scaled weights
    ((2*10^6*num + den) div (2*den), the contamination_frac convention)
    — never round(double, k), whose engine-side rounding paths diverge
    on boundary ratios (the r04 rolling_spend class). Intermediates run
    in decimal(38,0) / HUGEINT so 2e6-scaled token totals cannot wrap
    at corpus scale; only the final div lands back in BIGINT. The
    per-source aggregate is persisted: it feeds both the totals row and
    the final projection, and without the persist the corpus
    tokenize+aggregate runs twice."""
    from .caching import persist_tracked

    d = load_parallel(spark, sf_dir, "documents")
    per = persist_tracked(d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
        .alias("n_tokens"),
    ))
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_tokens",
            half_up_scaled("n_tokens", "total_tokens", 1_000_000,
                           width="decimal(38,0)").alias("share_ppm"),
            half_up_scaled("total_tokens",
                           "n_sources * cast(n_tokens as decimal(38,0))",
                           1_000_000,
                           width="decimal(38,0)").alias("weight_e6"),
        )
    )


SQL_TEXT_DOMAIN_MIX = """
WITH per AS (
    SELECT source, count(*) AS n_docs,
           cast(sum(cast(len(string_split(text, ' ')) AS bigint))
                AS bigint) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT cast(sum(n_tokens) AS bigint) AS total_tokens,
           cast(count(*) AS bigint) AS n_sources
    FROM per
)
SELECT source, n_docs, n_tokens,
       cast((2 * 1000000 * cast(n_tokens AS hugeint) + total_tokens)
            // (2 * cast(total_tokens AS hugeint)) AS bigint) AS share_ppm,
       cast((2 * 1000000 * cast(total_tokens AS hugeint)
             + n_sources * cast(n_tokens AS hugeint))
            // (2 * n_sources * cast(n_tokens AS hugeint)) AS bigint)
           AS weight_e6
FROM per, tot
"""


def q_kg_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood size per entity: distinct nodes reachable in
    at most two steps (self excluded) next to the direct degree — the
    local-expansion profile that separates hubs from bridge nodes. One
    wedge join through the shared neighbor plus a union with the direct
    edges, all vocabulary-bounded; the edge list is persisted (wedge +
    direct + degree consumers)."""
    from .caching import persist_tracked

    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    two = (
        edges.select(F.col("dst").alias("n"), F.col("src").alias("a"))
        .join(edges.select(F.col("src").alias("n"),
                           F.col("dst").alias("b")), "n")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
    )
    reach = two.unionByName(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    # deg is vocabulary-bounded -> broadcast, so the large reach relation
    # is never shuffled just to meet it (same call as common_neighbors)
    return (
        reach.groupBy("a").agg(F.count("*").alias("n_within_2"))
        .join(F.broadcast(deg), reach["a"] == deg["src"])
        .select(
            F.col("a").alias("node"),
            F.col("degree").cast("int").alias("degree"),
            F.col("n_within_2").cast("int").alias("n_within_2"),
        )
    )


SQL_KG_TWO_HOP = f"""
WITH {_COOC_EDGES_CTE},
two AS (
    SELECT e1.src AS a, e2.dst AS b
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    WHERE e1.src <> e2.dst
),
reach AS (
    SELECT DISTINCT a, b
    FROM (SELECT a, b FROM two UNION ALL SELECT src, dst FROM edges)
),
deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
SELECT a AS node, cast(degree AS integer) AS degree,
       cast(count(*) AS integer) AS n_within_2
FROM reach JOIN deg ON deg.src = a
GROUP BY a, degree
"""


# ---------------------------------------------------------------------------
# round-5 wave 4: sketches, training-order, link prediction, TPC-H shapes,
# contamination scoring, bigram LM, exact-moment statistics, ANN recall
# ---------------------------------------------------------------------------


def q_rel_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over events.user_id,
    k=64: the mergeable bottom-k sketch (Bar-Yossef et al.) as a
    relational plan. The hash column is deduped with map-side partial
    aggregation and the k smallest survive via orderBy+limit — Spark
    compiles that to TakeOrderedAndProject (per-partition heap + driver
    merge of k rows/partition), so no global sort ever materializes.
    Estimator: (k-1) * 2^32 / h_k in pure bigint math (hash range is the
    md5-prefix u32); when fewer than k distinct hashes exist the sketch
    IS the exact answer. ``true_distinct`` is the gate's self-check
    column (a production run drops it — the sketch exists to avoid that
    exact count)."""
    k = 64
    e = load_parallel(spark, sf_dir, "events")
    from .dedup import md5_int32

    hv = e.select(
        md5_int32(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
        .alias("hv")
    ).distinct()
    kmin = hv.orderBy("hv").limit(k)
    sk = kmin.agg(
        F.count("*").cast("long").alias("n_vals"),
        F.max("hv").alias("kth_hash"),
    )
    true = e.agg(
        F.countDistinct("user_id").cast("long").alias("true_distinct")
    )
    est_num = (k - 1) * 4294967296  # (k-1) * 2^32
    return (
        sk.crossJoin(F.broadcast(true))
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_vals",
            "kth_hash",
            F.when(F.col("n_vals") < k, F.col("n_vals"))
            .otherwise(F.expr(f"cast({est_num} div kth_hash as bigint)"))
            .alias("est_distinct"),
            "true_distinct",
        )
    )


SQL_REL_KMV_DISTINCT = """
WITH hv AS (
    SELECT DISTINCT cast(('0x' || substring(md5(concat('kmv:', user_id)),
                                            1, 8)) AS bigint) AS hv
    FROM events
),
kmin AS (SELECT hv FROM hv ORDER BY hv LIMIT 64),
sk AS (SELECT cast(count(*) AS bigint) AS n_vals, max(hv) AS kth_hash
       FROM kmin),
t AS (SELECT cast(count(DISTINCT user_id) AS bigint) AS true_distinct
      FROM events)
SELECT 64 AS k, n_vals, kth_hash,
       CASE WHEN n_vals < 64 THEN n_vals
            ELSE cast(270582939648 // kth_hash AS bigint) END AS est_distinct,
       true_distinct
FROM sk, t
"""


def q_text_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: a seed-keyed global permutation of the
    corpus per training epoch — the distributed relational form of the
    reference's in-memory per-epoch batch shuffle
    (model_partial_ner/dataset.py:126-130, random.shuffle of the batch
    order), which round-1 SURVEY sanctioned as dropped (E6). Re-expressed
    Spark-first it becomes data: position = rank of md5(epoch, doc_id).
    The rank is a TWO-PASS distributed prefix sum, not a global window:
    ranks are computed inside 256 md5-prefix buckets (parallel windows)
    and offset by the cumulated per-bucket counts (a 256-row-per-epoch
    broadcast relation) — the text_pack_bins discipline, so no epoch ever
    serializes through one partition. The DuckDB twin keeps the naive
    single-window form; the gate therefore also pins two-pass == naive."""
    d = load_parallel(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
    ).select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        F.md5(
            F.concat(F.lit("epoch:"), F.col("epoch").cast("string"),
                     F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("key"),
    )
    keyed = keyed.withColumn(
        "bucket", F.conv(F.substring("key", 1, 2), 16, 10).cast("int")
    )
    w = Window.partitionBy("epoch", "bucket").orderBy("key", "doc_id")
    ranked = keyed.withColumn("rnk", F.row_number().over(w))
    counts = keyed.groupBy("epoch", "bucket").agg(F.count("*").alias("n"))
    woff = (
        Window.partitionBy("epoch").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch", "bucket",
        F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off"),
    )
    return (
        ranked.join(F.broadcast(offsets), ["epoch", "bucket"])
        .select(
            "epoch", "doc_id",
            (F.col("off") + F.col("rnk") - 1).cast("long").alias("position"),
        )
    )


SQL_TEXT_EPOCH_SHUFFLE = """
WITH keyed AS (
    SELECT cast(epoch AS integer) AS epoch, doc_id,
           md5(concat('epoch:', epoch, ':', doc_id)) AS key
    FROM (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents)
),
bucketed AS (
    SELECT epoch, doc_id, key,
           cast(('0x' || substring(key, 1, 2)) AS bigint) AS bucket
    FROM keyed
)
SELECT epoch, doc_id,
       cast(row_number() OVER (PARTITION BY epoch
                               ORDER BY bucket, key, doc_id) - 1
            AS bigint) AS position
FROM bucketed
"""


def q_kg_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the entity co-occurrence graph:
    score(a,b) = sum over shared neighbors n of 1/ln(deg(n)) — common
    neighbors inversely weighted by how promiscuous they are (a hub
    shared by everyone predicts nothing). Same wedge-join shape as
    kg_common_neighbors (one equi-join through the shared neighbor,
    never all-pairs); the degree relation is vocabulary-bounded and
    broadcast onto the NEIGHBOR column before the wedge aggregate, so
    the weight rides the existing shuffle. Degree-1 neighbors are
    excluded (ln 1 = 0 — they also cannot close a wedge). ln-on-integers
    determinism precedent: kg_entity_pmi / text_unigram_surprisal."""
    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nd = deg.select(F.col("src").alias("n"), F.col("deg").alias("deg_n"))
    return (
        edges.select(F.col("dst").alias("n"), F.col("src").alias("a"))
        .join(edges.select(F.col("dst").alias("n"),
                           F.col("src").alias("b")), "n")
        .filter(F.col("a") < F.col("b"))
        .join(F.broadcast(nd), "n")
        .filter(F.col("deg_n") >= 2)
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("int").alias("n_shared"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("deg_n"))), 6)  # money: irrational
            .alias("aa_score"),
        )
        .select(F.col("a").alias("surface_a"),
                F.col("b").alias("surface_b"), "n_shared", "aa_score")
    )


SQL_KG_ADAMIC_ADAR = f"""
WITH {_COOC_EDGES_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
SELECT e1.src AS surface_a, e2.src AS surface_b,
       cast(count(*) AS integer) AS n_shared,
       round(sum(1.0 / ln(d.deg)), 6) AS aa_score
FROM edges e1
JOIN edges e2 ON e1.dst = e2.dst
JOIN deg d ON d.src = e1.dst
WHERE e1.src < e2.src AND d.deg >= 2
GROUP BY e1.src, e2.src
"""


def q_rel_supplier_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blame supplier): for multi-supplier orders,
    the suppliers whose lineitem came back returned ('R') while NO other
    supplier's item on the same order did. The classic form is a double
    correlated EXISTS / NOT EXISTS self-join; the Spark plan decorrelates
    it into ONE aggregation over the fact (distinct-supplier and
    distinct-returned-supplier counts per order) plus one join — two
    shuffles total instead of three self-join passes, and no fact row is
    ever widened. The DuckDB twin keeps the literal EXISTS/NOT-EXISTS
    form, so the gate additionally pins decorrelated == correlated.
    The supplier join is unhinted: supplier grows with sf (AQE promotes
    it when runtime stats say it fits — the r04 broadcast discipline);
    the per-supplier aggregate side is already grouped small."""
    # r07 note: routing the scan through load_parallel was tried and
    # MEASURED SLOWER (3.05s vs 1.77s at sf0.1) — the repartition of the
    # narrow 3-column fact costs more than the single-row-group scan it
    # parallelizes, because the partial aggregates behind both consumers
    # are already map-side-combined. Kept on the plain scan.
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    cand = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey").distinct()
    )
    s = load(spark, sf_dir, "supplier")
    return (
        cand.join(per, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_orders")
    )


SQL_REL_SUPPLIER_WAITING = """
SELECT s_name, cast(count(*) AS bigint) AS n_orders
FROM (
    SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
    FROM lineitem l1
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
) w
JOIN supplier ON s_suppkey = l_suppkey
-- keyed on l_suppkey like the Spark side (s_name alone would merge two
-- suppliers if names ever collided — keep the twins structurally equal)
GROUP BY l_suppkey, s_name
"""


def q_rel_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose revenue exceeds a
    fraction (1/1600) of TOTAL revenue — a group aggregate compared
    against a global scalar. The scalar arrives as a broadcast one-row
    relation (never a collected driver value) and the threshold compare
    is pure bigint cents math (revenue_cents * 1600 > total_cents): no
    double ever touches the cut, so no row can sit on a rounding
    boundary. The per-part aggregate is persisted (total + filter
    consumers read it once). The broadcast rides on the FILTERED
    aggregate — provably < 1600 rows by construction (each passing part
    holds > 1/1600 of total revenue) — never on the sf-growing part
    dimension (ADVICE r05; the r04 static-broadcast discipline). Twin
    note: sum outputs are cast back to BIGINT — DuckDB sum(BIGINT) is
    HUGEINT, whose client-side rendering is fetch-path-dependent (the
    r05 driver-red mechanism; see tests/test_oracle_types.py)."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    pr = persist_tracked(
        li.select("l_partkey", cents.alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    total = pr.agg(F.sum("revenue_cents").alias("total_cents"))
    p = load(spark, sf_dir, "part")
    important = (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("revenue_cents") * 1600 > F.col("total_cents"))
    )
    return (
        p.join(F.broadcast(important),
               F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "revenue_cents")
    )


SQL_REL_IMPORTANT_PARTS = """
WITH pr AS (
    SELECT l_partkey,
           cast(sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint))
                AS bigint) AS revenue_cents
    FROM lineitem GROUP BY l_partkey
),
t AS (SELECT cast(sum(revenue_cents) AS bigint) AS total_cents FROM pr)
SELECT p_partkey, p_name, revenue_cents
FROM pr
JOIN part ON p_partkey = l_partkey
CROSS JOIN t
WHERE revenue_cents * 1600 > total_cents
"""


def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    revenue over a shipdate quarter, ties included. Revenue is exact
    bigint cents; the maximum arrives as a broadcast one-row relation
    (the sanctioned constant-size crossJoin) rather than an
    unpartitioned window — the per-supplier aggregate is persisted so
    the max pass and the filter pass share one computation. The quarter
    bounds are TIMESTAMP_NTZ literals compared against the NTZ parquet
    column — wall-clock to wall-clock, no session timezone anywhere
    (a plain cast("timestamp") literal resolves in the DRIVER's session
    TZ, which this repo does not control). The broadcast rides on the
    max-filtered winners (>= 1 row, ties only) — never on the
    sf-growing supplier dimension. Twin note: the sum output is cast
    back to BIGINT (DuckDB HUGEINT rendering is fetch-path-dependent —
    the r05 driver-red mechanism; see tests/test_oracle_types.py)."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    rev = persist_tracked(
        li.filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate")
               < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .select("l_suppkey", cents.alias("cents"))
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("total_cents"))
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    winners = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("mx"))
    )
    return (
        s.join(F.broadcast(winners),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


SQL_REL_TOP_SUPPLIER = """
WITH rev AS (
    SELECT l_suppkey,
           cast(sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint))
                AS bigint) AS total_cents
    FROM lineitem
    WHERE l_shipdate >= timestamp '1996-01-01'
      AND l_shipdate < timestamp '1996-04-01'
    GROUP BY l_suppkey
),
mx AS (SELECT max(total_cents) AS mx FROM rev)
SELECT s_suppkey, s_name, total_cents
FROM rev
JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE total_cents = mx
"""


def q_text_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document benchmark-contamination SCORE: the fraction of a
    document's distinct 4-gram shingles that appear in the eval-set
    stand-in (doc_id % 20 == 0, the dedup_decontaminate convention) —
    the scoring form of decontamination, for graded filtering or
    contamination audits rather than hard drops. Benchmark shingles are
    broadcast (eval sets are fixed-size); the corpus streams once; the
    fraction is integer HALF_UP parts-per-million ((2*10^6*hit + tot)
    div (2*tot)) — no double division near a representable boundary."""
    from .dedup import shingles_df

    docs = load_parallel(spark, sf_dir, "documents")
    sh = shingles_df(docs, n=4)
    bench = (
        sh.filter(F.col("id") % 20 == 0).select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        sh.filter(F.col("id") % 20 != 0)
        .join(F.broadcast(bench), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("int").alias("n_hit"),
        )
        .select(
            F.col("id").alias("doc_id"), "n_shingles", "n_hit",
            half_up_scaled("n_hit", "n_shingles",
                           1_000_000).alias("frac_ppm"),
        )
    )


SQL_TEXT_CONTAMINATION_FRAC = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
four AS (
    SELECT doc_id, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w, lead(tok, 3) OVER w)
               AS shingle,
           lead(tok, 3) OVER w AS t4
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id AS id, shingle FROM four WHERE t4 IS NOT NULL),
bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 20 = 0)
SELECT sh.id AS doc_id,
       cast(count(*) AS integer) AS n_shingles,
       cast(count(bench.shingle) AS integer) AS n_hit,
       cast((2 * 1000000 * count(bench.shingle) + count(*))
            // (2 * count(*)) AS bigint) AS frac_ppm
FROM sh LEFT JOIN bench USING (shingle)
WHERE sh.id % 20 <> 0
GROUP BY sh.id
"""


def q_text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram cross-entropy (mean -ln p(w2|w1) in nats)
    against the corpus's own bigram MLE — the second-order LM quality
    signal: formulaic boilerplate (predictable continuations) scores
    near zero, incoherent token soup scores high. The bigram relation is
    persisted (model-build + scoring consumers); the conditional model
    joins back on (w1, w2) with an explicit shuffle-hash hint — the
    bigram vocabulary grows with the corpus, so it must NEVER be planned
    as a broadcast build (the r04 scale-bug class). Every scored bigram
    is in the model by construction (same corpus), so no OOV branch."""
    d = load_parallel(spark, sf_dir, "documents")
    # bigrams are built IN-ROW from the token array (a doc's tokens are
    # already co-located in its row) — the former posexplode + lead()
    # window paid a full shuffle + sort of the token relation to pair
    # each token with its neighbor (r07: 1 Exchange + WindowExec removed
    # from the plan, map-only bigram construction)
    toks = F.split(F.col("text"), " ")
    bi_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = persist_tracked(
        d.select("doc_id", F.explode(bi_arr).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # c1 aggregates the vocabulary-bounded c12 relation, not the token
    # stream again: sum of c12 over w2 IS the w1 occurrence count
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = c12.join(c1, "w1").select(
        "w1", "w2", F.log(F.col("c12") / F.col("c1")).alias("logp")
    )
    return (
        bi.join(model.hint("shuffle_hash"), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.round(-F.avg("logp"), 6).alias("surprisal_nats"),  # money: irrational
        )
    )


SQL_TEXT_BIGRAM_SURPRISAL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
bi AS (
    SELECT doc_id, tok AS w1, lead(tok, 1) OVER w AS w2
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
bi2 AS (SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi2 GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY w1),
model AS (
    SELECT c12.w1, c12.w2, ln(c12.c12 / cast(c1.c1 AS double)) AS logp
    FROM c12 JOIN c1 USING (w1)
)
SELECT b.doc_id, cast(count(*) AS integer) AS n_bigrams,
       round(-avg(m.logp), 6) AS surprisal_nats
FROM bi2 b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
GROUP BY b.doc_id
"""


def q_rel_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    computed from EXACT integer moments: built-in corr() aggregates
    accumulate doubles in partition order, which is not reproducible
    across engines (or even across runs at scale). Here the five moments
    (sum x, sum y, sum xy, sum x^2, sum y^2) are exact integer sums —
    the square sums as decimal(38,0) in Spark / auto-HUGEINT in DuckDB
    so they cannot overflow at any sf — and only then cast to double,
    where both engines round the same exact integer to the same double
    and the closed-form corr is identical IEEE arithmetic. Map-side
    combined one-shuffle aggregate; zero-variance groups yield NULL via
    an explicit guard on both engines."""
    li = load(spark, sf_dir, "lineitem")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    base = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        y.alias("y"),
    )
    # every sum that can exceed int64 at extreme scale (cents linear sum
    # included: 6e12 rows x 1e7 cents > 2^63) aggregates as decimal(38,0)
    m = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round((n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)), 6),  # money: irrational
        ).alias("corr_qty_price"),
    )


SQL_REL_CORR_QTY_PRICE = """
WITH m AS (
    -- floor() before the bigint casts: DuckDB cast(double AS bigint)
    -- ROUNDS where Spark's .cast('long') truncates (CLAUDE.md trap);
    -- l_quantity is non-negative so floor == truncation
    SELECT l_returnflag,
           count(*) AS n,
           sum(cast(floor(l_quantity) AS bigint)) AS sx,
           sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) AS sy,
           sum(cast(floor(l_quantity) AS bigint)
               * cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) AS sxy,
           sum(cast(floor(l_quantity) AS bigint)
               * cast(floor(l_quantity) AS bigint)) AS sxx,
           sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)
               * cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, cast(n AS bigint) AS n,
       CASE WHEN cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double) > 0
             AND cast(n AS double) * cast(syy AS double)
                 - cast(sy AS double) * cast(sy AS double) > 0
            THEN round(
                (cast(n AS double) * cast(sxy AS double)
                 - cast(sx AS double) * cast(sy AS double))
                / (sqrt(cast(n AS double) * cast(sxx AS double)
                        - cast(sx AS double) * cast(sx AS double))
                   * sqrt(cast(n AS double) * cast(syy AS double)
                          - cast(sy AS double) * cast(sy AS double))), 6)
       END AS corr_qty_price
FROM m
"""


def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality self-evaluation: per-query recall of the IVF index
    against the exact brute-force top-k (k=3, the sim_ivf_topk
    configuration) as INTEGER hit counts — the observability query that
    tells an operator whether n_centroids/nprobe are tuned before
    shipping an index. The exact side is the guarded correctness-anchor
    crossJoin; in production recall is estimated on exactly this kind of
    bounded query sample while the index serves the full corpus. The
    left join keeps zero-hit queries visible."""
    from .similarity import brute_force_topk, ivf_topk, queries_from_ids

    emb = load_parallel(spark, sf_dir, "embeddings")
    exact = brute_force_topk(emb, queries_from_ids(emb, 10), k=3)
    ivf = ivf_topk(emb, k=3, n_centroids=32, max_query_id=10).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(3).cast("int").alias("k"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("int").alias("n_hit"),
        )
    )


SQL_SIM_IVF_RECALL = f"""
SELECT x.query_id, 3 AS k, cast(count(i.vec_id) AS integer) AS n_hit
FROM (
    WITH {_COSINE_PAIRS_CTE.format(maxq=10)}
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    ) WHERE rnk <= 3
) x
LEFT JOIN ({SQL_SIM_IVF_TOPK}) i
  ON i.query_id = x.query_id AND i.vec_id = x.vec_id
GROUP BY x.query_id
"""


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS coverage — the irregular set list
    ((priority), (status), ()) that neither ROLLUP (rel_rollup_orders)
    nor CUBE (rel_cube_orders) can express: the two one-dimensional
    margins plus the grand total WITHOUT the two-dimensional cells.
    Uses the native DataFrame.groupingSets lowering (one expand + one
    hash aggregate, map-side combined — not a union of three scans);
    grouping_id disambiguates NULL-valued dimension values from
    grouped-out dimensions. Revenue keeps the rel_rollup_orders money
    convention (2dp round = identity on the 2dp-exact sum)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority", "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),  # money: grid
        )
        .select("gid", "o_orderpriority", "o_orderstatus", "n_orders",
                "revenue")
    )


SQL_REL_GROUPING_SETS = """
SELECT cast(grouping_id(o_orderpriority, o_orderstatus) AS integer) AS gid,
       o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def q_kg_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (damping 0.85, 3 unrolled iterations) from a
    single deterministic seed — the max-degree entity (min surface on
    ties): 'how close is every entity to the hub', the seed-conditioned
    relevance used for KG-local retrieval. Teleport mass returns to the
    SEED only (not uniformly), so rank decays with graph distance from
    it. Same one-shuffle-per-iteration shape as kg_pagerank (edges JOIN
    ranks on src -> algebraic per-dst sum); the seed is a broadcast
    one-row relation picked by TakeOrdered (deg desc, surface asc), never
    a driver collect. The edge list is the shared _cooc_edges relation
    (one definition across the round-5 graph ops), persisted across the
    iterations."""
    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    seed = (
        deg.orderBy(F.col("deg").desc(), F.col("src"))
        .limit(1).select(F.col("src").alias("seed"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    base = nodes.crossJoin(F.broadcast(seed)).select(
        "node",
        F.when(F.col("node") == F.col("seed"), 1.0).otherwise(0.0)
        .alias("s"),
    )
    r = base.select("node", F.col("s").alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        r = (
            base.join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (F.lit(0.15) * F.col("s")
                 + F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return (
        r.join(base.select("node", F.col("s").cast("int").alias("is_seed")),
               "node")
        .select("node", "is_seed", F.round("rank", 6).alias("ppr"))  # money: irrational
    )


SQL_KG_PAGERANK_PERSONALIZED = f"""
WITH {_COOC_EDGES_CTE},
e AS (SELECT src, dst FROM edges),
deg AS (SELECT src, cast(count(*) AS bigint) AS deg FROM e GROUP BY src),
seed AS (SELECT src AS seed FROM deg ORDER BY deg DESC, src LIMIT 1),
nodes AS (SELECT DISTINCT src AS node FROM e),
base AS (
    SELECT node, CASE WHEN node = seed THEN 1.0 ELSE 0.0 END AS s
    FROM nodes CROSS JOIN seed
),
r0 AS (SELECT node, s AS rank FROM base),
c1 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r1 AS (
    SELECT base.node, 0.15 * base.s + 0.85 * coalesce(c1.c, 0) AS rank
    FROM base LEFT JOIN c1 ON c1.dst = base.node
),
c2 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r2 AS (
    SELECT base.node, 0.15 * base.s + 0.85 * coalesce(c2.c, 0) AS rank
    FROM base LEFT JOIN c2 ON c2.dst = base.node
),
c3 AS (
    SELECT e.dst, sum(r.rank / d.deg) AS c
    FROM e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
),
r3 AS (
    SELECT base.node, 0.15 * base.s + 0.85 * coalesce(c3.c, 0) AS rank
    FROM base LEFT JOIN c3 ON c3.dst = base.node
)
SELECT r3.node, cast(base.s AS integer) AS is_seed,
       round(r3.rank, 6) AS ppr
FROM r3 JOIN base ON base.node = r3.node
"""


def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration: for every LSH candidate pair, the
    signature-agreement Jaccard ESTIMATE (matching components / 16)
    next to the TRUE Jaccard — the observability query that tells an
    operator whether num_hashes/band_size are tuned before trusting the
    sketch at corpus scale. est_ppm is exact integer math (1e6/16 =
    62500 per matching component); true_ppm is integer HALF_UP from the
    intersection/union counts. Signature and shingle relations are
    corpus-sized, so every join onto the pairs is SHUFFLE_HASH — never
    a broadcast build (the r04 scale-bug class). The signature and
    distinct-shingle relations are PERSISTED (two and three consumers
    respectively — without the persist each join side re-scans and
    re-md5s the whole corpus); the candidate generator consumes the same
    persisted signatures (r07), and production runs the calibration on a
    sampled candidate subset."""
    from .dedup import minhash_lsh_pairs, minhash_signatures, shingles_df

    docs = load_parallel(spark, sf_dir, "documents")
    sig = persist_tracked(minhash_signatures(docs, num_hashes=16, n=3))
    # the candidate generator consumes the SAME persisted signatures (r07:
    # its former private signature lineage re-scanned and re-md5'd the
    # whole corpus once more for nothing)
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_size=4, n=3,
                              max_bucket_size=64,
                              signatures=sig).select("id_a", "id_b")
    siga = sig.select(F.col("id").alias("id_a"),
                      *[F.col(f"m{h}").alias(f"a{h}") for h in range(16)])
    sigb = sig.select(F.col("id").alias("id_b"),
                      *[F.col(f"m{h}").alias(f"b{h}") for h in range(16)])
    n_match = sum(
        (F.col(f"a{h}") == F.col(f"b{h}")).cast("int") for h in range(16)
    )
    est = (
        pairs.join(siga.hint("shuffle_hash"), "id_a")
        .join(sigb.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", n_match.alias("n_sig_match"))
    )
    sh = persist_tracked(shingles_df(docs, n=3))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        pairs.hint("shuffle_hash").join(a, "id_a")
        .join(b.hint("shuffle_hash"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        est.join(inter.hint("shuffle_hash"), ["id_a", "id_b"], "left")
        .join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a", "id_b",
            F.col("n_sig_match").cast("int").alias("n_sig_match"),
            (F.col("n_sig_match").cast("long") * 62500).alias("est_ppm"),
            F.coalesce(F.col("inter"), F.lit(0)).cast("int").alias("inter"),
            (F.col("sz_a") + F.col("sz_b")
             - F.coalesce(F.col("inter"), F.lit(0))).cast("int")
            .alias("uni"),
            half_up_scaled("coalesce(inter, 0)",
                           "sz_a + sz_b - coalesce(inter, 0)",
                           1_000_000).alias("true_ppm"),
        )
    )


SQL_DEDUP_MINHASH_ESTIMATE = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
tri AS (
    SELECT doc_id, pos, concat_ws(' ', tok,
           lead(tok, 1) OVER w, lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w AS t3
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT doc_id AS id, shingle FROM tri WHERE t3 IS NOT NULL),
base AS (
    SELECT id, cast(('0x' || substring(md5(shingle), 1, 8)) AS bigint) AS x
    FROM sh
),
salted AS (
    SELECT id, h, ((2 * h + 1) * x + h * 12582917) % 2147483647 AS hv
    FROM base, unnest(range(0, 16)) AS u(h)
),
sig AS (SELECT id, h, min(hv) AS minhash FROM salted GROUP BY id, h),
banded AS (
    SELECT id, cast(floor(h / 4) AS integer) AS band,
           md5(string_agg(cast(minhash AS varchar), ',' ORDER BY h)) AS bucket
    FROM sig GROUP BY id, cast(floor(h / 4) AS integer)
),
capped AS (
    SELECT band, bucket FROM banded GROUP BY band, bucket
    HAVING count(*) BETWEEN 2 AND 64
),
cand AS (
    SELECT DISTINCT x.id AS id_a, y.id AS id_b
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
    JOIN capped c ON c.band = x.band AND c.bucket = x.bucket
),
match AS (
    SELECT cand.id_a, cand.id_b,
           cast(sum(CASE WHEN p.minhash = q.minhash THEN 1 ELSE 0 END)
                AS integer) AS n_sig_match
    FROM cand
    JOIN sig p ON p.id = cand.id_a
    JOIN sig q ON q.id = cand.id_b AND q.h = p.h
    GROUP BY cand.id_a, cand.id_b
),
shd AS (SELECT DISTINCT id, shingle FROM sh),
inter AS (
    SELECT cand.id_a, cand.id_b, count(*) AS inter
    FROM cand
    JOIN shd a ON a.id = cand.id_a
    JOIN shd b ON b.id = cand.id_b AND b.shingle = a.shingle
    GROUP BY cand.id_a, cand.id_b
),
sizes AS (SELECT id, count(*) AS sz FROM shd GROUP BY id)
SELECT m.id_a, m.id_b, m.n_sig_match,
       cast(m.n_sig_match AS bigint) * 62500 AS est_ppm,
       cast(coalesce(i.inter, 0) AS integer) AS inter,
       cast(sa.sz + sb.sz - coalesce(i.inter, 0) AS integer) AS uni,
       cast((2 * 1000000 * cast(coalesce(i.inter, 0) AS bigint)
             + (sa.sz + sb.sz - coalesce(i.inter, 0)))
            // (2 * cast(sa.sz + sb.sz - coalesce(i.inter, 0) AS bigint))
            AS bigint) AS true_ppm
FROM match m
LEFT JOIN inter i ON i.id_a = m.id_a AND i.id_b = m.id_b
JOIN sizes sa ON sa.id = m.id_a
JOIN sizes sb ON sb.id = m.id_b
"""


def q_rel_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order cadence via lag windows: day gaps between
    consecutive orders, aggregated to (n_orders, min/max gap, integer
    HALF_UP mean gap at e4). The window partitions on the customer key —
    parallel across customers, frame bounded by a customer's own order
    count; the aggregate is map-side combined on the same key, so the
    window shuffle is reused. All-day-granularity integer math (dates
    are midnight-aligned; datediff both engines)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn(
            "gap",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate", 1).over(w)
            ).cast("long"),
        )
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("*").cast("int").alias("n_orders"),
            F.min("gap").cast("int").alias("min_gap_days"),
            F.max("gap").cast("int").alias("max_gap_days"),
            F.sum("gap").alias("_sg"),
            F.count("gap").alias("_cg"),
        )
        .filter(F.col("_cg") > 0)
        .select(
            "o_custkey", "n_orders", "min_gap_days", "max_gap_days",
            (half_up_scaled("_sg", "_cg", 10_000)
             / F.lit(10000.0)).alias("avg_gap_days"),
        )
    )


SQL_REL_ORDER_GAPS = """
WITH gaps AS (
    SELECT o_custkey,
           date_diff('day',
                     lag(o_orderdate, 1) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap
    FROM orders
)
SELECT o_custkey,
       cast(count(*) AS integer) AS n_orders,
       cast(min(gap) AS integer) AS min_gap_days,
       cast(max(gap) AS integer) AS max_gap_days,
       ((2 * sum(gap) * 10000 + count(gap)) // (2 * count(gap)))
           / 10000.0 AS avg_gap_days
FROM gaps
GROUP BY o_custkey
HAVING count(gap) > 0
"""


def q_rel_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bilateral trade volume): revenue between supplier
    nation and customer nation per order year, cross-nation pairs only.
    The join topology is the canonical two-sided star: ONLY nation (25
    rows at every sf) carries a broadcast hint, on both arms; supplier,
    customer, orders and lineitem all grow linearly with sf, so every
    one of those joins is left unhinted — these are raw file scans with
    accurate sizeInBytes, and Catalyst/AQE broadcasts them at gate
    scale where they genuinely fit while switching to shuffle joins
    when the stats exceed the threshold at production scale (pinning
    supplier here was the r04 static-broadcast class; VERDICT r05 #2).
    Revenue keeps the rel_part_type_revenue money convention (4dp round
    = identity on the 4dp-exact price*(1-disc) sum)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("o_orderdate").alias("year"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(  # money: grid
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue"),
        )
    )


SQL_REL_NATION_TRADE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       cast(year(o_orderdate) AS integer) AS year,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY ns.n_name, nc.n_name, year(o_orderdate)
"""


def q_text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: for every source pair, how
    many distinct 4-gram shingles they share, plus the overlap
    coefficient (shared / smaller source's vocabulary) — the syndication
    / shared-boilerplate diagnostic a curation pipeline runs before
    trusting per-source dedup or mixing weights. Shingles are keyed
    directly by SOURCE (shingles_df's id_col), so the relation is
    (sources x shingle-vocabulary)-bounded, never corpus-row-sized; the
    pair explosion groups per shingle (each group <= n_sources members
    — the bucket-pairs shape with no cap needed) and per-source totals
    broadcast. Coefficient as integer HALF_UP ppm."""
    from .dedup import _bucket_pairs, shingles_df

    docs = load_parallel(spark, sf_dir, "documents")
    # id_col="source" repeats across docs -> the global distinct must stay
    sh = persist_tracked(
        shingles_df(docs, n=4, id_col="source", id_unique=False)
    )
    shared = (
        _bucket_pairs(sh, ["shingle"], "id", None)
        .groupBy(F.col("a").alias("source_a"), F.col("b").alias("source_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    tot = sh.groupBy("id").agg(F.count("*").alias("tot"))
    ta = tot.select(F.col("id").alias("source_a"), F.col("tot").alias("ta"))
    tb = tot.select(F.col("id").alias("source_b"), F.col("tot").alias("tb"))
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a", "source_b", "n_shared",
            F.least(F.col("ta"), F.col("tb")).cast("long").alias("min_vocab"),
            half_up_scaled("n_shared", "least(ta, tb)",
                           1_000_000).alias("overlap_ppm"),
        )
    )


SQL_TEXT_SOURCE_OVERLAP = """
WITH toks AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok,
           unnest(range(0, len(string_split(text, ' ')))) AS pos
    FROM documents
),
four AS (
    SELECT source, concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w, lead(tok, 3) OVER w)
               AS shingle,
           lead(tok, 3) OVER w AS t4
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT source AS id, shingle FROM four WHERE t4 IS NOT NULL),
shared AS (
    SELECT x.id AS source_a, y.id AS source_b,
           cast(count(*) AS bigint) AS n_shared
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
    GROUP BY x.id, y.id
),
tot AS (SELECT id, count(*) AS tot FROM sh GROUP BY id)
SELECT source_a, source_b, n_shared,
       cast(least(ta.tot, tb.tot) AS bigint) AS min_vocab,
       cast((2 * 1000000 * n_shared + least(ta.tot, tb.tot))
            // (2 * cast(least(ta.tot, tb.tot) AS bigint)) AS bigint)
           AS overlap_ppm
FROM shared
JOIN tot ta ON ta.id = source_a
JOIN tot tb ON tb.id = source_b
"""


def q_kg_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-walk corpus over the entity graph (2 walks
    per start node x 3 steps) — the DeepWalk/node2vec preparation stage
    that turns a graph into embedding-training sequences, made gateable
    by replacing the RNG with md5: at step t the walk at node c picks
    neighbor rank md5(walk, t, start, c) % deg(c). Every relation in the
    plan (edges, per-src neighbor ranks, degrees, the walk frontier) is
    VOCABULARY-bounded — the corpus never enters the iteration, so the
    op costs the same at 100 TB as at gate scale. The neighbor-rank
    window partitions on src (parallel, per-node frame); each step is
    one broadcast-degree join + one (src, rank) equi-join; walks ride
    as one frontier relation, never a driver loop."""
    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranked = edges.select(
        "src", "dst",
        F.row_number().over(
            Window.partitionBy("src").orderBy("dst")
        ).alias("rk"),
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    cur = nodes.select(
        F.col("node").alias("start"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("w"),
        F.col("node").alias("c"),
        F.col("node").alias("path"),
    )
    from .dedup import md5_int32

    for t in (1, 2, 3):
        pick_hash = md5_int32(
            F.concat(F.lit(f"walk:{t}:"), F.col("w").cast("string"),
                     F.lit(":"), F.col("start"), F.lit(":"), F.col("c"))
        )
        cur = (
            cur.join(F.broadcast(deg), cur["c"] == deg["src"])
            .select(
                "start", "w", "path",
                F.col("c").alias("prev"),
                (pick_hash % F.col("deg") + 1).cast("int").alias("pick"),
            )
            .join(ranked,
                  (F.col("prev") == ranked["src"])
                  & (F.col("pick") == ranked["rk"]))
            .select(
                "start", "w",
                F.col("dst").alias("c"),
                F.concat(F.col("path"), F.lit("->"), F.col("dst"))
                .alias("path"),
            )
        )
    return cur.select(
        F.col("start").alias("start_node"),
        F.col("w").cast("int").alias("walk_id"),
        "path",
    )


SQL_KG_RANDOM_WALKS = f"""
WITH {_COOC_EDGES_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ranked AS (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dst) AS rk
    FROM edges
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
w0 AS (
    SELECT node AS start, cast(w AS integer) AS w, node AS c,
           node AS path
    FROM nodes, unnest([0, 1]) AS u(w)
),
s1 AS (
    SELECT w0.start, w0.w, r.dst AS c, w0.path || '->' || r.dst AS path
    FROM w0
    JOIN deg d ON d.src = w0.c
    JOIN ranked r ON r.src = w0.c
     AND r.rk = cast(('0x' || substring(md5(
             concat('walk:1:', w0.w, ':', w0.start, ':', w0.c)), 1, 8))
             AS bigint) % d.deg + 1
),
s2 AS (
    SELECT s1.start, s1.w, r.dst AS c, s1.path || '->' || r.dst AS path
    FROM s1
    JOIN deg d ON d.src = s1.c
    JOIN ranked r ON r.src = s1.c
     AND r.rk = cast(('0x' || substring(md5(
             concat('walk:2:', s1.w, ':', s1.start, ':', s1.c)), 1, 8))
             AS bigint) % d.deg + 1
),
s3 AS (
    SELECT s2.start, s2.w, r.dst AS c, s2.path || '->' || r.dst AS path
    FROM s2
    JOIN deg d ON d.src = s2.c
    JOIN ranked r ON r.src = s2.c
     AND r.rk = cast(('0x' || substring(md5(
             concat('walk:3:', s2.w, ':', s2.start, ':', s2.c)), 1, 8))
             AS bigint) % d.deg + 1
)
SELECT start AS start_node, w AS walk_id, path FROM s3
"""


# ---------------------------------------------------------------------------
# round-6 wave: remaining TPC-H ask shapes + corpus-scaling text diagnostics
# + second-order graph structure
# ---------------------------------------------------------------------------


def q_rel_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join customer->orders with the filter INSIDE the join condition (an
    order excluded by priority must not delete its customer's zero row),
    count per customer, then histogram the counts. Two key-shuffles on
    sf-growing relations, both unhinted (AQE owns the strategy); the
    second aggregate's domain is the order-count range — bounded, tiny.
    All-integer output: no rounding surface."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        # count(col) skips the NULLs the outer join manufactures
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("int").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("n_custs"))


SQL_REL_CUSTDIST = """
WITH per AS (
    SELECT c_custkey, cast(count(o_orderkey) AS integer) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS n_custs FROM per GROUP BY c_count
"""


def q_rel_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total lineitem
    quantity exceeds a threshold, joined back to orders+customer. The
    per-order aggregate runs FIRST and its HAVING filter cuts the join
    input to the rare heavy orders (~1% here), so the two following
    joins carry only survivors — AQE is free to broadcast the filtered
    aggregate at runtime, which is the data-dependent decision a static
    hint cannot make. Quantities are integral doubles; the sum is exact
    below 2^53 and emitted via floor->bigint (DuckDB cast ROUNDS where
    Spark truncates, CLAUDE.md trap). The date is a wall-clock NTZ
    string — no timestamp output, no session TZ."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            F.floor(F.col("q")).cast("long").alias("total_qty"),
        )
    )


SQL_REL_LARGE_ORDERS = """
WITH big AS (
    SELECT l_orderkey, cast(floor(sum(l_quantity)) AS bigint) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_rel_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship count): distinct
    (part, supplier) pairs from lineitem (the partsupp stand-in), minus
    a NOT IN supplier exclusion set (negative balance = the complaint
    stand-in), grouped by part attributes with COUNT(DISTINCT supplier).
    The anti-join's build side grows with sf so it is UNHINTED (r04
    static-broadcast discipline); the distinct-pair shuffle is keyed on
    the pair itself, and the final distinct-count aggregate is Spark's
    two-phase partial_count(distinct) — no single-point set union.
    All-integer output."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    excl = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(excl, ps["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("MEDIUM%"))
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("int").alias("supplier_cnt"))
    )


SQL_REL_PARTS_SUPPLIER_CNT = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) AS integer) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'MEDIUM%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_rel_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (sales opportunity): customers whose balance beats
    the positive-balance average AND who placed no recent order, counted
    per nation. The average never materializes as a double: bal > avg is
    evaluated as the EXACT integer cross-multiplication
    cents * n > sum_cents (int64-safe: cents<=1e7 and n*cents<=1e7*n
    stays under 2^63 for n up to ~1e11 customers), so no engine can
    disagree at the threshold — the scalar aggregate rides a sanctioned
    one-row broadcast crossJoin. The recent-orders anti-join side is
    date-pruned at the scan (pushed predicate), then unhinted. Output is
    exact integer cents (MONEY.md class integer)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    cc = c.select("c_custkey", "c_nationkey", cents.alias("cents"))
    stats = (
        cc.filter(F.col("cents") > 0)
        .agg(F.sum("cents").alias("s"), F.count("*").alias("n"))
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cc.crossJoin(F.broadcast(stats))
        .filter(F.col("cents") * F.col("n") > F.col("s"))
        .join(recent, cc["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("cents").alias("total_bal_cents"),
        )
    )


SQL_REL_SALES_OPPORTUNITY = """
WITH cc AS (
    SELECT c_custkey, c_nationkey,
           cast(floor(c_acctbal * 100 + 0.5) AS bigint) AS cents
    FROM customer
),
stats AS (
    SELECT cast(sum(cents) AS bigint) AS s, count(*) AS n
    FROM cc WHERE cents > 0
)
SELECT c_nationkey, count(*) AS n_cust,
       cast(sum(cents) AS bigint) AS total_bal_cents
FROM cc, stats
WHERE cents * n > s
  AND c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
"""


def q_rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): top-10 unshipped orders by
    discounted revenue for one market segment. Both date predicates are
    NTZ-literal wall-clock comparisons pushed to the parquet scans
    (PushedFilters; no session TZ — the top_supplier discipline), the
    segment filter prunes customer before its join, and the top-10 is a
    TakeOrderedAndProject (per-partition heap + merge), never a global
    sort. Revenue sums 4dp-exact discounted prices (MONEY.md class
    grid); ties are broken by (date, orderkey) so the LIMIT frontier is
    deterministic on both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        .join(o.filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cutoff),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        )
        .agg(
            F.round(  # money: grid
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_date", "o_orderkey")
        .limit(10)
    )


SQL_REL_SHIPPING_PRIORITY = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_date
ORDER BY revenue DESC, o_date, o_orderkey
LIMIT 10
"""


def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-token count and total
    token count at ten doc-id prefix sizes — the corpus diagnostic that
    says whether more data still buys new vocabulary. The trick that
    makes it ONE pass instead of ten: vocab(t) = #{tokens whose FIRST
    doc_id <= t}, so one token->min(doc_id) aggregate (vocabulary-
    bounded) joined to a 10-row broadcast threshold relation replaces
    ten corpus scans. Token totals ride the same broadcast over per-doc
    counts (map-only + one keyed agg). Thresholds derive from
    max(doc_id) by exact integer div. All-integer output."""
    docs = load_parallel(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("mxid"))
    th = (
        spark.range(1, 11).select(F.col("id").cast("int").alias("k"))
        .crossJoin(F.broadcast(mx))
        .select("k", F.expr("(k * mxid) div 10").alias("threshold_doc"))
    )
    first = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vocab = (
        first.crossJoin(F.broadcast(th))
        .filter(F.col("first_doc") <= F.col("threshold_doc"))
        .groupBy("k", "threshold_doc")
        .agg(F.count("*").alias("vocab_size"))
    )
    per_doc = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    totals = (
        per_doc.crossJoin(F.broadcast(th))
        .filter(F.col("doc_id") <= F.col("threshold_doc"))
        .groupBy("k")
        .agg(F.sum("n").alias("n_tokens_seen"))
    )
    return vocab.join(totals, "k").select(
        "k", "threshold_doc", "vocab_size", "n_tokens_seen"
    )


SQL_TEXT_VOCAB_GROWTH = """
WITH mx AS (SELECT max(doc_id) AS mxid FROM documents),
th AS (
    SELECT cast(k AS integer) AS k, (k * mxid) // 10 AS threshold_doc
    FROM (SELECT unnest(range(1, 11)) AS k), mx
),
toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
first AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
v AS (
    SELECT k, threshold_doc, count(*) AS vocab_size
    FROM th JOIN first ON first_doc <= threshold_doc
    GROUP BY k, threshold_doc
),
dt AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
tt AS (
    SELECT k, cast(sum(n) AS bigint) AS n_tokens_seen
    FROM th JOIN dt ON doc_id <= threshold_doc
    GROUP BY k
)
SELECT v.k, v.threshold_doc, v.vocab_size, tt.n_tokens_seen
FROM v JOIN tt ON v.k = tt.k
"""


def q_text_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-length deciles over the corpus WITHOUT a global sort:
    the length HISTOGRAM (cardinality bounded by max document length,
    not corpus size) is cumulated with one unpartitioned window — safe
    precisely because its input is the bounded histogram — and decile d
    is the smallest length whose cumulative count reaches
    ceil(d*N/10), computed as the exact integer (d*N + 9) div 10 on
    both engines (discrete type-1 quantile: no interpolation, no float
    anywhere). This is how exact percentiles are done at 100 TB when
    the value domain is small-integer; approx_percentile is the fallback
    for unbounded domains. All-integer output."""
    docs = load_parallel(spark, sf_dir, "documents")
    per = docs.select(F.size(F.split("text", " ")).alias("len"))
    hist = per.groupBy("len").agg(F.count("*").alias("c"))
    w = (
        Window.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # unpartitioned window on the BOUNDED histogram, not the corpus
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = per.agg(F.count("*").alias("n"))
    th = (
        spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(n))
        .select("decile", F.expr("(decile * n + 9) div 10").alias("need"))
    )
    return (
        cum.crossJoin(F.broadcast(th))
        .filter(F.col("cum") >= F.col("need"))
        .groupBy("decile")
        .agg(F.min("len").alias("len_at_decile"))
    )


SQL_TEXT_LENGTH_DECILES = """
WITH per AS (
    SELECT len(string_split(text, ' ')) AS l FROM documents
),
hist AS (SELECT l, count(*) AS c FROM per GROUP BY l),
cum AS (SELECT l, sum(c) OVER (ORDER BY l) AS cum FROM hist),
n AS (SELECT count(*) AS n FROM per),
th AS (
    SELECT cast(d AS integer) AS decile, (d * n + 9) // 10 AS need
    FROM (SELECT unnest(range(1, 10)) AS d), n
)
SELECT decile, cast(min(l) AS integer) AS len_at_decile
FROM cum, th
WHERE cum >= need
GROUP BY decile
"""


def q_kg_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per entity node:
    c(v) = 2*T(v) / (deg(v)*(deg(v)-1)) — how much of each node's
    neighborhood is itself connected (community density vs star hubs).
    ONE persisted canonical pair relation feeds both consumers: degrees
    via an endpoint explode (each distinct pair contributes exactly one
    to each endpoint — the same count the symmetrized edge list gives)
    and triangles via the canonical wedge closure over the same three
    join legs — so the transcripts->mentions->distinct-pairs lineage
    materializes ONCE (the r06 review found the earlier form ran it
    twice, once per independent persist). Nodes below degree 2 are
    excluded (the coefficient is undefined). The ratio is a rational
    over integers, so it is emitted via exact integer HALF_UP ppm then
    /1e6 (MONEY.md class integer) — round(p/q, 6) is exactly the
    divergence class the money sweep removed."""
    p = persist_tracked(
        q_kg_cooccurrence(spark, sf_dir).select("surface_a", "surface_b")
    )
    deg = (
        p.select(F.explode(F.array("surface_a", "surface_b")).alias("src"))
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
    )
    tri = _triangle_counts(p)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, deg["src"] == tri["node"], "left")
        .select(
            F.col("src").alias("node"),
            F.col("deg").cast("int").alias("deg"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            (
                half_up_scaled("2 * coalesce(n_triangles, 0)",
                               "deg * (deg - 1)", 1_000_000)
                / F.lit(1000000.0)
            ).alias("clustering"),
        )
    )


SQL_KG_CLUSTERING_COEFF = f"""
WITH {_COOC_EDGES_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
tri AS (
    SELECT xy.sa AS a, xy.sb AS b, yz.sb AS c
    FROM cpairs xy
    JOIN cpairs yz ON yz.sa = xy.sb
    JOIN cpairs xz ON xz.sa = xy.sa AND xz.sb = yz.sb
),
tn AS (
    SELECT node, count(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY node
)
SELECT src AS node, cast(deg AS integer) AS deg,
       cast(coalesce(t, 0) AS bigint) AS n_triangles,
       ((4000000 * coalesce(t, 0) + deg * (deg - 1))
        // (2 * deg * (deg - 1))) / 1000000.0 AS clustering
FROM deg LEFT JOIN tn ON node = src
WHERE deg >= 2
"""


def q_kg_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the entity co-occurrence graph: Pearson
    correlation of (deg(src), deg(dst)) over the symmetrized edge list —
    one scalar that says whether hubs link to hubs (positive) or to
    leaves (negative). Same exact-integer-moment discipline as
    rel_corr_qty_price: the five moments are integer sums (squares as
    decimal(38,0) so no sf overflows them), cast to double only in the
    closed form, which is then identical IEEE arithmetic on both
    engines — never the partition-order-dependent corr() aggregate. One
    shuffle for degrees, one broadcast-free join per endpoint, one
    map-side-combined scalar aggregate."""
    edges = persist_tracked(_cooc_edges(spark, sf_dir))
    deg = persist_tracked(
        edges.groupBy("src").agg(F.count("*").alias("deg"))
    )
    dx = deg.select(F.col("src").alias("s"), F.col("deg").alias("x"))
    dy = deg.select(F.col("src").alias("d"), F.col("deg").alias("y"))
    e2 = (
        edges.join(dx, edges["src"] == dx["s"])
        .join(dy, edges["dst"] == dy["d"])
        .select("x", "y")
    )
    m = e2.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return m.select(
        F.col("n").alias("n_edges"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round((n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)), 6),  # money: irrational
        ).alias("assortativity"),
    )


SQL_KG_ASSORTATIVITY = f"""
WITH {_COOC_EDGES_CTE},
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
e2 AS (
    SELECT dx.deg AS x, dy.deg AS y
    FROM edges e
    JOIN deg dx ON dx.src = e.src
    JOIN deg dy ON dy.src = e.dst
),
mom AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM e2
)
SELECT cast(n AS bigint) AS n_edges,
       CASE WHEN cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double) > 0
             AND cast(n AS double) * cast(syy AS double)
                 - cast(sy AS double) * cast(sy AS double) > 0
            THEN round(
                (cast(n AS double) * cast(sxy AS double)
                 - cast(sx AS double) * cast(sy AS double))
                / (sqrt(cast(n AS double) * cast(sxx AS double)
                        - cast(sx AS double) * cast(sx AS double))
                   * sqrt(cast(n AS double) * cast(syy AS double)
                          - cast(sy AS double) * cast(sy AS double))), 6)
       END AS assortativity
FROM mom
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ROTATION CONTRACT v2 (r05; VERDICT r04 #6): the driver's correctness
# gate records only the FIRST 50 registry entries per round, so ordering
# is a coverage decision. Priority classes, highest first:
#   (1) new this round AND queries whose implementation or twin CHANGED
#       this round (a changed query always earns a fresh driver row);
#   (2) queries whose last driver row is oldest (currently the r03
#       cohort — everything the r04 window skipped);
#   (3) queries with fresh green r04 rows (fall outside first);
#   (4) the golden-twin DP chain (kg_tag_mentions_dp / kg_triples_dp /
#       kg_labels_dp) LAST when space is short: they are byte-pinned
#       against the compiled reference binary by pytest every run, so a
#       driver row adds the least marginal evidence.
# The r05 window = 34 new (wave 1-5) + 8 changed + 8 r03-stale rows.
# Deferred r03-stale rows, in order of least marginal evidence: queries
# byte/semantics-pinned by pytest or subsumed by an in-window sibling
# (kg_turn_text_equality/kg_mentions_markup: compiled-harness parity;
# kg_canonicalize_cc: CC pytest + dedup_cluster_assign r04 row;
# rel_rollup_orders: rel_cube_orders r05 row + rel_grouping_sets;
# eval_pr: eval_chunking/typing r04 rows; rel_events_asof/
# rel_lpc_distinct: semantics pytests; rel_orders_exists: the EXISTS
# class is pinned in-window by rel_supplier_waiting's correlated twin;
# plus constant/trivially-map-only queries).
QUERIES = {
    # --- (1) new this round (r06 wave) ---
    "rel_custdist": q_rel_custdist,
    "rel_large_orders": q_rel_large_orders,
    "rel_parts_supplier_cnt": q_rel_parts_supplier_cnt,
    "rel_sales_opportunity": q_rel_sales_opportunity,
    "rel_shipping_priority": q_rel_shipping_priority,
    "text_vocab_growth": q_text_vocab_growth,
    "text_length_deciles": q_text_length_deciles,
    "kg_clustering_coeff": q_kg_clustering_coeff,
    "kg_assortativity": q_kg_assortativity,
    # --- (1) new last round (r05 wave 5) ---
    "kg_random_walks": q_kg_random_walks,
    "text_source_overlap": q_text_source_overlap,
    "rel_nation_trade": q_rel_nation_trade,
    "rel_grouping_sets": q_rel_grouping_sets,
    "kg_pagerank_personalized": q_kg_pagerank_personalized,
    "dedup_minhash_estimate": q_dedup_minhash_estimate,
    "rel_order_gaps": q_rel_order_gaps,
    # --- (1) new this round (r05 wave 4) ---
    "rel_kmv_distinct": q_rel_kmv_distinct,
    "text_epoch_shuffle": q_text_epoch_shuffle,
    "kg_adamic_adar": q_kg_adamic_adar,
    "rel_supplier_waiting": q_rel_supplier_waiting,
    "rel_important_parts": q_rel_important_parts,
    "rel_top_supplier": q_rel_top_supplier,
    "text_contamination_frac": q_text_contamination_frac,
    "text_bigram_surprisal": q_text_bigram_surprisal,
    "rel_corr_qty_price": q_rel_corr_qty_price,
    "sim_ivf_recall": q_sim_ivf_recall,
    # --- (1) new this round (r05 waves 1-3) ---
    "kg_entity_pmi": q_kg_entity_pmi,
    "kg_common_neighbors": q_kg_common_neighbors,
    "kg_kcore": q_kg_kcore,
    "kg_degree_hist": q_kg_degree_hist,
    "kg_turn_dedup": q_kg_turn_dedup,
    "rel_cube_orders": q_rel_cube_orders,
    "rel_order_skyline": q_rel_order_skyline,
    "rel_events_retention": q_rel_events_retention,
    "text_tfidf_topk": q_text_tfidf_topk,
    "text_zipf_slope": q_text_zipf_slope,
    "sim_range_search": q_sim_range_search,
    "kg_triple_support": q_kg_triple_support,
    "text_substring_dedup": q_text_substring_dedup,
    "text_normalize": q_text_normalize,
    "text_domain_mix": q_text_domain_mix,
    "kg_two_hop": q_kg_two_hop,
    "dedup_jaccard_routed": q_dedup_jaccard_routed,
    # --- (1) changed this round (had r04 rows) ---
    "rel_rolling_spend": q_rel_rolling_spend,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_embedding_drop_stats": q_dedup_embedding_drop_stats,
    # --- (1) changed this round (stale since r03) ---
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_part_type_revenue": q_rel_part_type_revenue,
    "rel_small_qty_revenue": q_rel_small_qty_revenue,
    "rel_events_json_hourly": q_rel_events_json_hourly,
    "rel_events_range_join": q_rel_events_range_join,
    # --- (2) stale since r03 (r04 class-3 leftovers) ---
    "rel_event_sessions": q_rel_event_sessions,
    "rel_time_rollup": q_rel_time_rollup,
    # --- (2) stale since r03 (r04 class-4); the 50-row window ends
    #     at this section's LAST entry (text_winnow_fp) ---
    "kg_triples_exact": q_kg_triples_exact,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "text_winnow_fp": q_text_winnow_fp,
    # deferred from the r05 window to fit the wave-4 queries: stale-r03
    # queries byte/semantics-pinned by pytest or subsumed by an in-window
    # sibling (see the contract note above), then constant/trivially-
    # map-only/guarded-anchor queries pinned elsewhere
    "kg_canonicalize_cc": q_kg_canonicalize_cc,
    "kg_eval_pr": q_kg_eval_pr,
    "kg_cooccurrence": q_kg_cooccurrence,
    "kg_conversation_entities": q_kg_conversation_entities,
    "kg_vocab_semijoin": q_kg_vocab_semijoin,
    "kg_turn_text_equality": q_kg_turn_text_equality,
    "kg_mentions_markup": q_kg_mentions_markup,
    "rel_top_customers_window": q_rel_top_customers_window,
    "rel_order_revenue_join": q_rel_order_revenue_join,
    "rel_rollup_orders": q_rel_rollup_orders,
    "rel_customers_no_orders": q_rel_customers_no_orders,
    # kg_mentions_exact / kg_entity_link: their lineage is exercised
    # in-window by kg_triples_exact and raw-scan mentions carry an r04 row
    "kg_mentions_exact": q_kg_mentions_exact,
    "kg_entity_link": q_kg_entity_link,
    "rel_events_asof": q_rel_events_asof,
    "rel_lpc_distinct": q_rel_lpc_distinct,
    "rel_pivot_status": q_rel_pivot_status,
    "rel_orders_exists": q_rel_orders_exists,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "rel_setop_customers": q_rel_setop_customers,
    "text_token_count_bpe": q_text_token_count_bpe,
    "kg_transcripts": q_kg_transcripts,
    "kg_dict_core": q_kg_dict_core,
    # --- (3) green r04 rows: r04-new block ---
    "sim_kmeans_centroids": q_sim_kmeans_centroids,
    "sim_ivf_topk_kmeans": q_sim_ivf_topk_kmeans,
    "dedup_incremental": q_dedup_incremental,
    "text_pii_scrub": q_text_pii_scrub,
    "text_ngram_topk": q_text_ngram_topk,
    "text_length_histogram": q_text_length_histogram,
    "rel_event_funnel": q_rel_event_funnel,
    "rel_bloom_semijoin": q_rel_bloom_semijoin,
    "text_bm25_topk": q_text_bm25_topk,
    "text_chunk_overlap": q_text_chunk_overlap,
    "kg_pagerank": q_kg_pagerank,
    "rel_cms_heavy_hitters": q_rel_cms_heavy_hitters,
    "rel_scd2_merge": q_rel_scd2_merge,
    "kg_entity_resolution": q_kg_entity_resolution,
    "kg_triangles": q_kg_triangles,
    "text_weighted_sample": q_text_weighted_sample,
    "text_inverted_index": q_text_inverted_index,
    "kg_label_propagation": q_kg_label_propagation,
    "text_unigram_surprisal": q_text_unigram_surprisal,
    "rel_events_hopping": q_rel_events_hopping,
    "rel_constraint_check": q_rel_constraint_check,
    "rel_profile_columns": q_rel_profile_columns,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    # --- (3) green r04 rows: first-rowed in r04 ---
    "sim_topk_cosine": q_sim_topk_cosine,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_ivf_topk_nprobe": q_sim_ivf_topk_nprobe,
    "text_split_assign": q_text_split_assign,
    "text_stratified_sample": q_text_stratified_sample,
    "text_repetition": q_text_repetition,
    "dedup_cluster_assign": q_dedup_cluster_assign,
    "text_pack_bins": q_text_pack_bins,
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "mm_manifest_meta": q_mm_manifest_meta,
    "mm_frame_sample": q_mm_frame_sample,
    # --- (3) green r04 rows ---
    "dedup_apply_ngram": q_dedup_apply_ngram,
    "dedup_decontaminate": q_dedup_decontaminate,
    "dedup_jaccard_drop_stats": q_dedup_jaccard_drop_stats,
    "dedup_lsh_drop_stats": q_dedup_lsh_drop_stats,
    "dedup_minhash_verified": q_dedup_minhash_verified,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "kg_eval_chunking": q_kg_eval_chunking,
    "kg_eval_typing": q_kg_eval_typing,
    "kg_tag_mentions_raw": q_kg_tag_mentions_raw,
    "rel_acctbal_quantiles": q_rel_acctbal_quantiles,
    # --- (4) golden-twin DP chain (binary-pinned by pytest) ---
    "kg_tag_mentions_dp": q_kg_tag_mentions_dp,
    "kg_triples_dp": q_kg_triples_dp,
    "kg_labels_dp": q_kg_labels_dp,
}

# ROTATION CONTRACT v3 (r06): the driver's 50-row window is now DECLARED
# as an explicit list instead of being encoded in dict-literal order —
# the dict above keeps its historical wave grouping for readers, and
# this list is the single thing to edit each round. Composition rule
# unchanged (v2): (1) new this round, (2) implementation-or-twin changed
# this round (comment-only edits excluded), (3) oldest-stale driver
# rows, deferring the pytest/binary-pinned and subsumed queries listed
# in the v2 note when space is short.
_R06_WINDOW = [
    # (1) new this round — 9
    "rel_custdist", "rel_large_orders", "rel_parts_supplier_cnt",
    "rel_sales_opportunity", "rel_shipping_priority", "text_vocab_growth",
    "text_length_deciles", "kg_clustering_coeff", "kg_assortativity",
    # (2) changed this round — the four r05 driver-reds (HUGEINT-cast
    # twins + domain_mix ppm + top_supplier NTZ) ...
    "rel_cube_orders", "rel_important_parts", "rel_top_supplier",
    "text_domain_mix",
    # ... the r06 money-sweep ppm conversions (Spark + twin) ...
    "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_jaccard_routed",
    "dedup_apply_ngram", "dedup_cluster_assign", "dedup_minhash_verified",
    "dedup_incremental", "kg_common_neighbors", "text_token_stats",
    "text_quality", "text_langid", "text_repetition",
    "text_substring_dedup",
    # ... the pinned-broadcast removals (plan change, same rows) ...
    "rel_nation_trade", "rel_order_revenue_join", "rel_part_type_revenue",
    "rel_small_qty_revenue", "rel_supplier_waiting",
    # ... the shared-helper conversions of the LAST hand-expanded
    # HALF_UP sites (money.half_up_scaled; value-identical by
    # construction, windowed because implementation changed) ...
    "rel_pricing_summary", "rel_events_json_hourly", "rel_rolling_spend",
    "text_contamination_frac", "dedup_minhash_estimate", "rel_order_gaps",
    "text_source_overlap",
    # ... and kg_triangles (wedge closure extracted into the
    # _triangle_counts helper shared with kg_clustering_coeff)
    "kg_triangles",
    # (3) oldest-stale (r03 cohort) — 11; evicted to fit the helper
    # conversions, in the contract's least-marginal-evidence order: the
    # binary-pinned DP trio (rule 4), the guarded cosine anchor,
    # rel_events_asof / rel_lpc_distinct / rel_orders_exists (semantics
    # pytests; EXISTS class pinned in-window by rel_supplier_waiting),
    # and kg_cooccurrence (its full lineage incl. the final pair agg is
    # an executed subtree of in-window kg_clustering_coeff/kg_triangles)
    "kg_transcripts", "kg_dict_core", "kg_mentions_exact",
    "kg_entity_link", "kg_conversation_entities",
    "kg_vocab_semijoin", "rel_customers_no_orders",
    "rel_pivot_status", "rel_setop_customers", "rel_top_customers_window",
    "text_token_count_bpe",
]
assert len(_R06_WINDOW) == 50 and len(set(_R06_WINDOW)) == 50
assert set(_R06_WINDOW) <= set(QUERIES), sorted(set(_R06_WINDOW) - set(QUERIES))
QUERIES = {
    **{k: QUERIES[k] for k in _R06_WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in _R06_WINDOW},
}

ORACLE_SQL = {
    "rel_custdist": SQL_REL_CUSTDIST,
    "rel_large_orders": SQL_REL_LARGE_ORDERS,
    "rel_parts_supplier_cnt": SQL_REL_PARTS_SUPPLIER_CNT,
    "rel_sales_opportunity": SQL_REL_SALES_OPPORTUNITY,
    "rel_shipping_priority": SQL_REL_SHIPPING_PRIORITY,
    "text_vocab_growth": SQL_TEXT_VOCAB_GROWTH,
    "text_length_deciles": SQL_TEXT_LENGTH_DECILES,
    "kg_clustering_coeff": SQL_KG_CLUSTERING_COEFF,
    "kg_assortativity": SQL_KG_ASSORTATIVITY,
    "kg_random_walks": SQL_KG_RANDOM_WALKS,
    "text_source_overlap": SQL_TEXT_SOURCE_OVERLAP,
    "rel_nation_trade": SQL_REL_NATION_TRADE,
    "rel_grouping_sets": SQL_REL_GROUPING_SETS,
    "kg_pagerank_personalized": SQL_KG_PAGERANK_PERSONALIZED,
    "dedup_minhash_estimate": SQL_DEDUP_MINHASH_ESTIMATE,
    "rel_order_gaps": SQL_REL_ORDER_GAPS,
    "rel_kmv_distinct": SQL_REL_KMV_DISTINCT,
    "text_epoch_shuffle": SQL_TEXT_EPOCH_SHUFFLE,
    "kg_adamic_adar": SQL_KG_ADAMIC_ADAR,
    "rel_supplier_waiting": SQL_REL_SUPPLIER_WAITING,
    "rel_important_parts": SQL_REL_IMPORTANT_PARTS,
    "rel_top_supplier": SQL_REL_TOP_SUPPLIER,
    "text_contamination_frac": SQL_TEXT_CONTAMINATION_FRAC,
    "text_bigram_surprisal": SQL_TEXT_BIGRAM_SURPRISAL,
    "rel_corr_qty_price": SQL_REL_CORR_QTY_PRICE,
    "sim_ivf_recall": SQL_SIM_IVF_RECALL,
    "text_domain_mix": SQL_TEXT_DOMAIN_MIX,
    "kg_two_hop": SQL_KG_TWO_HOP,
    "kg_triple_support": SQL_KG_TRIPLE_SUPPORT,
    "text_substring_dedup": SQL_TEXT_SUBSTRING_DEDUP,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "kg_entity_pmi": SQL_KG_ENTITY_PMI,
    "kg_common_neighbors": SQL_KG_COMMON_NEIGHBORS,
    "kg_kcore": SQL_KG_KCORE,
    "kg_degree_hist": SQL_KG_DEGREE_HIST,
    "kg_turn_dedup": SQL_KG_TURN_DEDUP,
    "rel_cube_orders": SQL_REL_CUBE_ORDERS,
    "rel_order_skyline": SQL_REL_ORDER_SKYLINE,
    "rel_events_retention": SQL_REL_EVENTS_RETENTION,
    "text_tfidf_topk": SQL_TEXT_TFIDF_TOPK,
    "text_zipf_slope": SQL_TEXT_ZIPF_SLOPE,
    "sim_range_search": SQL_SIM_RANGE_SEARCH,
    "sim_kmeans_centroids": SQL_SIM_KMEANS_CENTROIDS,
    "sim_ivf_topk_kmeans": SQL_SIM_IVF_TOPK_KMEANS,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "text_pii_scrub": SQL_TEXT_PII_SCRUB,
    "text_ngram_topk": SQL_TEXT_NGRAM_TOPK,
    "text_length_histogram": SQL_TEXT_LENGTH_HISTOGRAM,
    "rel_event_funnel": SQL_REL_EVENT_FUNNEL,
    "rel_bloom_semijoin": SQL_REL_BLOOM_SEMIJOIN,
    "text_bm25_topk": SQL_TEXT_BM25_TOPK,
    "text_chunk_overlap": SQL_TEXT_CHUNK_OVERLAP,
    "kg_pagerank": SQL_KG_PAGERANK,
    "rel_cms_heavy_hitters": SQL_REL_CMS_HEAVY_HITTERS,
    "rel_scd2_merge": SQL_REL_SCD2_MERGE,
    "kg_entity_resolution": SQL_KG_ENTITY_RESOLUTION,
    "kg_triangles": SQL_KG_TRIANGLES,
    "text_weighted_sample": SQL_TEXT_WEIGHTED_SAMPLE,
    "text_inverted_index": SQL_TEXT_INVERTED_INDEX,
    "kg_label_propagation": SQL_KG_LABEL_PROPAGATION,
    "rel_rolling_spend": SQL_REL_ROLLING_SPEND,
    "text_unigram_surprisal": SQL_TEXT_UNIGRAM_SURPRISAL,
    "rel_events_hopping": SQL_REL_EVENTS_HOPPING,
    "rel_constraint_check": SQL_REL_CONSTRAINT_CHECK,
    "rel_profile_columns": SQL_REL_PROFILE_COLUMNS,
    # shares the plain jaccard twin: identical-output contract is the gate
    "dedup_jaccard_prefix": SQL_DEDUP_NGRAM_JACCARD,
    # in-budget routing picks the exact form at gate scale -> same twin
    "dedup_jaccard_routed": SQL_DEDUP_NGRAM_JACCARD,
    "kg_transcripts": SQL_KG_TRANSCRIPTS,
    "kg_dict_core": SQL_KG_DICT_CORE,
    "kg_mentions_exact": SQL_KG_MENTIONS_EXACT,
    "kg_entity_link": SQL_KG_ENTITY_LINK,
    "kg_canonicalize_cc": SQL_KG_CANONICALIZE_CC,
    "kg_triples_exact": SQL_KG_TRIPLES_EXACT,
    "kg_eval_pr": SQL_KG_EVAL_PR,
    "kg_eval_chunking": SQL_KG_EVAL_CHUNKING_TMPL.format(golden_dir=GOLDEN_DIR),
    "kg_eval_typing": SQL_KG_EVAL_TYPING_TMPL.format(golden_dir=GOLDEN_DIR),
    "kg_cooccurrence": SQL_KG_COOCCURRENCE,
    "kg_conversation_entities": SQL_KG_CONVERSATION_ENTITIES,
    "kg_vocab_semijoin": SQL_KG_VOCAB_SEMIJOIN,
    "kg_turn_text_equality": SQL_KG_TURN_TEXT_EQUALITY,
    # DP chain: twin = golden parquet from the Python oracle (see
    # autoner_spark/golden.py); DP parity vs the compiled reference binary
    # is additionally pinned in pytest (tests/test_reference_binary.py,
    # test_tagger_spark.py, test_golden.py).
    "kg_tag_mentions_dp": SQL_KG_TAG_MENTIONS_DP,
    "kg_tag_mentions_raw": SQL_KG_TAG_MENTIONS_RAW,
    "kg_triples_dp": SQL_KG_TRIPLES_DP,
    "kg_mentions_markup": SQL_KG_MENTIONS_MARKUP,
    "kg_labels_dp": SQL_KG_LABELS_DP,
    "rel_pricing_summary": SQL_REL_PRICING_SUMMARY,
    "rel_top_customers_window": SQL_REL_TOP_CUSTOMERS_WINDOW,
    "rel_order_revenue_join": SQL_REL_ORDER_REVENUE_JOIN,
    "rel_rollup_orders": SQL_REL_ROLLUP_ORDERS,
    "rel_setop_customers": SQL_REL_SETOP_CUSTOMERS,
    "rel_events_json_hourly": SQL_REL_EVENTS_JSON_HOURLY,
    "rel_part_type_revenue": SQL_REL_PART_TYPE_REVENUE,
    "rel_orders_exists": SQL_REL_ORDERS_EXISTS,
    "rel_customers_no_orders": SQL_REL_CUSTOMERS_NO_ORDERS,
    "rel_small_qty_revenue": SQL_REL_SMALL_QTY_REVENUE,
    "rel_pivot_status": SQL_REL_PIVOT_STATUS,
    "rel_acctbal_quantiles": SQL_REL_ACCTBAL_QUANTILES,
    "rel_event_sessions": SQL_REL_EVENT_SESSIONS,
    "rel_events_asof": SQL_REL_EVENTS_ASOF,
    "rel_events_range_join": SQL_REL_EVENTS_RANGE_JOIN,
    "rel_time_rollup": SQL_REL_TIME_ROLLUP,
    "rel_lpc_distinct": SQL_REL_LPC_DISTINCT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_apply_ngram": SQL_DEDUP_APPLY_NGRAM,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_minhash_verified": SQL_DEDUP_MINHASH_VERIFIED,
    "dedup_jaccard_drop_stats": SQL_DEDUP_JACCARD_DROP_STATS,
    "dedup_lsh_drop_stats": SQL_DEDUP_LSH_DROP_STATS,
    "dedup_embedding_drop_stats": SQL_DEDUP_EMBEDDING_DROP_STATS,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    "dedup_embedding_lsh": SQL_DEDUP_EMBEDDING_LSH,
    "dedup_decontaminate": SQL_DEDUP_DECONTAMINATE,
    "text_winnow_fp": SQL_TEXT_WINNOW_FP,
    "text_token_count_bpe": SQL_TEXT_TOKEN_COUNT_BPE,
    "sim_topk_cosine": SQL_SIM_TOPK_COSINE,
    "sim_ivf_topk": SQL_SIM_IVF_TOPK,
    "sim_ivf_topk_nprobe": SQL_SIM_IVF_TOPK_NPROBE,
    "text_split_assign": SQL_TEXT_SPLIT_ASSIGN,
    "text_stratified_sample": SQL_TEXT_STRATIFIED_SAMPLE,
    "text_repetition": SQL_TEXT_REPETITION,
    "dedup_cluster_assign": SQL_DEDUP_CLUSTER_ASSIGN,
    "text_pack_bins": SQL_TEXT_PACK_BINS,
    "text_token_stats": SQL_TEXT_TOKEN_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_langid": SQL_TEXT_LANGID,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "mm_manifest_meta": SQL_MM_MANIFEST_META,
    "mm_frame_sample": SQL_MM_FRAME_SAMPLE,
}
