"""Distributed distant-supervision tagger (the production path).

Runs the reference's deterministic dictionary-match tagger
(src/string_match.h:21-99 + src/annotation.h:267-317 span semantics) over an
Iceberg/parquet transcripts table, Spark-first:

* the KB trie is compiled to a nested-dict automaton on the driver and
  **broadcast** once per job (the Spark analogue of the reference's single
  shared in-memory trie, annotation.h:22);
* tagging is embarrassingly parallel over turns (a turn = a sentence; the
  reference's "\\n" sentinel barrier at string_match.h:35-37 becomes
  structural), so it runs as ONE narrow `mapInPandas` stage — Arrow batches
  in, Arrow batches out, no shuffle, no per-row Python UDF;
* the inner DP is a from-scratch optimized implementation, deliberately
  independent from the readable oracle in ``autoner_spark.oracle`` so the
  pytest parity suite cross-checks two implementations (plus the compiled
  reference binary where a toolchain exists).

Scale notes (100 TB / 10^12 turns): the stage is map-only — throughput scales
linearly with executors; the only broadcast is the compiled trie (MBs for
dictionary sizes like BC5CDR's 9.4k surfaces). Input should arrive bucketed /
partitioned by ``conv_id`` so downstream per-conversation assembly avoids a
shuffle; the tagger itself is partitioning-agnostic and deterministic per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .dictionary import TrieKB
from .textutil import (
    FILTERED_TYPE,
    is_separator_char,
    simple_tokenize_non_sep,
)

# Turn-text tokenizers for the distributed tagger. "whitespace" is the
# pre-tokenized input_hint path (generate.cpp:23-32 consumes one token per
# line; per-turn text is space-joined tokens). "charclass" is the raw-text
# ingestion path: the reference's simpleTokenizeNonSep (utils.h:195-247,
# keepCapital so the trie's case-variant matching stays authoritative).
TOKENIZERS = {
    "whitespace": lambda x: [w for w in x.split(" ") if w],
    "charclass": lambda x: simple_tokenize_non_sep(x, keep_capital=True),
}

MENTIONS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("begin_tok", IntegerType(), False),
        StructField("end_tok", IntegerType(), False),
        StructField("surface", StringType(), False),
        StructField("entity_type", StringType(), False),
    ]
)

# Compiled automaton node layout: (children: dict[int, node] | None,
# kind: 0 none / 1 entity / 2 filtered, type_str: comma-joined sorted types).
# Children are keyed by INTERNED TOKEN IDS, not strings: each input token is
# hashed once per turn (vocab lookup); the DP walk then runs on small-int
# dict lookups — less string hashing and less memory traffic in the hot loop.
_KIND_NONE, _KIND_ENTITY, _KIND_FILTERED = 0, 1, 2

NEWLINE_ID = -2  # sentinel id for "\n" (never a trie edge; breaks the walk)
UNKNOWN_ID = -1  # token absent from the trie vocabulary


def compile_trie(trie: TrieKB) -> dict[str, Any]:
    """Flatten a TrieKB into int-keyed nested dicts + a token vocabulary.

    kind mirrors isEntity/isFiltered (annotation.h:39-45); type_str is the
    comma-joined sorted type set (the std::set iteration order used at
    string_match.h:70-76).
    """
    vocab: dict[str, int] = {}

    def tok_id(tok: str) -> int:
        i = vocab.get(tok)
        if i is None:
            i = len(vocab)
            vocab[tok] = i
        return i

    def build(u: int) -> tuple[dict | None, int, str]:
        kids = {
            tok_id(tok): build(v) for tok, v in trie.children[u].items()
        } or None
        t = trie.types[u]
        if len(t) > 0 and FILTERED_TYPE not in t:
            kind, ts = _KIND_ENTITY, ",".join(sorted(t))
        elif len(t) == 1 and FILTERED_TYPE in t:
            kind, ts = _KIND_FILTERED, FILTERED_TYPE
        else:
            kind, ts = _KIND_NONE, ""
        return (kids, kind, ts)

    root = build(0)
    # "\n" can legally appear as a trie edge (a dict surface containing a
    # newline token is pathological but constructible); the reference's DP
    # breaks on "\n" BEFORE descending (string_match.h:35-37), so mapping it
    # to NEWLINE_ID preserves semantics even then.
    vocab["\n"] = NEWLINE_ID
    return {"root": root, "vocab": vocab}


def tag_tokens_compiled(
    tokens: list[str], compiled: dict[str, Any], weight: float = 1.0
) -> list[tuple[int, int, str, str]]:
    """DP segmentation + mention extraction against a compiled trie.

    Exact semantics of segmentDP (string_match.h:21-89: strict-improvement
    updates, len^2 core score, weight*len^2 filtered score, trie walk never
    crossing "\\n") followed by the entity-span extraction rules of
    annotation.h:267-317 (separator-skip; FILTERED/empty segments are not
    mentions). Returns (begin_tok, end_tok, surface, entity_type) tuples.
    """
    n = len(tokens)
    if n == 0:
        return []
    vocab = compiled["vocab"]
    vget = vocab.get
    ids = [vget(t, UNKNOWN_ID) for t in tokens]
    root_children = compiled["root"][0]
    if root_children is None or not any(
        t >= 0 and t in root_children for t in ids
    ):
        # no token starts any dictionary path: the DP degenerates to
        # all-skip segmentation -> zero mentions. Real transcript corpora
        # are sparse (most turns mention nothing), so this prunes the
        # whole DP allocation + loop for them.
        return []
    f = [-1.0] * (n + 1)
    f[0] = 0.0
    tb_i = [0] * (n + 1)
    tb_t: list[tuple[int, str]] = [(0, "")] * (n + 1)  # (kind, type_str)

    for i in range(n):
        fi = f[i]
        if fi > f[i + 1]:
            f[i + 1] = fi
            tb_i[i + 1] = i
            tb_t[i + 1] = (_KIND_NONE, "")
        node_children = root_children
        if node_children is None:
            continue
        for j in range(i, n):
            tid = ids[j]
            if tid < 0:
                if tid == NEWLINE_ID:
                    break  # "\n" barrier checked BEFORE descending
                # unknown token: not "\n", but also not a trie edge
                break
            nxt = node_children.get(tid)
            if nxt is None:
                break
            kids, kind, ts = nxt
            if kind:
                d = j - i + 1
                score = fi + d * d if kind == _KIND_ENTITY else fi + weight * d * d
                if f[j + 1] < score:
                    f[j + 1] = score
                    tb_i[j + 1] = i
                    tb_t[j + 1] = (kind, ts)
            node_children = kids
            if node_children is None:
                break

    out: list[tuple[int, int, str, str]] = []
    j = n
    while j > 0:
        i = tb_i[j]
        kind, ts = tb_t[j]
        if kind == _KIND_ENTITY:
            # separator-skip (annotation.h:272-274): a span whose
            # concatenation is a single separator char (and not "\n")
            # never becomes an entity span.
            if not (
                j - i == 1
                and len(tokens[i]) == 1
                and tokens[i] != "\n"
                and is_separator_char(tokens[i])
            ):
                out.append((i, j, " ".join(tokens[i:j]), ts))
        j = i
    out.reverse()
    return out


def tag_transcripts(
    transcripts: DataFrame,
    trie: TrieKB,
    weight: float = 1.0,
    spark: SparkSession | None = None,
    passthrough: tuple[str, ...] = (),
    tokenizer: str = "whitespace",
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) -> mentions DataFrame.

    One narrow mapInPandas stage over Arrow batches; the compiled trie is
    broadcast. Column pruning: only (conv_id, turn_idx, text) plus any
    ``passthrough`` columns are read, so a parquet/Iceberg scan prunes the
    rest at the source. ``passthrough`` columns (e.g. ``ts`` for streaming
    watermarks) are copied onto each emitted mention. Works on both batch
    and streaming DataFrames (the stage is stateless).
    """
    spark = spark or transcripts.sparkSession
    compiled = compile_trie(trie)

    if not passthrough and tokenizer == "whitespace":
        # hottest path: fully vectorized batch engine (Arrow + NumPy, no
        # per-token Python) — semantics pinned to tag_tokens_compiled by
        # tests/test_tagvec_parity.py and the oracle/binary parity suite
        from . import tagvec

        bc_vec = spark.sparkContext.broadcast(tagvec.compile_vec(compiled))

        def tag_arrow_vec(batches):
            vec = bc_vec.value
            for batch in batches:
                yield tagvec.tag_record_batch(batch, vec, weight)

        return transcripts.select("conv_id", "turn_idx", "text").mapInArrow(
            tag_arrow_vec, MENTIONS_SCHEMA
        )

    bc = spark.sparkContext.broadcast(compiled)
    tokenize = TOKENIZERS[tokenizer]

    if not passthrough:
        # hot path: mapInArrow skips the Arrow<->pandas conversions on both
        # sides (~35% faster end-to-end than mapInPandas for this stage).
        import pyarrow as pa

        out_pa = pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("begin_tok", pa.int32()),
                pa.field("end_tok", pa.int32()),
                pa.field("surface", pa.string()),
                pa.field("entity_type", pa.string()),
            ]
        )

        def tag_arrow(batches):
            comp = bc.value
            for batch in batches:
                conv = batch.column(0).to_pylist()
                turn = batch.column(1).to_pylist()
                text = batch.column(2).to_pylist()
                cc: list[str] = []
                tt: list[int] = []
                bb: list[int] = []
                ee: list[int] = []
                ss: list[str] = []
                yy: list[str] = []
                for c, t, x in zip(conv, turn, text):
                    if not x:
                        continue
                    tokens = tokenize(x)
                    for b, e, surf, ts in tag_tokens_compiled(tokens, comp, weight):
                        cc.append(c)
                        tt.append(t)
                        bb.append(b)
                        ee.append(e)
                        ss.append(surf)
                        yy.append(ts)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cc, pa.string()),
                        pa.array(tt, pa.int32()),
                        pa.array(bb, pa.int32()),
                        pa.array(ee, pa.int32()),
                        pa.array(ss, pa.string()),
                        pa.array(yy, pa.string()),
                    ],
                    schema=out_pa,
                )

        return transcripts.select("conv_id", "turn_idx", "text").mapInArrow(
            tag_arrow, MENTIONS_SCHEMA
        )

    in_cols = ["conv_id", "turn_idx", "text", *passthrough]
    out_schema = StructType(
        list(MENTIONS_SCHEMA.fields)
        + [transcripts.schema[c] for c in passthrough]
    )

    def tag_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled = bc.value
        for pdf in batches:
            conv_ids: list[str] = []
            turn_idxs: list[int] = []
            begins: list[int] = []
            ends: list[int] = []
            surfaces: list[str] = []
            etypes: list[str] = []
            extra: dict[str, list] = {c: [] for c in passthrough}
            pass_vals = [pdf[c].values for c in passthrough]
            for i, (conv_id, turn_idx, text) in enumerate(
                zip(pdf["conv_id"].values, pdf["turn_idx"].values,
                    pdf["text"].values)
            ):
                if not text:
                    continue
                tokens = tokenize(text)
                for b, e, surf, ts in tag_tokens_compiled(tokens, compiled, weight):
                    conv_ids.append(conv_id)
                    turn_idxs.append(int(turn_idx))
                    begins.append(b)
                    ends.append(e)
                    surfaces.append(surf)
                    etypes.append(ts)
                    for c, vals in zip(passthrough, pass_vals):
                        extra[c].append(vals[i])
            data = {
                "conv_id": pd.Series(conv_ids, dtype="object"),
                "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                "begin_tok": pd.Series(begins, dtype="int32"),
                "end_tok": pd.Series(ends, dtype="int32"),
                "surface": pd.Series(surfaces, dtype="object"),
                "entity_type": pd.Series(etypes, dtype="object"),
            }
            for c in passthrough:
                data[c] = pd.Series(extra[c])
            yield pd.DataFrame(data)

    return transcripts.select(*in_cols).mapInPandas(tag_batches, out_schema)
