"""End-to-end parity on the reference's REAL corpus (BC5CDR).

361,768 token lines / 20,217 sentences, 2,482 core + 6,877 full surfaces,
1,298 stopwords — the exact inputs `./autoner_train.sh` feeds bin/generate.
The oracle's .ck output must be byte-identical to the compiled binary's,
and the distributed Spark tagger must emit exactly the oracle's typed spans.

Skipped when the reference data or a C++ toolchain is unavailable.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

from autoner_spark.dictionary import build_trie, load_spec_from_files
from autoner_spark.oracle import segment_dp, to_ck

DATA = Path("/root/reference/data")
GENERATE_CPP = Path("/root/reference/src/generate.cpp")

pytestmark = pytest.mark.skipif(
    not (DATA / "BC5CDR" / "raw_text.txt").exists(),
    reason="reference data not available",
)


@pytest.fixture(scope="module")
def bc5cdr():
    spec = load_spec_from_files(
        str(DATA / "BC5CDR" / "dict_core.txt"),
        str(DATA / "BC5CDR" / "dict_full.txt"),
        str(DATA / "stopwords.txt"),
    )
    raw_lines = (
        (DATA / "BC5CDR" / "raw_text.txt").read_text().split("\n")
    )
    # getLine semantics: blank line -> "\n" token (generate.cpp:25-31);
    # drop the artificial final element from the trailing newline
    if raw_lines and raw_lines[-1] == "":
        raw_lines = raw_lines[:-1]
    stream = [ln if ln else "\n" for ln in raw_lines]
    return spec, stream


def test_bc5cdr_byte_for_byte_vs_binary(bc5cdr, tmp_path):
    if shutil.which("g++") is None or not GENERATE_CPP.exists():
        pytest.skip("no toolchain")
    spec, stream = bc5cdr
    binary = tmp_path / "generate"
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-std=c++11", f"-I{GENERATE_CPP.parent}",
         str(GENERATE_CPP), "-o", str(binary)],
        check=True, capture_output=True,
    )
    (tmp_path / "data").mkdir()
    shutil.copy(DATA / "stopwords.txt", tmp_path / "data" / "stopwords.txt")
    subprocess.run(
        [str(binary),
         str(DATA / "BC5CDR" / "raw_text.txt"),
         str(DATA / "BC5CDR" / "dict_core.txt"),
         str(DATA / "BC5CDR" / "dict_full.txt"),
         "out.ck"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    ref_ck = (tmp_path / "out.ck").read_text()

    trie = build_trie(spec)
    ours = to_ck(stream, segment_dp(stream, trie))
    assert ours + "\n" == ref_ck


def test_bc5cdr_spark_tagger_matches_oracle(spark, bc5cdr):
    """Sentences become turns; the distributed tagger's typed spans must
    equal the oracle's on the full corpus."""
    from autoner_spark.oracle import tag_turn
    from autoner_spark.tagger import tag_transcripts

    spec, stream = bc5cdr
    trie = build_trie(spec)

    # split the global stream into sentences at "\n" sentinels
    sentences: list[list[str]] = [[]]
    for tok in stream:
        if tok == "\n":
            sentences.append([])
        else:
            sentences[-1].append(tok)
    sentences = [s for s in sentences if s]

    rows = [
        (f"conv-{i // 50:05d}", i % 50, "user", " ".join(s), None, None)
        for i, s in enumerate(sentences)
    ]
    gold = set()
    for conv_id, turn_idx, _r, text, _t, _ts in rows:
        toks = [t for t in text.split(" ") if t]
        for m in tag_turn(toks, trie):
            gold.add((conv_id, turn_idx, m.begin_tok, m.end_tok, m.entity_type))

    from autoner_spark.synth import TRANSCRIPTS_DDL

    df = spark.createDataFrame(rows, TRANSCRIPTS_DDL).repartition(8)
    got = {
        (r.conv_id, r.turn_idx, r.begin_tok, r.end_tok, r.entity_type)
        for r in tag_transcripts(df, trie).collect()
    }
    assert len(gold) > 10_000  # real corpus produces a lot of mentions
    assert got == gold


def test_reproduces_published_dictionary_match_row(spark):
    """The README's published 'Dictionary Match' row (README.md:38:
    P 93.93 / R 58.35 / F1 71.98 on the BC5CDR test gold set) must be
    reproduced EXACTLY by the distributed tagger + the distributed
    evaluation operator — external validation of both against the paper."""
    from autoner_spark.evaluate import span_prf
    from autoner_spark.sources.ck import parse_ck
    from autoner_spark.synth import TRANSCRIPTS_DDL
    from autoner_spark.tagger import tag_transcripts

    spec = load_spec_from_files(
        str(DATA / "BC5CDR" / "dict_core.txt"),
        str(DATA / "BC5CDR" / "dict_full.txt"),
        str(DATA / "stopwords.txt"),
    )
    trie = build_trie(spec)
    sentences = parse_ck((DATA / "BC5CDR" / "truth_test.ck").read_text())

    # gold typed spans via the reference's to_typed_span chunk decode
    # (ner.py:176-238): Break starts a chunk, Ties extend it, typed chunks
    # only
    gold_rows = []
    rows = []
    for si, s in enumerate(sentences):
        conv_id, turn_idx = f"s-{si // 100:04d}", si % 100
        rows.append((conv_id, turn_idx, "user", " ".join(s["tokens"]),
                     None, None))
        toks, b, ty = s["tokens"], s["boundary"], s["types"]
        i, n = 0, len(toks)
        while i < n:
            if b[i] == 1:
                j = i + 1
                while j < n and b[j] == -1:
                    j += 1
                if ty[i] != "None":
                    gold_rows.append((conv_id, turn_idx, i, j, ty[i]))
                i = j
            else:
                i += 1

    df = spark.createDataFrame(rows, TRANSCRIPTS_DDL).repartition(8)
    pred = tag_transcripts(df, trie)
    gold = spark.createDataFrame(
        gold_rows,
        "conv_id string, turn_idx int, begin_tok int, end_tok int, "
        "entity_type string",
    )
    s = span_prf(pred, gold)
    assert abs(s["precision"] - 0.9393) < 5e-5, s
    assert abs(s["recall"] - 0.5835) < 5e-5, s
    assert abs(s["f1"] - 0.7198) < 5e-5, s
