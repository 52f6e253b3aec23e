"""Golden-file parity with the COMPILED reference binary.

Compiles /root/reference/src/generate.cpp (read-only source; build artifacts
go to a temp dir) and checks that our single-node oracle produces a
byte-identical `.ck` file on the synthetic corpus. This pins the oracle to
the reference's true semantics — including every load-order / case / DP /
serialization quirk — without copying any reference code.

Skipped automatically when no C++ toolchain is available.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.oracle import segment_dp, to_ck
from autoner_spark.textutil import tokenize_turn

GENERATE_CPP = Path("/root/reference/src/generate.cpp")


@pytest.fixture(scope="module")
def generate_bin(tmp_path_factory):
    if shutil.which("g++") is None or not GENERATE_CPP.exists():
        pytest.skip("no g++ or reference source available")
    build = tmp_path_factory.mktemp("refbin")
    binary = build / "generate"
    res = subprocess.run(
        [
            "g++", "-O2", "-fopenmp", "-std=c++11",
            f"-I{GENERATE_CPP.parent}", str(GENERATE_CPP), "-o", str(binary),
        ],
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        pytest.skip(f"reference binary failed to compile: {res.stderr[:500]}")
    return binary


def run_reference(binary: Path, workdir: Path, raw_lines: list[str],
                  spec) -> str:
    (workdir / "data").mkdir(exist_ok=True)
    (workdir / "data" / "stopwords.txt").write_text(
        "".join(w + "\n" for w in spec.stopwords)
    )
    (workdir / "core.txt").write_text(
        "".join(f"{t}\t{s}\n" for t, s in spec.core)
    )
    (workdir / "full.txt").write_text("".join(s + "\n" for s in spec.full))
    (workdir / "raw.txt").write_text("".join(ln + "\n" for ln in raw_lines))
    subprocess.run(
        [str(binary), "raw.txt", "core.txt", "full.txt", "out.ck"],
        cwd=workdir,
        check=True,
        capture_output=True,
    )
    return (workdir / "out.ck").read_text()


def test_oracle_matches_reference_binary_on_synthetic_corpus(
    generate_bin, tmp_path
):
    spec = synth.dict_spec()
    rows = synth.local_rows(n_convs=40)
    assert len(rows) > 400

    # The reference corpus format: one token per line, blank line = sentence
    # boundary (generate.cpp:23-32). One turn = one sentence.
    raw_lines: list[str] = []
    stream: list[str] = []
    for row in rows:
        toks = tokenize_turn(row["text"])
        raw_lines.extend(toks)
        raw_lines.append("")  # blank -> "\n" sentinel
        stream.extend(toks)
        stream.append("\n")

    ref_ck = run_reference(generate_bin, tmp_path, raw_lines, spec)

    trie = build_trie(spec)
    ours = to_ck(stream, segment_dp(stream, trie))
    # generate.cpp:38 writes fprintf("%s\n", ck) — one extra trailing newline
    assert ours + "\n" == ref_ck


def test_oracle_matches_reference_binary_edge_cases(generate_bin, tmp_path):
    spec = synth.dict_spec()
    edge_turns = [
        "hash join",                       # whole-turn entity
        "scan filter",                     # longer span beats prefix
        "fast scan filter",                # overlap: filtered vs entity
        "fast scan alpha",                 # filtered one-past-end boundary
        "fast scan shuffle",               # filtered then entity overwrite
        "stream",                          # multi-type surface
        "HASH JOIN ( shuffle )",           # upper form + separators
        "Hash Join",                       # uninserted case form
        "the vector",                      # stopword-containing core surface
        "the",                             # removed stopword unigram
        "Spark Foundation spark foundation",  # ORG no-lowercase
        "ADA LOVELACE ada lovelace",
        ", . ( ) ! ?",                     # separators only
        "window",                          # full-dict unigram -> filtered
        "window agg",                      # core beats filtered prefix
        "sort merge join slow merge merge batch",
        "scan scan scan",                  # repeated unigram entity
        "query plan group by vector clock",  # full-dict only turn
    ]
    raw_lines: list[str] = []
    stream: list[str] = []
    for text in edge_turns:
        toks = tokenize_turn(text)
        raw_lines.extend(toks)
        raw_lines.append("")
        stream.extend(toks)
        stream.append("\n")

    ref_ck = run_reference(generate_bin, tmp_path, raw_lines, spec)
    trie = build_trie(spec)
    ours = to_ck(stream, segment_dp(stream, trie))
    assert ours + "\n" == ref_ck


def test_oracle_matches_reference_binary_random_dicts(generate_bin, tmp_path):
    """Randomized (seeded) dictionaries + corpora vs the compiled binary:
    exercises case collisions, shared prefixes, PER/ORG flags, stopword
    removal and tie configurations beyond the curated fixtures."""
    import random

    from autoner_spark.dictionary import DictionarySpec

    words = ["a", "A", "ab", "AB", "b", "bc", "c", "the", "-", ",", "zz", "Qq"]
    types = ["T1", "T2", "PER", "ORG", "T1,T2"]
    for seed in range(5):
        rng = random.Random(1000 + seed)
        core = [
            (
                rng.choice(types),
                " ".join(rng.choices(words, k=rng.randint(1, 3))),
            )
            for _ in range(rng.randint(1, 8))
        ]
        full = [
            " ".join(rng.choices(words, k=rng.randint(1, 3)))
            for _ in range(rng.randint(0, 6))
        ]
        stop = rng.sample(["the", "a", "b"], k=rng.randint(0, 2))
        spec = DictionarySpec(core=core, full=full, stopwords=stop)

        raw_lines: list[str] = []
        stream: list[str] = []
        for _ in range(40):
            toks = rng.choices(words, k=rng.randint(0, 10))
            raw_lines.extend(toks)
            raw_lines.append("")
            stream.extend(toks)
            stream.append("\n")

        wd = tmp_path / f"rand{seed}"
        wd.mkdir()
        ref_ck = run_reference(generate_bin, wd, raw_lines, spec)
        trie = build_trie(spec)
        ours = to_ck(stream, segment_dp(stream, trie))
        assert ours + "\n" == ref_ck, f"seed {seed} diverged"
