""".ck reader round-trip + IOBES converter parity with the reference script."""

import subprocess
import sys
from pathlib import Path

from autoner_spark import synth
from autoner_spark.dictionary import build_trie
from autoner_spark.labels import label_transcripts, write_ck
from autoner_spark.sources.ck import parse_ck, read_ck_df
from autoner_spark.sources.iobes import iobes_to_ck

REF_SCRIPT = Path("/root/reference/preprocess_partial_ner/bioes_chunking.py")


def test_ck_round_trip(spark, tmp_path):
    trie = build_trie(synth.dict_spec())
    t = synth.synth_transcripts(spark, 8, partitions=2)
    labels = label_transcripts(t, trie).cache()
    out = str(tmp_path / "ck")
    write_ck(labels, out)

    back = read_ck_df(spark, out).collect()
    orig = sorted(
        (
            (tuple(r.tokens), tuple(r.boundary), tuple(r.types), tuple(r.safe))
            for r in labels.collect()
            if r.tokens  # empty turns have no <s>/<eof> block in the file
        )
    )
    got = sorted(
        (tuple(r.tokens), tuple(r.boundary), tuple(r.types), tuple(r.safe))
        for r in back
    )
    assert got == orig and got


def test_parse_ck_unknown_and_gold_variants():
    text = (
        "<s> O None S\n"
        "fast O None D\n"
        "scan O None D\n"
        "<eof> I None S\n\n\n"
        "<s> O None\n"
        "hash I Operator\n"
        "join O Operator\n"
        "<eof> I None\n"
    )
    s = parse_ck(text)
    assert len(s) == 2
    assert s[0]["boundary"] == [0, 0] and s[0]["safe"] == [False, False]
    assert s[1]["boundary"] == [1, -1] and s[1]["safe"] == [True, True]


def test_iobes_to_ck_matches_reference_script(tmp_path):
    lines = [
        "EU NNP B-ORG",  # actually S- in strict IOBES; exercise branches:
        "rejects VBZ O",
        "German JJ S-MISC",
        "call NN O",
        "",
        "Peter NNP B-PER",
        "Blackburn NNP E-PER",
        "",
        "BRUSSELS NNP S-LOC",
        "1996-08-22 CD O",
    ]
    (tmp_path / "in.iobes").write_text("".join(ln + "\n" for ln in lines))
    for flag in ([], ["--ignore_misc"]):
        ref_out = tmp_path / f"ref{'_m' if flag else ''}.ck"
        subprocess.run(
            [sys.executable, str(REF_SCRIPT), "--input",
             str(tmp_path / "in.iobes"), "--output", str(ref_out), *flag],
            check=True, capture_output=True,
        )
        ours = iobes_to_ck(lines, ignore_misc=bool(flag))
        assert ours == ref_out.read_text(), f"flag={flag}"
