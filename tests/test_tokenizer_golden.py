"""Char-class tokenizer (M12) golden tests: compile a tiny harness around
the REFERENCE's utils.h (simpleTokenize / simpleTokenizeNonSep,
utils.h:195-247) and diff token streams against the Python
reimplementation, including randomized inputs."""

import random
import shutil
import string
import subprocess
from pathlib import Path

import pytest

from autoner_spark.textutil import simple_tokenize, simple_tokenize_non_sep

REF_SRC = Path("/root/reference/src")

HARNESS = r"""
#include "utils.h"
#include <iostream>
using namespace std;
int main(int argc, char** argv) {
    bool nonsep = argc > 1 && string(argv[1]) == string("nonsep");
    bool keepcap = argc > 2 && string(argv[2]) == string("keep");
    string line;
    while (getline(cin, line)) {
        vector<string> toks = nonsep
            ? Utils::simpleTokenizeNonSep(line, keepcap)
            : Utils::simpleTokenize(line);
        cout << "#" << toks.size() << "\n";
        for (const string& t : toks) cout << t << "\n";
    }
    return 0;
}
"""

CASES = [
    "Hello, world! This is a (test) -- with/separators.",
    "nospaceshere",
    "a.b,c-d(e)f!g?h~i@j#k$l%m^n&o*p[q]r",
    "  leading and   multiple   spaces ",
    "trailing-",
    ".",
    "",
    "tabs\tand\tmore",
    "UPPER Case MiXeD lower",
    "digits 123 mix3d t0kens 4-5.6",
]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if shutil.which("g++") is None or not (REF_SRC / "utils.h").exists():
        pytest.skip("no g++ or reference source available")
    d = tmp_path_factory.mktemp("tok_harness")
    (d / "main.cpp").write_text(HARNESS)
    exe = d / "tok"
    res = subprocess.run(
        ["g++", "-O2", "-fopenmp", "-std=c++11", "-I", str(REF_SRC),
         "-o", str(exe), str(d / "main.cpp")],
        capture_output=True, text=True,
    )
    if res.returncode != 0:
        pytest.skip(f"harness failed to compile: {res.stderr[:500]}")
    return exe


def run_ref(exe, lines, mode=None, keep=False):
    args = [str(exe)]
    if mode:
        args.append(mode)
        if keep:
            args.append("keep")
    out = subprocess.run(
        args, input="\n".join(lines) + "\n", capture_output=True, text=True
    ).stdout.splitlines()
    result, i = [], 0
    while i < len(out):
        assert out[i].startswith("#")
        n = int(out[i][1:])
        result.append(out[i + 1 : i + 1 + n])
        i += 1 + n
    return result


def test_simple_tokenize_matches_reference(harness):
    got = run_ref(harness, CASES)
    for line, ref in zip(CASES, got):
        assert simple_tokenize(line) == ref, repr(line)
        assert "".join(simple_tokenize(line)) == line  # length invariant


def test_non_sep_matches_reference(harness):
    for keep in (False, True):
        got = run_ref(harness, CASES, mode="nonsep", keep=keep)
        for line, ref in zip(CASES, got):
            assert simple_tokenize_non_sep(line, keep_capital=keep) == ref, \
                (repr(line), keep)


def test_randomized_inputs_match_reference(harness):
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + "/.,-()!?~@#$%^&*[] \t"
    lines = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(200)
    ]
    # getline-based harness: drop anything the shell protocol can't carry
    lines = [ln for ln in lines if ln.strip("\t ")]
    got = run_ref(harness, lines)
    got_ns = run_ref(harness, lines, mode="nonsep")
    for line, ref, ref_ns in zip(lines, got, got_ns):
        assert simple_tokenize(line) == ref, repr(line)
        assert simple_tokenize_non_sep(line) == ref_ns, repr(line)
