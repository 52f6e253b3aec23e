"""Text primitives matching the reference's C utility semantics.

These re-implement, in Python, the exact behavior of the reference helpers in
``/root/reference/src/utils.h`` (cited per function). The fidelity matters: the
distant-supervision tagger's output is sensitive to tokenization, case folding
(ASCII-only, C locale), the whitespace-stripping quirk (keeps one char of
all-space strings), and the separator classification used when serializing
Tie-or-Break labels.
"""

from __future__ import annotations

# Mirrors `SEPARATORS` at utils.h:161.
SEPARATORS = "/.,-()!?~@#$%^&*[]\n"
_SEPARATOR_SET = set(SEPARATORS)

# C `isspace` in the default locale: space, \t, \n, \v, \f, \r.
_C_SPACE = set(" \t\n\v\f\r")

_LOWER_TO_UPPER = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_UPPER_TO_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

FILTERED_TYPE = "__FILTERED__"  # annotation.h:9


def ascii_upper(s: str) -> str:
    """ASCII-only uppercase — mirrors `toUpper` (utils.h:143-150, C toupper)."""
    return s.translate(_LOWER_TO_UPPER)


def ascii_lower(s: str) -> str:
    """ASCII-only lowercase — mirrors `toLower` (utils.h:152-159, C tolower)."""
    return s.translate(_UPPER_TO_LOWER)


def capitalize_first(s: str) -> str:
    """Mirror of `token[0] = toupper(token[0])` (annotation.h:229): only the
    first char is upcased; the rest is untouched."""
    if not s:
        return s
    return ascii_upper(s[0]) + s[1:]


def is_c_space(ch: str) -> bool:
    return ch in _C_SPACE


def is_separator_char(ch: str) -> bool:
    """Mirrors `isSeparator(char)` (utils.h:163-172)."""
    return ch in _C_SPACE or ch in _SEPARATOR_SET


def is_separator_token(token: str) -> bool:
    """Mirrors `isSeparator(const string&)` (utils.h:174-177): single char
    that is whitespace or in SEPARATORS."""
    return len(token) == 1 and is_separator_char(token)


def is_real_separator(token: str) -> bool:
    """Mirrors `isRealSeparator` (utils.h:179-183): ONLY the sentence
    sentinel (the second return is dead code in the reference)."""
    return token == "\n"


def strip_ref(s: str) -> str:
    """Mirrors `strip` (utils.h:109-119).

    Quirk preserved: the loops stop at ``l < r`` so an all-whitespace string
    keeps exactly one character, and a 1-char string is returned unchanged.
    """
    l, r = 0, len(s) - 1
    while l < r and is_c_space(s[l]):
        l += 1
    while l < r and is_c_space(s[r]):
        r -= 1
    return s[l : r + 1]


def split_by(s: str, sep: str) -> list[str]:
    """Mirrors `splitBy` (utils.h:72-90): split on a single char, dropping
    empty fields (consecutive separators collapse; no empty tokens)."""
    return [t for t in s.split(sep) if t]


def simple_tokenize(s: str) -> list[str]:
    """Char-class tokenizer — mirrors `simpleTokenize` (utils.h:195-231).

    Every separator char (C isspace or SEPARATORS) becomes its OWN
    single-char token; maximal runs of non-separator chars become tokens.
    Length-preserving: ''.join(result) == s (the reference asserts this).
    """
    ret: list[str] = []
    token: list[str] = []
    for ch in s:
        if is_separator_char(ch):
            if token:
                ret.append("".join(token))
                token = []
            ret.append(ch)
        else:
            token.append(ch)
    if token:
        ret.append("".join(token))
    return ret


def simple_tokenize_non_sep(s: str, keep_capital: bool = False) -> list[str]:
    """Mirrors `simpleTokenizeNonSep` (utils.h:233-247): char-class
    tokenize, drop separator tokens EXCEPT the "\\n" sentinel
    (isRealSeparator), and lowercase unless ``keep_capital``."""
    out: list[str] = []
    for tok in simple_tokenize(s):
        if is_separator_token(tok) and not is_real_separator(tok):
            continue
        out.append(tok if keep_capital else ascii_lower(tok))
    return out


def tokenize_turn(text: str) -> list[str]:
    """One transcript turn -> token list.

    The reference corpus is pre-tokenized one token per line
    (generate.cpp:23-32); per BASELINE.json's input_hint the transcript
    `text` is whitespace-pre-tokenized, so one turn = one sentence and
    splitting on spaces (dropping empties) reproduces the token stream.
    """
    return [t for t in text.split(" ") if t]
