"""IOBES -> .ck gold-label converter (E8; preprocess_partial_ner/
bioes_chunking.py:11-81).

Faithful to the reference state machine, including its quirks: the first
token of a sentence always gets file-label 'I' (Break); B-/S- start a new
chunk ('I'), I-/E- continue one ('O'); MISC labels can be ignored; output
is the 3-column gold .ck variant (no S/D column); the writer emits
'<eof> I None' + blank line between sentences and a trailing final line
matching the reference's end-of-file branch.
"""

from __future__ import annotations


def iobes_to_ck(lines: list[str], ignore_misc: bool = False) -> str:
    out: list[str] = []
    start = False
    already_ends = False
    for line in lines:
        if not line.strip() or line.startswith("-DOCSTART-"):
            if start:
                out.append("<eof> I None\n\n")
            else:
                out.append("\n")
            start = False
            continue
        tups = line.split()
        label = tups[-1]
        if not start:
            if label == "O" or (ignore_misc and label.endswith("MISC")):
                out.append("<s> O None\n" + tups[0] + " I None\n")
            else:
                out.append(
                    "<s> O None\n" + tups[0] + " I " + label.split("-")[-1] + "\n"
                )
                if label.startswith(("S-", "E-")):
                    already_ends = True
            start = True
        else:
            out.append(tups[0])
            if ignore_misc and label.endswith("MISC"):
                out.append(" I None\n")
            elif label.startswith("B-"):
                out.append(" I " + label.split("-")[-1] + "\n")
                already_ends = False
            elif label.startswith("S-"):
                out.append(" I " + label.split("-")[-1] + "\n")
                already_ends = True
            elif label.startswith("E-"):
                out.append(" O " + label.split("-")[-1] + "\n")
                already_ends = True
            elif label.startswith("I-"):
                out.append(" O " + label.split("-")[-1] + "\n")
                already_ends = False
            else:
                # reference writes ' I None' in both remaining branches
                out.append(" I None\n")
                already_ends = False
    if start:
        out.append("<eof> I None\n")
    else:
        out.append("\n")
    return "".join(out)
