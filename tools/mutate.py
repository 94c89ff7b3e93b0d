#!/usr/bin/env python3
"""Sequence mutation generator (capability of reference mutate.py:1-68).

Copies a DNA/protein sequence file applying, per character:
  5% deletion, 2% insertion, 5% substitution
against the matching alphabet.  FASTA header lines are preserved.  The
output is written next to the input as ``mutated_<name>`` and the
mutation counts are printed.

Usage: python tools/mutate.py [dna|protein] <file>
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import constants  # noqa: E402

P_DELETE = 0.05
P_INSERT = 0.02
P_SUBSTITUTE = 0.05


def mutate_char(ch: str, letters: str, rng: random.Random):
    """Returns (replacement string, kind) where kind is one of
    None/'del'/'ins'/'sub'."""
    r = rng.random()
    if r < P_DELETE:
        return "", "del"
    if r < P_DELETE + P_INSERT:
        return ch + rng.choice(letters), "ins"
    if r < P_DELETE + P_INSERT + P_SUBSTITUTE:
        choices = letters.replace(ch.upper(), "")
        return rng.choice(choices), "sub"
    return ch, None


def main(argv: list[str]) -> int:
    if len(argv) != 3 or argv[1] not in ("dna", "protein"):
        print(__doc__)
        return 1
    seq_type = argv[1]
    path = argv[2]
    letters = "".join(
        constants.DNA_ALPHABET[:-1]
        if seq_type == "dna"
        else constants.PROTEIN_ALPHABET[:-1]
    )
    rng = random.Random()

    counts = {"del": 0, "ins": 0, "sub": 0}
    out_lines = []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                out_lines.append(line)
                continue
            body = []
            for ch in line:
                if ch.upper() not in letters:
                    body.append(ch)
                    continue
                repl, kind = mutate_char(ch, letters, rng)
                body.append(repl)
                if kind:
                    counts[kind] += 1
            out_lines.append("".join(body))

    directory, name = os.path.split(path)
    out_path = os.path.join(directory, f"mutated_{name}")
    with open(out_path, "w") as f:
        f.writelines(out_lines)
    print(
        f"Wrote {out_path}: {counts['del']} deletions, "
        f"{counts['ins']} insertions, {counts['sub']} substitutions"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
