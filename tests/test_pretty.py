"""Pretty-printer byte-compatibility (reference: utilities.cpp:253-315)."""

import io

from seqalign_tpu.pretty import pretty_alignment_print
from seqalign_tpu.types import Response


def render(response: Response) -> str:
    out = io.StringIO()
    pretty_alignment_print(response, out)
    return out.getvalue()


def test_short_exact_match():
    # Docstring example of the reference printer (utilities.cpp:244-252).
    response = Response(
        aligned_text="ACAC",
        aligned_pattern="ACAC",
        start_in_aligned_text=0,
        start_in_aligned_pattern=0,
        score=20,
    )
    assert render(response) == (
        "1 ACAC   4 \n"
        "  ||||\n"
        "1 ACAC   4\n"
        "\n"
        "# Length: \t4\n"
        "# Identity: \t4/4 (100%)\n"
        "# Gaps: \t0/4 (0%)\n"
        "# Score: \t20\n"
    )


def test_gaps_and_mismatches_rail():
    response = Response(
        aligned_text="AC-T",
        aligned_pattern="AGGT",
        start_in_aligned_text=0,
        start_in_aligned_pattern=0,
        score=1,
    )
    out = render(response)
    assert "|. |" in out
    assert "# Identity: \t2/4 (50%)\n" in out
    assert "# Gaps: \t1/4 (25%)\n" in out


def test_multi_line_blocks_and_offsets():
    text = "A" * 60
    pattern = "A" * 30 + "T" * 30
    response = Response(
        aligned_text=text,
        aligned_pattern=pattern,
        start_in_aligned_text=100,
        start_in_aligned_pattern=7,
        score=42,
    )
    out = render(response)
    lines = out.split("\n")
    # First block: text index = 1 + 100, right pattern index = 50 + 7.
    assert lines[0] == f"{101:>3} {'A' * 50}   57 "
    assert lines[2] == f"{1:>3} {pattern[:50]}   50"
    # Second block of 10 chars.
    assert lines[4] == f"{151:>3} {'A' * 10}   67 "
    assert lines[6] == f"{51:>3} {pattern[50:]}   60"
    assert "# Identity: \t30/60 (50%)\n" in out


def test_empty_alignment_prints_nothing():
    assert render(Response()) == ""


def test_sig3_percentages():
    # 1/3 identity -> 33.3% like C++ setprecision(3).
    response = Response(
        aligned_text="ATT",
        aligned_pattern="ACC",
        score=0,
    )
    out = render(response)
    assert "(33.3%)" in out
    assert "(66.7%)" in out or "(0%)" in out
