"""CLI error paths and flag semantics (mirrors tests.cu:67-114)."""

import io

from seqalign_tpu import constants
from seqalign_tpu.cli import parse_arguments
from seqalign_tpu.types import Request


def test_usage():
    err = io.StringIO()
    request = Request()
    rc = parse_arguments(["./alignSequence"], request, err=err)
    assert rc == 1
    assert err.getvalue() == constants.USAGE


def test_no_or_empty_sequence_files():
    err = io.StringIO()
    request = Request()
    rc = parse_arguments(["./alignSequence", "-p", "-c"], request, err=err)
    assert rc == 1
    assert err.getvalue() == constants.SEQ_NOT_READ_ERROR + constants.USAGE
    assert request.device_type is constants.Device.CPU
    assert request.sequence_type is constants.SequenceType.PROTEIN


def test_incorrect_score_matrix():
    err = io.StringIO()
    request = Request()
    rc = parse_arguments(
        [
            "./alignSequence",
            "--score-matrix",
            "tests/corruptScoreMatrix.txt",
            "data/dna/dna_01.txt",
            "data/dna/dna_02.txt",
        ],
        request,
        err=err,
    )
    assert rc == 1
    assert err.getvalue() == constants.SCORE_MATRIX_NOT_READ_ERROR


def test_missing_sequence_file():
    err = io.StringIO()
    request = Request()
    rc = parse_arguments(
        ["./alignSequence", "no_such_file.txt", "data/dna/dna_02.txt"],
        request,
        err=err,
    )
    assert rc == 1
    assert err.getvalue() == (
        "no_such_file.txt file does not exist\n" + constants.SEQ_NOT_READ_ERROR
    )


def test_bad_gap_penalty():
    err = io.StringIO()
    request = Request()
    rc = parse_arguments(
        ["./alignSequence", "--gap-penalty", "abc", "a", "b"], request, err=err
    )
    assert rc == 1
    assert err.getvalue() == constants.GAP_PENALTY_NOT_READ_ERROR


def test_gap_penalty_stoi_semantics():
    # std::stoi parses the leading integer and ignores trailing junk.
    request = Request()
    rc = parse_arguments(
        [
            "./alignSequence",
            "--gap-penalty",
            "7x",
            "data/dna/dna_01.txt",
            "data/dna/dna_02.txt",
        ],
        request,
    )
    assert rc == 0
    assert request.gap_penalty == 7


def test_text_pattern_swap():
    # Text must end up the longer sequence (utilities.cpp:225-230).
    request = Request()
    rc = parse_arguments(
        [
            "./alignSequence",
            "data/dna/dna_01.txt",
            "data/dna/NC_018874.txt",
        ],
        request,
    )
    assert rc == 0
    assert request.text_num_bytes >= request.pattern_num_bytes
    assert request.pattern_num_bytes == 4  # dna_01 = ACAC


def test_defaults():
    request = Request()
    rc = parse_arguments(
        ["./alignSequence", "data/dna/dna_01.txt", "data/dna/dna_02.txt"], request
    )
    assert rc == 0
    assert request.device_type is constants.Device.CPU
    assert request.sequence_type is constants.SequenceType.DNA
    assert request.alignment_type is constants.AlignmentType.GLOBAL
    assert request.gap_penalty == 5
    # Default DNA matrix (blast.txt): match 5 / mismatch -4.
    assert request.score_matrix.reshape(-1)[0] == 5
    assert request.score_matrix.reshape(-1)[1] == -4
