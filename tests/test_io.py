"""Tier-1 unit tests of the I/O layer (mirrors tests.cu:35-114)."""

import io

import numpy as np

from seqalign_tpu import constants
from seqalign_tpu.io import (
    get_score,
    index_of_letter,
    parse_score_matrix_file,
    validate_and_transform,
)
from seqalign_tpu.types import Request
from seqalign_tpu.cli import parse_arguments


def test_index_of_letter():
    # tests.cu:35-40
    assert index_of_letter("A", constants.DNA_ALPHABET, constants.NUM_DNA_CHARS) == 0
    assert index_of_letter("H", constants.DNA_ALPHABET, constants.NUM_DNA_CHARS) == -1
    assert (
        index_of_letter("H", constants.PROTEIN_ALPHABET, constants.NUM_PROTEIN_CHARS)
        == 8
    )


def test_parse_score_matrix_file():
    # tests.cu:42-51
    request = Request()
    rc = parse_score_matrix_file(
        "scoreMatrices/dna/blast.txt", request.alphabet_size, request.score_matrix
    )
    assert rc == 0
    assert (
        get_score("A", "A", request.alphabet, request.alphabet_size, request.score_matrix)
        == 5
    )
    assert (
        get_score("G", "T", request.alphabet, request.alphabet_size, request.score_matrix)
        == -4
    )


def test_get_score_protein():
    # getScore double-lookup semantics (reference: utilities.cpp:17-25)
    # against known BLOSUM50 entries.
    request = Request()
    request.set_sequence_type(constants.SequenceType.PROTEIN)
    rc = parse_score_matrix_file(
        constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE,
        request.alphabet_size,
        request.score_matrix,
    )
    assert rc == 0
    args = (request.alphabet, request.alphabet_size, request.score_matrix)
    assert get_score("W", "W", *args) == 15
    assert get_score("A", "W", *args) == -3
    assert get_score("H", "Y", *args) == 2


def test_parse_score_matrix_corrupt():
    request = Request()
    rc = parse_score_matrix_file(
        "tests/corruptScoreMatrix.txt", request.alphabet_size, request.score_matrix
    )
    assert rc == -1


def test_read_sequence_bytes():
    # tests.cu:53-65
    request = Request()
    rc = parse_arguments(
        ["./alignSequence", "data/dna/dna_01.txt", "data/dna/dna_02.txt"], request
    )
    assert rc == 0
    np.testing.assert_array_equal(request.text, np.array([0, 2, 0, 2], np.int8))
    np.testing.assert_array_equal(request.pattern, np.array([2, 2, 1, 0], np.int8))


def test_validate_and_transform_fasta_and_case():
    idx = validate_and_transform(
        ">header line ignored\nacGT\n>another\nat",
        constants.DNA_ALPHABET,
        constants.NUM_DNA_CHARS,
    )
    np.testing.assert_array_equal(idx, np.array([0, 2, 3, 1, 0, 1], np.int8))


def test_validate_and_transform_drops_non_letters():
    idx = validate_and_transform(
        "A C\nG\t1T*", constants.DNA_ALPHABET, constants.NUM_DNA_CHARS
    )
    np.testing.assert_array_equal(idx, np.array([0, 2, 3, 1], np.int8))


def test_validate_and_transform_bad_letter():
    err = io.StringIO()
    idx = validate_and_transform(
        "AXC", constants.DNA_ALPHABET, constants.NUM_DNA_CHARS, err=err
    )
    assert idx is None
    assert err.getvalue() == "'X' letter not in alphabet.\n"
