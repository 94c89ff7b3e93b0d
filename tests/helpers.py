"""Shared test helpers: request construction mirroring the reference tests."""

from __future__ import annotations

import io as _io
import os

import numpy as np

from seqalign_tpu import Request, Response, api, constants
from seqalign_tpu.cli import parse_arguments
from seqalign_tpu.io import parse_score_matrix_file, validate_and_transform


def request_from_argv(*argv: str) -> Request:
    request = Request()
    rc = parse_arguments(["./alignSequence", *argv], request)
    assert rc == 0, f"parse_arguments failed for {argv}"
    return request


def request_from_strings(
    text: str,
    pattern: str,
    sequence_type=constants.SequenceType.DNA,
    alignment_type=constants.AlignmentType.GLOBAL,
    gap_penalty: int = 5,
) -> Request:
    request = Request()
    request.set_sequence_type(sequence_type)
    request.alignment_type = alignment_type
    request.gap_penalty = gap_penalty
    request.text = validate_and_transform(
        text, request.alphabet, request.alphabet_size
    )
    request.pattern = validate_and_transform(
        pattern, request.alphabet, request.alphabet_size
    )
    default = (
        constants.DEFAULT_DNA_SCORE_MATRIX_FILE
        if sequence_type is constants.SequenceType.DNA
        else constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE
    )
    parse_score_matrix_file(default, request.alphabet_size, request.score_matrix)
    return request


def run(request: Request, device) -> Response:
    request.device_type = device
    response = Response()
    rc = api.align(request, response)
    assert rc == 0
    return response


def response_tuple(r: Response):
    return (
        r.score,
        r.aligned_text,
        r.aligned_pattern,
        r.start_in_aligned_text,
        r.start_in_aligned_pattern,
    )


def files_in(directory: str) -> list[str]:
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )


def random_dna(rng: np.random.Generator, n: int) -> str:
    return "".join(rng.choice(list("ATCG"), n))


def random_protein(rng: np.random.Generator, n: int) -> str:
    letters = [c for c in constants.PROTEIN_ALPHABET[:-1]]
    return "".join(rng.choice(letters, n))


def capture_stderr():
    return _io.StringIO()
