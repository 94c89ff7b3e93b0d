"""Mid-tier engine coverage: one real >8000-byte repo DNA pair through
every single-pair accelerator route in default CI.

The default sweeps (test_sweeps.py) cap DNA at 8000 bytes for runtime,
so without this module the wavefront/direct/checkpoint engines only see
small pairs unless SEQALIGN_SWEEP_FULL=1 (the reference's 20000-byte cap
is tests.cu:486-487).  Here one bundled pair above the cap —
GCA_003433695 (22432 nt) x NC_001490.1 (7382 nt) — runs end-to-end in
interpreter mode on each route, byte-compared to the CPU oracle:

* the auto-router's own choice for this size (the one-dispatch direct
  engine — asserted via a spy so a routing regression fails loudly),
* the checkpointed engine (boundary checkpoints + path re-fill),
* the streamed wavefront engine (host-dirs budget raised so the router
  keeps the streaming path).
"""

import numpy as np
import pytest

from seqalign_tpu.constants import Device

from .helpers import request_from_argv, response_tuple, run

PAIR = ("data/dna/GCA_003433695.txt", "data/dna/NC_001490.1.txt")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


def _request(algo):
    request = request_from_argv("--gap-penalty", "11", algo, *PAIR)
    assert request.text_num_bytes > 8000  # above the default sweep cap
    return request


def test_default_route_is_direct_and_matches_oracle(monkeypatch):
    # The auto-router must leave the streaming path for a pair this long
    # (words exceed MAX_HOST_DIRS_BYTES) and take the one-dispatch
    # direct engine (pattern fits a strip).
    from seqalign_tpu.ops import direct

    calls = []
    real = direct.direct_align

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(direct, "direct_align", spy)
    request = _request("--global")
    tpu = run(request, Device.TPU)
    assert calls, "auto-router no longer picks the direct engine"
    cpu = run(request, Device.CPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_checkpoint_route_matches_oracle(monkeypatch):
    monkeypatch.setenv("SEQALIGN_PAIR_ENGINE", "checkpoint")
    request = _request("--local")
    tpu = run(request, Device.TPU)
    cpu = run(request, Device.CPU)
    assert cpu.score == tpu.score
    assert response_tuple(cpu) == response_tuple(tpu)


def test_streamed_wavefront_route_matches_oracle(monkeypatch):
    # Raise the streamed-words budget so the router keeps the wavefront
    # streaming path at this size.
    monkeypatch.setenv("SEQALIGN_MAX_HOST_DIRS_BYTES", str(2 * 1024**3))
    # config reads the env at import time for the module-level constant;
    # reload so the override takes effect like a fresh process.
    import importlib

    from seqalign_tpu import config

    importlib.reload(config)
    try:
        request = _request("--global")
        tpu = run(request, Device.TPU)
        cpu = run(request, Device.CPU)
        assert response_tuple(cpu) == response_tuple(tpu)
    finally:
        monkeypatch.delenv("SEQALIGN_MAX_HOST_DIRS_BYTES")
        importlib.reload(config)
