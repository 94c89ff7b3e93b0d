"""Error-path hardening tests (beyond the reference's canonical strings).

The TPU engines add two failure modes the reference doesn't have: the
packed-substitution |score| <= 127 contract of the Pallas kernels, and
device-side allocation failures surfacing as XLA RESOURCE_EXHAUSTED
runtime errors.  Both must come back as clean one-line CLI errors, never
Python tracebacks (the reference prints MEM_ERROR on GPU alloc failure,
alignSequenceGPU.cu:502-546).
"""

import numpy as np
import pytest

from seqalign_tpu import api, constants
from seqalign_tpu.constants import Device

from .helpers import capture_stderr, request_from_strings


def _big_score_request():
    request = request_from_strings("ATCGATCG", "ATCG")
    request.score_matrix[:4, :4] = np.where(
        np.eye(4, dtype=bool), 200, -4
    )
    return request


def test_oversized_scores_clean_cli_error(monkeypatch):
    """|score| > 127 on a Pallas engine -> one-line error, rc 1."""
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    request = _big_score_request()
    request.device_type = Device.TPU
    err = capture_stderr()
    from seqalign_tpu.types import Response

    rc = api.align(request, Response(), err=err)
    assert rc == 1
    message = err.getvalue()
    assert message.startswith("error: ")
    assert message.endswith("\n")
    assert "Traceback" not in message


def test_checkpoint_fill_validates_scores(monkeypatch):
    """checkpointed_fill rejects |score| > 127 up front instead of
    silently producing wrong scores (advisor repro: oracle 30020 vs
    checkpoint -1202)."""
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.ops import checkpoint

    sm = np.where(np.eye(4, dtype=bool), 200, -4).astype(np.int32)
    text = np.zeros(16, np.int32)
    pattern = np.zeros(8, np.int32)
    with pytest.raises(ValueError):
        checkpoint.checkpointed_fill(text, pattern, sm, 4, 5)


def test_batch_aligner_validates_scores(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.parallel.batch import BatchAligner

    sm = np.where(np.eye(4, dtype=bool), 200, -4).astype(np.int32)
    with pytest.raises(ValueError):
        BatchAligner(sm, 4, 5)


def test_device_oom_maps_to_mem_error(monkeypatch):
    """An XLA RESOURCE_EXHAUSTED escaping the engine prints the
    reference's MEM_ERROR string."""
    import jax

    import seqalign_tpu.models as models

    class _Boom:
        def align(self, *a, **k):
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to "
                "allocate 137438953472 bytes."
            )

    monkeypatch.setattr(models, "aligner_for", lambda _t: _Boom())
    request = request_from_strings("ATCGATCG", "ATCG")
    request.device_type = Device.TPU
    err = capture_stderr()
    from seqalign_tpu.types import Response

    rc = api.align(request, Response(), err=err)
    assert rc == 1
    assert err.getvalue() == constants.MEM_ERROR


def test_backend_unavailable_maps_to_mem_error(monkeypatch):
    """An unusable accelerator backend exits 1 with the reference's
    MEM_ERROR (on a no-GPU host the reference's cudaMallocs fail and it
    prints MEM_ERROR, alignSequenceGPU.cu:541-546) — never a traceback."""
    import seqalign_tpu.models as models

    class _Down:
        def align(self, *a, **k):
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: TPU "
                "backend setup/compile error (Unavailable)."
            )

    monkeypatch.setattr(models, "aligner_for", lambda _t: _Down())
    request = request_from_strings("ATCGATCG", "ATCG")
    request.device_type = Device.TPU
    err = capture_stderr()
    from seqalign_tpu.types import Response

    rc = api.align(request, Response(), err=err)
    assert rc == 1
    assert err.getvalue() == constants.MEM_ERROR
