"""seqalign_tpu — a TPU-native pairwise sequence-alignment framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference CUDA engine (robertszafa/sequence-alignment-gpu): global
(Needleman-Wunsch) and local (Smith-Waterman) alignment of DNA/protein
sequences with linear gap penalties and pluggable integer substitution
matrices, exact traceback, an EMBOSS-style report, plus batched and
multi-host data-parallel alignment the reference only benchmarks
sequentially.  Extensions beyond the reference: semi-global ("fit")
alignment on every engine and affine (Gotoh) gap costs (full alignment
on both the TPU engines and the CPU oracle, plus batched scoring via
parallel.batch).
"""

from . import constants
from .api import align, align_cpu, align_tpu
from .cli import main, parse_arguments
from .constants import AlignmentType, Device, SequenceType
from .pretty import pretty_alignment_print
from .types import Request, Response

__version__ = "0.1.0"

__all__ = [
    "align",
    "align_cpu",
    "align_tpu",
    "AlignmentType",
    "constants",
    "Device",
    "main",
    "parse_arguments",
    "pretty_alignment_print",
    "Request",
    "Response",
    "SequenceType",
]
