#!/usr/bin/env python3
"""Micro-probes for Mosaic v5e int16 support.

Each variant AOT-compiles a minimal Pallas kernel exercising ONE op
pattern the int16 cell mode needs; pass/fail tells us which formulation
the target accepts.  Compile-only (chipless helper), ~seconds per
variant after warmup.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

S = (8, 128)


def _run(body, n_in=2, dtype=jnp.int16):
    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        out[...] = body(*[r[...] for r in ins])

    args = [jnp.ones(S, dtype) for _ in range(n_in)]
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(S, dtype),
    )
    jax.jit(fn).lower(*args).compile()


VARIANTS = {
    # the confirmed failure: int16 vector compare
    "cmp16": lambda: _run(lambda a, b: jnp.where(a > b, a, b + 1)),
    # compare in int32, select int16 operands (mask relayout 32->16)
    "cmp32_sel16": lambda: _run(
        lambda a, b: jnp.where(
            a.astype(jnp.int32) > b.astype(jnp.int32), a, b + 1
        )
    ),
    # int16 compare -> mask -> int16 value (no select)
    "cmp16_to_val": lambda: _run(lambda a, b: (a > b).astype(jnp.int16) + b),
    # int32 compare -> mask -> int16 value
    "cmp32_to_val16": lambda: _run(
        lambda a, b: (a.astype(jnp.int32) > b.astype(jnp.int32)).astype(
            jnp.int16
        ) + b
    ),
    # int32 compare -> int32 mask value -> narrow
    "cmp32_val32_narrow": lambda: _run(
        lambda a, b: (a.astype(jnp.int32) > b.astype(jnp.int32)).astype(
            jnp.int32
        ).astype(jnp.int16) + b
    ),
    # int16 max (the DP core)
    "max16": lambda: _run(lambda a, b: jnp.maximum(a, b - 1)),
    # int16 variable shift (packed lookup)
    "shr16_var": lambda: _run(lambda a, b: (a >> (b & 7)) & 0xFF),
    # int16 equality-as-arithmetic (abs/min, no compare)
    "eq16_arith": lambda: _run(
        lambda a, b: 1 - jnp.minimum(jnp.abs(a - b), 1)
    ),
    # widen/narrow roundtrip
    "ext_narrow": lambda: _run(
        lambda a, b: (a.astype(jnp.int32) + b.astype(jnp.int32)).astype(
            jnp.int16
        )
    ),
    # completeness of the falsification record: which int16
    # elementwise ops DO legalize on this toolchain
    "add16": lambda: _run(lambda a, b: a + b),
    "sub16": lambda: _run(lambda a, b: a - b),
    "mul16": lambda: _run(lambda a, b: a * b),
    "or16": lambda: _run(lambda a, b: a | b),
    "shl16_const": lambda: _run(lambda a, b: (a << 1) + b),
    "min16": lambda: _run(lambda a, b: jnp.minimum(a, b - 1)),
    # int16 compare against zero constant
    "cmp16_zero": lambda: _run(
        lambda a, b: jnp.where(a > 0, a, b)
    ),
}


def main(argv) -> int:
    todo = argv[1:] or list(VARIANTS)
    print(f"[micro] backend: {jax.devices()}", file=sys.stderr)
    for name in todo:
        try:
            VARIANTS[name]()
            print(f"MICRO_OK {name}")
        except Exception as e:
            msg = str(e).splitlines()
            head = next(
                (
                    l for l in msg
                    if "Mosaic" in l or "not support" in l
                    or "relayout" in l.lower()
                ),
                msg[0] if msg else "",
            )
            print(f"MICRO_FAIL {name}: {head[-160:]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
