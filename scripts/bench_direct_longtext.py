#!/usr/bin/env python3
"""Direct-engine latency at long-text shapes vs the checkpointed engine.

Round 2's one-dispatch direct engine capped packed moves in SMEM at
~131k (pattern+text+1), so pattern<=65536 pairs with longer texts fell
back to the checkpointed device loop.  The walker now lands moves in
VMEM rows (ops/pallas_walk.py), so the direct engine covers pattern
<= 65536 at ANY text length that fits the direction-word HBM budget —
the reference's whole latency grid shape-free (alignSequenceGPU.cu:
463-653).  This script times both engines end-to-end (fill + exact
traceback + host replay) at those shapes on the real TPU.

Usage: python scripts/bench_direct_longtext.py [--shapes N:M ...]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--shapes", nargs="*", default=["200000:65536", "500000:65536"],
        help="text:pattern pairs",
    )
    parser.add_argument("--local", action="store_true")
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--skip-checkpoint", action="store_true")
    args = parser.parse_args()

    from seqalign_tpu import config as sa_config

    sa_config.enable_compile_cache()

    from seqalign_tpu.ops import checkpoint, direct

    rng = np.random.default_rng(17)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    for shape in args.shapes:
        n, m = (int(x) for x in shape.split(":"))
        text = rng.integers(0, 4, n).astype(np.int32)
        pattern = rng.integers(0, 4, m).astype(np.int32)
        if not direct.fits_direct(n, m):
            print(f"[{n}x{m}] does not fit direct; skipping", flush=True)
            continue
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            score, bi, bj, at, ap, st, sp = direct.direct_align(
                text, pattern, sm, 4, 5, local=args.local
            )
            t_direct = time.perf_counter() - t0
            print(
                f"[{n}x{m} rep{rep}] direct: {t_direct:.3f}s "
                f"score={score} len={len(at)}",
                flush=True,
            )
        if args.skip_checkpoint:
            continue
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            ck = checkpoint.checkpointed_fill(
                text, pattern, sm, 4, 5, local=args.local
            )
            at2, ap2, st2, sp2 = checkpoint.checkpointed_traceback(
                ck, text, pattern, sm, 4
            )
            t_ck = time.perf_counter() - t0
            print(
                f"[{n}x{m} rep{rep}] checkpoint: {t_ck:.3f}s "
                f"score={ck.score}",
                flush=True,
            )
        assert int(ck.score) == int(score), (ck.score, score)
        assert np.array_equal(at, at2) and np.array_equal(ap, ap2), (
            "direct and checkpoint alignments differ"
        )
        assert (st, sp) == (st2, sp2)
        print(f"[{n}x{m}] engines byte-identical", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
