#!/usr/bin/env python3
"""Long-pair end-to-end benchmark: checkpointed fill + exact traceback.

The reference's max-length demo is fill-only (BENCHMARK macro skips
traceback; 500k x 500k local in 165 s on a Quadro P4000,
maxLength_quadro.out) and its headline end-to-end latency is 65536^2
global in 3702 ms on a V100 (benchmark_latency_tesla.out).  This script
times both phases of the checkpointed engine separately on real TPU.

Usage: python scripts/bench_longpair.py [--sizes 65536 500000] [--local]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", nargs="*", type=int,
                        default=[65536, 500000])
    parser.add_argument("--local", action="store_true")
    parser.add_argument("--semi", action="store_true")
    parser.add_argument("--repeats", type=int, default=2)
    args = parser.parse_args()

    from seqalign_tpu import config as sa_config

    sa_config.enable_compile_cache()

    from seqalign_tpu.ops import checkpoint

    rng = np.random.default_rng(3)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    for size in args.sizes:
        text = rng.integers(0, 4, size).astype(np.int32)
        pattern = rng.integers(0, 4, size).astype(np.int32)
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            ck = checkpoint.checkpointed_fill(
                text, pattern, sm, 4, 5,
                local=args.local, semi=args.semi,
            )
            t1 = time.perf_counter()
            at, ap, st, sp = checkpoint.checkpointed_traceback(
                ck, text, pattern, sm, 4
            )
            t2 = time.perf_counter()
            print(
                f"{size}x{size} "
                f"{'local' if args.local else 'semi' if args.semi else 'global'}"
                f" rep{rep}: fill {t1 - t0:.2f} s"
                f" ({size * size / (t1 - t0) / 1e9:.1f} GCUPS),"
                f" traceback {t2 - t1:.2f} s, total {t2 - t0:.2f} s,"
                f" score {ck.score}, aligned len {at.shape[0]}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
