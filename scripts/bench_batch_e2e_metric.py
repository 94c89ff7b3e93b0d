#!/usr/bin/env python3
"""North-star batch workload as a trendable per-round JSON artifact.

Runs the BASELINE.json 64k-pair DNA batch (65536 local pairs, 256x256)
END TO END — fill + lockstep traceback + host string assembly — through
BatchAligner.align and writes one JSON file under bench/results/ so the
number is committed and comparable across rounds (the reference commits
its measured evidence the same way, tests/benchmarkResults/*.out; its
batch benchmark could only loop requests sequentially,
tests/benchmarks.cu:271-332).

Usage:
  python scripts/bench_batch_e2e_metric.py --out bench/results/BATCH_E2E_r04.json
  python scripts/bench_batch_e2e_metric.py --pairs 4096   # quick probe

The first timed run doubles as the compile warm-up (per-dispatch shapes
are fixed by the sub-batch chunking, and every entry path shares the
on-disk compile cache); the artifact records both the cold and warm
walls and reports the warm number as the metric.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=65536)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=None)
    ap.add_argument("--warm-reps", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from seqalign_tpu import config
    config.enable_compile_cache()
    from seqalign_tpu.parallel.batch import BatchAligner

    rng = np.random.default_rng(9)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    texts = [
        rng.integers(0, 4, args.size).astype(np.int32)
        for _ in range(args.pairs)
    ]
    patterns = [
        rng.integers(0, 4, args.size).astype(np.int32)
        for _ in range(args.pairs)
    ]
    aligner = BatchAligner(sm, 4, 5, local=True)

    # The axon tunnel's co-tenancy makes single-rep walls swing ~2x
    # (CLAUDE.md environment quirks), so the artifact records the best
    # of several warm reps, with every wall listed for honesty.
    walls = []
    labels = ["cold"] + [f"warm{r}" for r in range(args.warm_reps)]
    for label in labels:
        t0 = time.time()
        results = aligner.align(texts, patterns)
        walls.append(time.time() - t0)
        assert len(results) == args.pairs
        print(
            f"[batch-e2e:{label}] {args.pairs} pairs {args.size}x{args.size}: "
            f"{walls[-1]:.1f} s, {args.pairs / walls[-1]:,.0f} pairs/s",
            flush=True,
        )

    # Spot-check a few pairs against the CPU oracle so the artifact
    # certifies a correct run, not just a fast one.
    from seqalign_tpu.native import bindings

    for i in (0, args.pairs // 2, args.pairs - 1):
        at, ap_, st, sp, score = bindings.oracle_align(
            1, texts[i].astype(np.int8), patterns[i].astype(np.int8),
            sm, 4, 5,
        )
        r = results[i]
        assert r.score == score, (i, r.score, score)
        assert np.array_equal(r.aligned_text, at), i
        assert np.array_equal(r.aligned_pattern, ap_), i
    print("[batch-e2e] oracle spot-check OK (3 pairs)")

    warm = min(walls[1:]) if len(walls) > 1 else walls[0]
    record = {
        "metric": "dna_batch_e2e",
        "pairs": args.pairs,
        "size": args.size,
        "value": round(args.pairs / warm, 1),
        "unit": "pairs/s",
        "gcups_e2e": round(args.pairs * args.size * args.size / warm / 1e9, 2),
        "cold_wall_s": round(walls[0], 2),
        "warm_wall_s": round(warm, 2),
        "warm_walls_s": [round(w, 2) for w in walls[1:]],
        "note": (
            "BASELINE.json 64k-pair DNA workload end-to-end (fill + "
            "lockstep traceback + host assembly); reference analog loops "
            "requests sequentially (tests/benchmarks.cu:271-332)"
        ),
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
