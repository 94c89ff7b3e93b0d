#!/usr/bin/env python3
"""One process of a multi-process jax.distributed validation run.

Launched N times by tests/test_distributed.py (and usable manually to
smoke-test a real pod slice): each process brings up the distributed
runtime, joins a global data-parallel mesh spanning every process's
devices, contributes its local shard of a batch, runs the sharded batch
scorer, and byte-checks its own shard's scores against the native
oracle.  Prints "OK <process_id> <pairs> <seconds>" on success.

Usage: distributed_worker.py <process_id> <num_processes> <port>
           [devices_per_process] [pairs_per_process]
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = int(sys.argv[3])
dev_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
pairs_per_proc = int(sys.argv[5]) if len(sys.argv) > 5 else 256

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dev_per_proc}"
    ).strip()
# Hand the coordinator address to maybe_initialize_distributed — the
# same entry point the pod scripts use.
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from seqalign_tpu.parallel import mesh as mesh_lib  # noqa: E402


def main() -> int:
    import time

    mesh_lib.maybe_initialize_distributed()
    assert jax.process_count() == num_procs, jax.process_count()
    devices = jax.devices()
    assert len(devices) == num_procs * dev_per_proc, devices

    from jax.sharding import NamedSharding, PartitionSpec as P

    from seqalign_tpu.native import bindings
    from seqalign_tpu.parallel.batch import sharded_batch_score

    mesh = mesh_lib.make_data_mesh(devices=devices)
    sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    # Every process generates the same global batch (same seed), then
    # contributes only its slice.
    b = pairs_per_proc * num_procs
    n = m = 64
    rng = np.random.default_rng(17)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    patterns = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = np.full(b, n, np.int32)
    ms = np.full(b, m, np.int32)

    lo = proc_id * pairs_per_proc
    hi = lo + pairs_per_proc

    def make_global(x):
        return jax.make_array_from_process_local_data(
            sharding, x[lo:hi], x.shape
        )

    import jax.numpy as jnp

    t0 = time.time()
    # Mode matrix: every scoring mode the engines claim on a mesh —
    # linear x {global, local, semi} and affine x {global, semi}.
    modes = [
        dict(local=True),
        dict(),
        dict(semi=True),
        dict(gap_extend=2),
        dict(semi=True, gap_extend=2),
    ]
    checked = 0
    for kw in modes:
        scores = sharded_batch_score(
            mesh, make_global(texts), make_global(patterns),
            make_global(ns), make_global(ms),
            jnp.asarray(sm), 5, **kw,
        )
        algo = 2 if kw.get("semi") else (1 if kw.get("local") else 0)
        ext = kw.get("gap_extend")
        # Each process checks its own addressable shards vs the oracle.
        mode_checked = 0
        for shard in scores.addressable_shards:
            got = np.asarray(shard.data).reshape(-1)
            start = shard.index[0].start or 0
            for row, s in enumerate(got):
                gi = start + row
                if ext is not None:
                    sc, _ = bindings.oracle_fill_affine(
                        algo, texts[gi].astype(np.int8),
                        patterns[gi].astype(np.int8), sm, 4, 5, ext,
                    )
                else:
                    _, sc, _ = bindings.oracle_fill(
                        algo, texts[gi].astype(np.int8),
                        patterns[gi].astype(np.int8), sm, 4, 5,
                    )
                assert int(s) == sc, (kw, gi, int(s), sc)
                mode_checked += 1
        assert mode_checked == pairs_per_proc, (kw, mode_checked)
        checked = mode_checked

    # Batched end-to-end ALIGNMENT (fill + lockstep traceback) across
    # the multi-process mesh: each process emits and byte-checks the
    # pairs its shard covers (BatchAligner's multi-process contract).
    from seqalign_tpu.parallel.batch import BatchAligner

    align_b = min(b, 8 * num_procs * dev_per_proc)
    a_texts = [texts[i] for i in range(align_b)]
    a_pats = [patterns[i][: 32 + (i % 17)] for i in range(align_b)]
    aligned_total = 0
    for kw in (dict(local=True), dict(semi=True, gap_extend=2)):
        ba = BatchAligner(sm, 4, 5, mesh=mesh, **kw)
        results = ba.align(a_texts, a_pats)
        algo = 2 if kw.get("semi") else 1
        ext = kw.get("gap_extend")
        for i, r in enumerate(results):
            if r is None:
                continue  # another process's shard
            if ext is not None:
                oat, oap, ost, osp, osc = bindings.oracle_align_affine(
                    algo, a_texts[i].astype(np.int8),
                    a_pats[i].astype(np.int8), sm, 4, 5, ext,
                )
            else:
                oat, oap, ost, osp, osc = bindings.oracle_align(
                    algo, a_texts[i].astype(np.int8),
                    a_pats[i].astype(np.int8), sm, 4, 5,
                )
            assert r.score == osc, (kw, i, r.score, osc)
            assert np.array_equal(r.aligned_text, oat), (kw, i)
            assert np.array_equal(r.aligned_pattern, oap), (kw, i)
            assert (r.start_in_aligned_text,
                    r.start_in_aligned_pattern) == (ost, osp), (kw, i)
            aligned_total += 1
    assert aligned_total > 0, "no pairs owned by this process"

    dt = time.time() - t0
    print(f"OK {proc_id} {checked} {dt:.2f} aligned={aligned_total}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
