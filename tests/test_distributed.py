"""Multi-process jax.distributed validation.

Spawns real OS processes that initialize the jax.distributed runtime
(through the same maybe_initialize_distributed entry point the pod
scripts use), join one global data-parallel mesh, and run the sharded
batch scorer — each process byte-checks its own shard against the
native oracle.  This exercises the cross-process path the virtual
single-process mesh cannot: make_array_from_process_local_data over a
multi-process mesh and shard_map execution on it.

The reference has no distributed runtime at all (1 node / 1 GPU SLURM
scripts); pairs/s *scaling* across hosts needs real hardware (this CI
host exposes a single CPU core, so processes time-slice) and remains a
pod-level measurement — see scripts/pod_benchmark.sh.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num: int, dev_per_proc: int, pairs: int):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own device counts
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(num), str(port),
             str(dev_per_proc), str(pairs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env,
        )
        for pid in range(num)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"OK {pid} {pairs}" in out, out
        assert "aligned=" in out, out


def test_two_process_sharded_batch_score():
    # Full mode matrix (linear/affine x global/local/semi) + batched
    # end-to-end alignment, each process byte-checking its own shard.
    _run_workers(int(os.environ.get("SEQALIGN_DIST_PROCS", "2")), 2, 64)


def test_four_process_sharded_batch_score():
    # The pod scripts' code path must be process-count-general: 4
    # processes x 2 virtual devices, same matrix, smaller batch (this
    # CI host has one core, so processes time-slice).
    _run_workers(4, 2, 16)
