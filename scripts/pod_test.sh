#!/usr/bin/env bash
# Multi-host pod-slice test launcher (TPU analog of the reference's
# SLURM wrappers, barkla_test.sh). Run once per host; jax.distributed
# coordinates through JAX_COORDINATOR_ADDRESS.
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 JAX_NUM_PROCESSES=<N> \
#   JAX_PROCESS_ID=<i> scripts/pod_test.sh
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
