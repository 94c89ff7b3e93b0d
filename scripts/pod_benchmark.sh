#!/usr/bin/env bash
# Multi-host benchmark launcher (reference: barkla_benchmark.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
python -m seqalign_tpu.bench.suite throughput
python -m seqalign_tpu.bench.suite batch
