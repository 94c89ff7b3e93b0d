#!/usr/bin/env bash
# CLI launcher (reference: barkla_alignSequence.sh). Extra args pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
./alignSequence "$@"
