#!/usr/bin/env bash
# Fast CI suite: every module NOT marked `slow` (pure-fn core — geometry,
# loss, assigner, NMS, eval protocol, data pipeline, config, kernels in
# interpret mode). Measured (round 5, 200 tests): 5:28-6:24 on 1 vCPU with
# a warm XLA persistent cache; ~7 min cold; scales down with cores.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" "$@"
