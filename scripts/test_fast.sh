#!/usr/bin/env bash
# Fast CI suite: every module NOT marked `slow` (pure-fn core — geometry,
# loss, assigner, NMS, eval protocol, data pipeline, config, kernels in
# interpret mode). Measured ~7 min cold / ~4 min with a warm XLA persistent
# cache on a 1-vCPU rig; scales down with cores.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" "$@"
