#!/usr/bin/env bash
# Full suite in the documented batch split (README "Tests"). The slow
# modules build whole models and jit training steps; a single-process run
# exceeds 10 minutes on a 1-vCPU rig, so they run as four bounded batches
# after the fast core. Wall-clock on 1 vCPU: ~25-35 min cold, substantially
# less with a warm XLA persistent cache or more cores.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q -m "not slow"
python -m pytest tests/test_api.py tests/test_inference.py \
    tests/test_model.py tests/test_remat.py -q
python -m pytest tests/test_train.py tests/test_parity_reference.py \
    tests/test_resume_and_reports.py tests/test_attention_vjp.py -q
python -m pytest tests/test_parallel.py tests/test_tp.py \
    tests/test_attention_mesh.py tests/test_focus_import.py -q
python -m pytest tests/test_graft_entry.py -q
echo "ALL TEST BATCHES GREEN"
