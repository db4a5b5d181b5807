#!/bin/bash
# Pending real-TPU measurement tasks, run in dependency order once the
# relay is reachable.  Each step tolerates failure (the relay can drop
# mid-run) and leaves its artifact; re-running skips nothing — every
# artifact is regenerated.  Allow ~40 min total: the first Pallas
# compile in each process can take minutes (remote-compile warm-up).
#
#   bash benchmarks/chip_tasks.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks}"
log() { echo "== $(date +%H:%M:%S) $*" >&2; }

log "hardware parity tier"
STM_TEST_ON_TPU=1 timeout 2400 python -m pytest tests/test_tpu_hardware.py -q

log "stage suite -> ${OUT}/results_v5e_r03.json (cvf entries included)"
timeout 3000 python benchmarks/suite.py --json "${OUT}/results_v5e_r03.json"

log "serving benchmark -> ${OUT}/serving_v5e.json (post-narrowing + pipelined)"
timeout 3000 python benchmarks/serving.py --batches 1,2,4,8 --lingers 0,20 --depths 2 --json "${OUT}/serving_v5e_r03.json"

log "video throughput -> ${OUT}/video_v5e.json"
timeout 3000 python benchmarks/video.py --json "${OUT}/video_v5e.json"

log "headline bench.py"
timeout 3000 python bench.py

log "done — diff the artifacts, update docs/performance.md, commit"
