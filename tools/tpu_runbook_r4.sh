#!/bin/bash
# Round-4 serial TPU measurement runbook (ONE JAX process at a time over
# the axon tunnel).  Usage: bash tools/tpu_runbook_r4.sh <phase>
#   phase fe:      fully-encrypted chains at reference scale (fe19 K=12
#                  exact-scale; fe24boot L=46/K=8/dnum=6 width-2 refresh)
#   phase token:   device-client token + streams + RAG e2e
#   phase scaling: (CPU) virtual-device scaling report
# Each step writes /tmp/rb4_<name>.json + .log; a failing step does not
# block the next.  NOTE r4: FHE_COMPILE_CACHE=0 on fe/boot steps — a
# compile-cache write of the multi-hundred-MB per-level kernels stalled
# the tunnel backend (block 1 hung ~30 min; docs/NOTES_r4.md); the cache
# stays on for the token path where entries are small.
set -u
cd "$(dirname "$0")/.."
step() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >&2
  timeout "${STEP_TIMEOUT:-14400}" env "PYTHONPATH=.:${PYTHONPATH:-}" "$@" \
    > "/tmp/rb4_${name}.json" 2> "/tmp/rb4_${name}.log"
  echo "=== $name exit $? $(date +%H:%M:%S) ===" >&2
}
PHASE="${1:-fe}"

if [ "$PHASE" = fe ]; then
  step fe19 BENCH_D=2048 BENCH_F=8192 BENCH_N=8192 BENCH_BLOCKS=19 \
    BENCH_PASSES=2 BENCH_SPECIAL=12 BENCH_DNUM=8 \
    FHE_GIANT_CHUNK=4 FHE_BABY_CHUNK=16 FHE_XS_CACHE=1 FHE_COMPILE_CACHE=0 \
    python bench_fully_enc.py
  # GIANT_CHUNK=2 at N=16384: chunk=4's contraction transients OOM'd
  # (17.4G > 15.75G; see the contract() layout note in ops/bsgs.py)
  step fe24boot BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=24 \
    BENCH_BOOTSTRAP=1 BENCH_BOOT_LEVEL=9 BENCH_PASSES=2 \
    FHE_GIANT_CHUNK=2 FHE_BABY_CHUNK=8 FHE_XS_CACHE=1 FHE_COMPILE_CACHE=0 FHE_CONTRACT_LAYOUT=lead \
    python bench_fully_enc.py
fi

if [ "$PHASE" = token ]; then
  # cold-start measurement: token 0 time with the persistent compile
  # cache (first run fills, second run measures warm)
  step token BENCH_TOKENS=3 python bench.py
  step token_warm BENCH_TOKENS=2 python bench.py
  step streams BENCH_MODE=device BENCH_BLOCKS=24 BENCH_STREAMS=4 \
    BENCH_TOKENS=2 python bench_streams.py
  step rag RAG_DOCS=2000 BENCH_TOKENS=3 python bench_rag.py
fi

if [ "$PHASE" = scaling ]; then
  SCALE_D=1024 SCALE_N=2048 SCALE_REPS=3 python tools/scaling_report.py \
    > /tmp/rb4_scaling.json 2> /tmp/rb4_scaling.log
fi

echo "runbook phase $PHASE done $(date +%H:%M:%S)" >&2
