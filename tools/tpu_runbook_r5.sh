#!/bin/bash
# Round-5 serial TPU measurement runbook — ONE JAX process at a time over
# the axon tunnel (r5 lesson: even a "CPU" process that does not force
# the cpu platform attaches a second tunnel session and can kill the
# running job; docs/NOTES_r5.md).  Usage: bash tools/tpu_runbook_r5.sh <phase>
#   fe19:    re-measure the 19-block chain with full key stacks (VERDICT #1)
#   ntt:     MXU/Pallas NTT shoot-out incl. the 2d Mosaic variant (VERDICT #3)
#   few2:    width-2 reference-precision chain artifact (VERDICT #4)
#   boot16k: 24-block 4-bootstrap config at N=16384 with warm/free (VERDICT #2)
#   boot8k:  clean full pass-2 of the N=8192 fe24boot config (VERDICT #7)
#   streams: multi-stream aggregate throughput (VERDICT #6)
set -u
cd "$(dirname "$0")/.."
step() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >&2
  timeout "${STEP_TIMEOUT:-14400}" env "PYTHONPATH=.:${PYTHONPATH:-}" "$@" \
    > "/tmp/rb5_${name}.json" 2> "/tmp/rb5_${name}.log"
  echo "=== $name exit $? $(date +%H:%M:%S) ===" >&2
}
PHASE="${1:-fe19}"

case "$PHASE" in
fe19)
  step fe19 BENCH_D=2048 BENCH_F=8192 BENCH_N=8192 BENCH_BLOCKS=19 \
    BENCH_PASSES=2 BENCH_SPECIAL=12 BENCH_DNUM=8 \
    FHE_GIANT_CHUNK=4 FHE_BABY_CHUNK=16 FHE_XS_CACHE=1 FHE_COMPILE_CACHE=0 \
    python bench_fully_enc.py
  ;;
ntt)
  step ntt NTT_N=8192 NTT_ROWS=41 NTT_REPS=20 python tools/bench_ntt.py
  ;;
few2)
  # width-2 at 12 blocks: L = 6*12+3 = 75 limbs, K=8 -> dnum 10
  step few2 BENCH_D=2048 BENCH_F=8192 BENCH_N=8192 BENCH_BLOCKS=12 \
    BENCH_WIDTH_CHAIN=2 BENCH_PASSES=2 BENCH_SPECIAL=12 BENCH_DNUM=10 \
    FHE_WARM_FREE=1 FHE_CONTRACT_LAYOUT=lead \
    FHE_GIANT_CHUNK=2 FHE_BABY_CHUNK=8 FHE_XS_CACHE=1 FHE_COMPILE_CACHE=0 \
    python bench_fully_enc.py
  ;;
boot16k)
  step boot16k BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=24 \
    BENCH_BOOTSTRAP=1 BENCH_BOOT_LEVEL=9 BENCH_PASSES=2 FHE_WARM_FREE=1 \
    FHE_GIANT_CHUNK=2 FHE_BABY_CHUNK=8 FHE_XS_CACHE=1 FHE_COMPILE_CACHE=0 \
    FHE_CONTRACT_LAYOUT=lead python bench_fully_enc.py
  ;;
boot8k)
  step boot8k BENCH_D=2048 BENCH_F=8192 BENCH_N=8192 BENCH_BLOCKS=24 \
    BENCH_BOOTSTRAP=1 BENCH_LIMBS=46 BENCH_BOOT_LEVEL=12 BENCH_PASSES=2 \
    FHE_WARM_FREE=1 FHE_GIANT_CHUNK=4 FHE_BABY_CHUNK=16 FHE_XS_CACHE=1 \
    FHE_COMPILE_CACHE=0 python bench_fully_enc.py
  ;;
streams)
  step streams BENCH_MODE=device BENCH_BLOCKS=24 BENCH_STREAMS=4 \
    BENCH_TOKENS=2 FHE_CONTRACT_LAYOUT=lead python bench_streams.py
  ;;
esac
echo "runbook phase $PHASE done $(date +%H:%M:%S)" >&2
