#!/bin/bash
# Serial TPU measurement runbook for round 2 (run ONE at a time over the
# axon tunnel).  Each step writes /tmp/rb_<name>.json + .log; a step that
# fails does not block the next.  Usage: bash tools/tpu_runbook.sh [start]
set -u
cd "$(dirname "$0")/.."
START="${1:-0}"
step() {
  local idx="$1" name="$2"; shift 2
  [ "$idx" -lt "$START" ] && return 0
  echo "=== step $idx: $name ($(date +%H:%M:%S)) ===" >&2
  timeout "${STEP_TIMEOUT:-7200}" env "$@" \
    > "/tmp/rb_${name}.json" 2> "/tmp/rb_${name}.log"
  echo "=== step $idx: $name exit $? ===" >&2
}

# 0. device-client smoke (validates tunnel + the eager-dispatch fixes)
step 0 dev_smoke BENCH_MODE=device BENCH_D=256 BENCH_F=1024 BENCH_N=2048 \
  BENCH_BLOCKS=4 BENCH_TOKENS=2 python bench.py

# 1. device-client HEADLINE: true 24-block token, one dispatch per token
step 1 dev24 BENCH_MODE=device BENCH_TOKENS=3 python bench.py

# 2. classic-transport 24-block (regression vs r1's 17.85 s/token)
step 2 classic24 BENCH_TOKENS=2 python bench.py

# 3. explicit-ciphertext (non-fused) transport, bench scale, wire bytes
step 3 nonfused BENCH_FUSED=0 BENCH_BLOCKS=4 BENCH_TOKENS=1 python bench.py

# 4. NTT shoot-out: Stockham vs four-step MXU at production shape
step 4 ntt NTT_N=8192 NTT_ROWS=41 NTT_REPS=20 python tools/bench_ntt.py

# 5. per-phase profile of the BSGS projection, both backends
step 5 prof_stock PROF_BACKEND=stockham python tools/profile_block.py
step 6 prof_mxu PROF_BACKEND=mxu python tools/profile_block.py

# 7. fully-encrypted at reference scale, no bootstrap (VERDICT #3)
STEP_TIMEOUT=21600 \
step 7 fe19 BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=19 \
  BENCH_PASSES=2 python bench_fully_enc.py

# 8. bootstrap at N=16384 (reference-parity ring)
STEP_TIMEOUT=21600 \
step 8 boot16k BENCH_N=16384 BENCH_LIMBS=40 BENCH_SPECIAL=4 BENCH_DNUM=10 \
  BENCH_RADIX=4 BENCH_WIDTH=2 BENCH_EXP_DEGREE=27 BENCH_MARGIN_BITS=3 \
  python bench_bootstrap.py

# 9. device-client multi-stream aggregate throughput (24 resident blocks)
step 9 dev_streams BENCH_MODE=device BENCH_BLOCKS=24 BENCH_STREAMS=8 \
  BENCH_TOKENS=2 python bench_streams.py

# collect artifacts into the repo (committed by the session that ran this)
for f in dev24 classic24 nonfused ntt prof_stock prof_mxu fe19 boot16k \
         dev_streams; do
  if [ -s "/tmp/rb_${f}.json" ] && head -c1 "/tmp/rb_${f}.json" | grep -q \
      '{'; then
    cp "/tmp/rb_${f}.json" "BENCH_LOCAL_r2_${f}.json"
  fi
done

echo "runbook done $(date +%H:%M:%S)" >&2
