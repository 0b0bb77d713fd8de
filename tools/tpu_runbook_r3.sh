#!/bin/bash
# Round-3 serial TPU measurement runbook (ONE JAX process at a time over
# the axon tunnel).  Usage: bash tools/tpu_runbook_r3.sh <phase>
#   phase quick: NTT shoot-outs + per-phase profiles (informs perf work)
#   phase mid:   transport benchmarks (non-fused wire, classic, streams)
#   phase long:  bootstrap at N=16384, fully-encrypted 19/24-block chains
# Each step writes /tmp/rb3_<name>.json + .log; a failing step does not
# block the next.
set -u
cd "$(dirname "$0")/.."
PHASE="${1:-quick}"
step() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >&2
  # prepend repo root but keep /root/.axon_site (sitecustomize registers
  # the axon TPU plugin; replacing PYTHONPATH kills the backend)
  timeout "${STEP_TIMEOUT:-7200}" env "PYTHONPATH=.:${PYTHONPATH:-}" "$@" \
    > "/tmp/rb3_${name}.json" 2> "/tmp/rb3_${name}.log"
  echo "=== $name exit $? $(date +%H:%M:%S) ===" >&2
}

if [ "$PHASE" = quick ]; then
  step ntt8k  NTT_N=8192  NTT_ROWS=41 NTT_REPS=20 python tools/bench_ntt.py
  step ntt16k NTT_N=16384 NTT_ROWS=59 NTT_REPS=20 python tools/bench_ntt.py
  step prof_stock PROF_BACKEND=stockham python tools/profile_block.py
  step prof_mxu   PROF_BACKEND=mxu      python tools/profile_block.py
fi

if [ "$PHASE" = mid ]; then
  # explicit-ciphertext (non-fused) transport at bench scale: wire bytes
  step nonfused BENCH_MODE=classic BENCH_FUSED=0 BENCH_BLOCKS=4 \
    BENCH_TOKENS=1 python bench.py
  # classic per-round-trip transport, TRUE 24 blocks (r1: 17.85 s/token)
  step classic24 BENCH_MODE=classic BENCH_TOKENS=2 python bench.py
  # multi-stream aggregate throughput, 24 resident blocks
  step dev_streams BENCH_MODE=device BENCH_BLOCKS=24 BENCH_STREAMS=8 \
    BENCH_TOKENS=2 python bench_streams.py
fi

if [ "$PHASE" = long ]; then
  # bootstrap at the reference-parity ring
  STEP_TIMEOUT=14400 \
  step boot16k BENCH_N=16384 BENCH_LIMBS=40 BENCH_SPECIAL=4 BENCH_DNUM=10 \
    BENCH_RADIX=4 BENCH_WIDTH=2 BENCH_EXP_DEGREE=27 BENCH_MARGIN_BITS=3 \
    python bench_bootstrap.py
  # fully-encrypted at reference scale, no bootstrap (ref: 70 s/block)
  STEP_TIMEOUT=21600 \
  step fe19 BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=19 \
    BENCH_PASSES=2 python bench_fully_enc.py
  # 24-block chain with mid-chain bootstraps (ref: 40 s/block)
  STEP_TIMEOUT=21600 \
  step fe24boot BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=24 \
    BENCH_BOOTSTRAP=1 BENCH_PASSES=2 python bench_fully_enc.py
fi

if [ "$PHASE" = long2 ]; then
  # memory-safe re-runs after the fe19/fe24boot HBM postmortem
  # (docs/NOTES_r3.md): chunked keygen + xs-stack eviction + baby/giant
  # chunk knobs; fe19 at N=8192 (the 59-limb key/stack footprint at
  # N=16384 exceeds one v5e's HBM — ring noted in the artifact)
  STEP_TIMEOUT=14400 \
  step boot16k BENCH_N=16384 BENCH_LIMBS=40 BENCH_SPECIAL=4 BENCH_DNUM=10 \
    BENCH_RADIX=4 BENCH_WIDTH=2 BENCH_EXP_DEGREE=27 BENCH_MARGIN_BITS=3 \
    python bench_bootstrap.py
  STEP_TIMEOUT=14400 \
  step fe19 BENCH_D=2048 BENCH_F=8192 BENCH_N=8192 BENCH_BLOCKS=19 \
    BENCH_PASSES=2 FHE_GIANT_CHUNK=4 FHE_BABY_CHUNK=16 FHE_XS_CACHE=1 \
    python bench_fully_enc.py
  STEP_TIMEOUT=14400 \
  step fe24boot BENCH_D=2048 BENCH_F=8192 BENCH_N=16384 BENCH_BLOCKS=24 \
    BENCH_BOOTSTRAP=1 BENCH_PASSES=2 FHE_GIANT_CHUNK=4 FHE_BABY_CHUNK=16 FHE_XS_CACHE=1 \
    python bench_fully_enc.py
  step dev_streams4 BENCH_MODE=device BENCH_BLOCKS=24 BENCH_STREAMS=4 \
    BENCH_TOKENS=2 python bench_streams.py
fi

echo "runbook phase $PHASE done $(date +%H:%M:%S)" >&2
