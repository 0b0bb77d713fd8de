#!/bin/bash
# Copy completed round-4 TPU bench JSONs into the repo as artifacts of
# record (run when the serial TPU queue finishes).
cd "$(dirname "$0")/.."
copy() { [ -s "$1" ] && python -c "import json,sys; json.load(open('$1'))" 2>/dev/null && cp "$1" "$2" && echo "copied $2"; }
copy /tmp/fe19_tpu8.json  BENCH_LOCAL_r4_fe19.json
copy /tmp/fe24_tpu3.json  BENCH_LOCAL_r4_fe24boot.json
copy /tmp/rb4_token.json  BENCH_LOCAL_r4_token_cold.json
copy /tmp/rb4_token_warm.json BENCH_LOCAL_r4_token_warm.json
copy /tmp/rb4_streams.json BENCH_LOCAL_r4_streams.json
copy /tmp/rb4_rag.json    BENCH_LOCAL_r4_rag.json
copy /tmp/rb4_ntt8k.json  BENCH_LOCAL_r4_ntt.json
