#!/bin/bash
# Full verification sweep (CPU, 8 virtual devices). ~25-40 min on a slow host.
#
# The suite runs sharded per-file across 2 worker processes (pytest-xdist
# --dist loadfile). A monolithic single-process run accumulates XLA:CPU
# compiler session state until the compiler segfaults (~85 tests in, at a
# fused_project compile; every test passes when files run in fresh
# processes — see docs/NOTES_r4.md). loadfile keeps each file's tests in
# one worker, preserving per-file fixture/cache behavior.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q -p no:cacheprovider -n 2 --dist loadfile "$@"
