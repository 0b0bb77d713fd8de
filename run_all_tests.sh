#!/bin/bash
# Full verification sweep (CPU, 8 virtual devices). ~25-40 min on a slow host.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q -p no:cacheprovider "$@"
