#!/usr/bin/env bash
# One-shot refresh of every benchmark artifact on the real TPU.
# Run from the repo root when the device tunnel is up:
#   bash benchmarks/refresh_all.sh
# Updates benchmarks/{results,roofline,vst_latency}.json and prints the
# headline bench.py line + per-component breakdown to stdout.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== headline (bench.py) =="
timeout 900 python bench.py

echo "== full workload suite (results.json) =="
timeout 1800 python benchmarks/run_all.py --iters 30 \
    --out benchmarks/results.json

echo "== per-component breakdown (canonical batch-64 train step) =="
timeout 1800 python benchmarks/breakdown.py --batch 64 --iters 30

echo "== roofline/MFU accounting (roofline.json) =="
timeout 1800 python benchmarks/roofline.py

echo "== VST streaming latency (vst_latency.json) =="
timeout 1800 python benchmarks/vst_latency.py

echo "== regenerate doc numbers from the JSONs =="
python benchmarks/gen_docs.py

echo "Done. Review the JSONs + regenerated README/docs/DESIGN.md blocks"
echo "and commit. (Doc numbers are never hand-edited: gen_docs.py"
echo "derives them from the committed measurement artifacts.)"
