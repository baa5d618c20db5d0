#!/usr/bin/env bash
# Regenerate results/summary.{csv,xlsx} over every COMPLETED archived run
# (final metrics round == the config's num_communication; in-flight grid
# legs are excluded).  The freshness guards in tests/test_results_archive.py
# pin the aggregate to the archive — run this after every grid.
set -eu
cd "$(dirname "$0")/.."
python - <<'EOF'
import json
import os
import subprocess
import sys

runs = []
for name in sorted(os.listdir("results/runs")):
    d = os.path.join("results/runs", name)
    cfg_p = os.path.join(d, "config.json")
    met_p = os.path.join(d, "metrics.jsonl")
    if not (os.path.isdir(d) and os.path.isfile(cfg_p)
            and os.path.isfile(met_p)):
        continue
    with open(cfg_p) as f:
        cfg = json.load(f)
    last = None
    with open(met_p) as f:
        for line in f:
            if line.strip():
                last = json.loads(line)
    if last is not None and last.get("round") == cfg["num_communication"]:
        runs.append(d)
print(f"[regen_summary] {len(runs)} completed runs")
sys.exit(subprocess.call([sys.executable, "-m", "cglgan_tpu.cli", "compare",
                          *runs, "--out", "results/summary"]))
EOF
