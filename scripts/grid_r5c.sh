#!/usr/bin/env bash
# Round-5c: the last two legs of FLGAN/MNIST's executed matrix
# (FLGAN/MNIST/flgan.py:336-359 loops epoch in {1,5} x dataset in
# {MNIST, Fashion} x iid in {1,2} = 8 legs).  grid_r4b/r4c/r5b archived
# 6 of 8, scoping the epoch=5 sweep to iid=1 as its representative; this
# script completes the matrix with the epoch=5 iid=2 legs so every
# executed (epoch, dataset, iid) triple has a 1:1 archived run.
set -u
cd /root/repo
R=results/runs
L=results/logs
run() {
  local name="$1"; local tmo="$2"; shift 2
  if [ -f "$R/$name/metrics.csv" ]; then echo "SKIP $name (exists)"; return 0; fi
  echo "=== $name: $*"
  local t0=$(date +%s)
  timeout "$tmo" python -m cglgan_tpu.cli run "$@" --out "$R" --name "$name" \
      > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? in $(( $(date +%s) - t0 ))s"
}

run mnist-ref-iid2-flgan-e5 "${T1:-4500}" flgan --dataset mnist \
    --num-workers 10 --num-servers 1 --num-sample 1000 --iid 2 --epoch 5 \
    --rounds 20000 --num-plt 2000

run fashion-ref-iid2-flgan-e5 "${T2:-4500}" flgan --dataset fashion-mnist \
    --num-workers 10 --num-servers 1 --num-sample 1000 --iid 2 --epoch 5 \
    --rounds 20000 --num-plt 2000

touch /tmp/grid_r5c.done
echo ALL DONE
