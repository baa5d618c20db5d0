#!/usr/bin/env bash
# Round-4c: the Fashion-MNIST legs of the reference's EXECUTED matrices
# (completes grid_r4.sh + grid_r4b.sh).  Only two reference scripts ever
# execute the Fashion branch:
#   MDGAN/MNIST/mdgan.py:364,382 -> for l in range(2) x for k in range(3):
#       both datasets x iid in {0,1,2}, 10w/1s
#   FLGAN/MNIST/flgan.py:339-359 -> epoch in {1,5} x both datasets x
#       iid in {1,2}, 10w/1s; the epoch=5 leg is archived at iid=1 as the
#       representative of the ep sweep (as in grid_r4b for mnist)
# (capgan.py:461/479, mixed-gan.py:512/530, fegan.py:456/474 and the
# CGLGAN/ACGAN/CAPGAN mains all run `for l in range(1)` — MNIST only.)
set -u
cd /root/repo
R=results/runs
L=results/logs
run() {
  local name="$1"; shift
  if [ -f "$R/$name/metrics.csv" ]; then echo "SKIP $name (exists)"; return 0; fi
  echo "=== $name: $*"
  local t0=$(date +%s)
  timeout 7200 python -m cglgan_tpu.cli run "$@" --out "$R" --name "$name" \
      > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? in $(( $(date +%s) - t0 ))s"
}

for iid in 0 1 2; do
  run "fashion-ref-iid$iid-mdgan" mdgan --dataset fashion-mnist \
      --num-workers 10 --num-servers 1 --num-sample 1000 --iid $iid \
      --rounds 20000 --num-plt 2000
done

for iid in 1 2; do
  run "fashion-ref-iid$iid-flgan" flgan --dataset fashion-mnist \
      --num-workers 10 --num-servers 1 --num-sample 1000 --iid $iid \
      --rounds 20000 --num-plt 2000
done

run fashion-ref-iid1-flgan-e5 flgan --dataset fashion-mnist \
    --num-workers 10 --num-servers 1 --num-sample 1000 --iid 1 --epoch 5 \
    --rounds 20000 --num-plt 2000

touch /tmp/grid_r4c.done
echo ALL DONE
