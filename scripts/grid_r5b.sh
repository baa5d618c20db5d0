#!/usr/bin/env bash
# Round-5b: the MNIST FL-GAN legs of the reference's executed matrix that
# grid_r4b.sh defined but never reached (the round boundary cut it off after
# the mdgan legs, and grid_r5.sh re-listed only the fashion half):
#   FLGAN/MNIST/flgan.py:33-38,336-359 -> 10w/1s, iid in {1,2}, epoch in
#   {1,5}; the epoch=5 leg archived at iid=1 as the ep-sweep representative
#   (same convention as the fashion legs in grid_r4c.sh).
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

for iid in 1 2; do
  run "mnist-ref-iid$iid-flgan" flgan --dataset mnist --num-workers 10 \
      --num-servers 1 --num-sample 1000 --iid $iid \
      --rounds 20000 --num-plt 2000
done

run mnist-ref-iid1-flgan-e5 flgan --dataset mnist --num-workers 10 \
    --num-servers 1 --num-sample 1000 --iid 1 --epoch 5 \
    --rounds 20000 --num-plt 2000

touch /tmp/grid_r5b.done
echo ALL DONE
