#!/usr/bin/env bash
# Round-4b: MNIST baselines at the reference scripts' exact executed
# matrices (completing scripts/grid_r4.sh, which covered CGL/Mix/CAP/FeGAN).
#
#   ACGAN/MNIST/acgan.py:32-43,c.380-400 -> 10w/5s, iid=1 only (its main
#       loop is `for k in range(1, 2)`), epoch=1, 20000 rounds
#   MDGAN/MNIST/mdgan.py:35-40,382-385   -> 10w/1s, iid in {0,1,2}
#   FLGAN/MNIST/flgan.py:33-38,336-359   -> 10w/1s, iid in {1,2},
#       epoch in {1,5} (full local epochs per round); the epoch=5 leg is
#       archived at iid=1 as the representative of the ep sweep
#
# Eval cadence stays num_plt=2000 (consistent with the other mnist-ref-*
# archives; the reference paints every 500 — eval cadence, not a training
# knob).
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

run mnist-ref-iid1-acgan acgan --dataset mnist --num-workers 10 \
    --num-servers 5 --num-sample 1000 --iid 1 --rounds 20000 --num-plt 2000

for iid in 0 1 2; do
  run "mnist-ref-iid$iid-mdgan" mdgan --dataset mnist --num-workers 10 \
      --num-servers 1 --num-sample 1000 --iid $iid --rounds 20000 --num-plt 2000
done

for iid in 1 2; do
  run "mnist-ref-iid$iid-flgan" flgan --dataset mnist --num-workers 10 \
      --num-servers 1 --num-sample 1000 --iid $iid --rounds 20000 --num-plt 2000
done

run mnist-ref-iid1-flgan-e5 flgan --dataset mnist --num-workers 10 \
    --num-servers 1 --num-sample 1000 --iid 1 --epoch 5 --rounds 20000 \
    --num-plt 2000

touch /tmp/grid_r4b.done
echo ALL DONE
