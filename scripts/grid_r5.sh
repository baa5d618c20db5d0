#!/usr/bin/env bash
# Round-5 results grid (VERDICT r4 items 1, 6 + the cut-off grid_r4c legs):
#
# (a) CAPGAN/MNIST beta_gamma variants — the two reference entry scripts
#     whose distinguishing weighting s = softmax(beta*gamma) had no archived
#     end-to-end run.  Knobs = the scripts' module globals 1:1:
#       CAPGAN/MNIST/capgan.py:34-50  -> 10w/1s, cloud_epoch=0, iid=1
#                                        (__main__ :478 runs k in range(1,2))
#       CAPGAN/MNIST/mixed-gan.py:41-60 -> 10w/5s, cloud_epoch=1, iid=1
#     weighting: capgan.py:241-243 / mixed-gan.py:276-278.
# (b) 2DMG reference-exact iid=1 legs — the reference's 2DMG mains loop
#     `for k in range(1, 3)` i.e. iid in {1,2} (ACGAN/2DMG/acgan.py:327-331);
#     round 4 archived only iid=2.  Same scales as scripts/grid_r4.sh (b).
# (c) Fashion legs of the reference's executed matrices (grid_r4c.sh was cut
#     off by the round boundary; re-listed verbatim):
#       MDGAN/MNIST/mdgan.py:364,382 -> both datasets x iid in {0,1,2}, 10w/1s
#       FLGAN/MNIST/flgan.py:339-359 -> epoch in {1,5} x both x iid in {1,2}
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

# --- (a) CAPGAN/MNIST beta_gamma reference-exact legs ------------------------
run mnist-ref-iid1-capgan-bg capgan --dataset mnist --num-workers 10 \
    --num-servers 1 --num-sample 1000 --iid 1 --cloud-epoch 0 --segema 0 \
    --weighting beta_gamma --rounds 20000 --num-plt 2000
run mnist-ref-iid1-mixgan-bg mixgan --dataset mnist --num-workers 10 \
    --num-servers 5 --num-sample 1000 --iid 1 --cloud-epoch 1 --segema 0 \
    --weighting beta_gamma --rounds 20000 --num-plt 2000

# --- (b) 2DMG reference-exact iid=1 -----------------------------------------
run 2dmg-ref-iid1-acgan  acgan  --dataset 2dmg --num-workers 20 --num-servers 5 \
    --num-class 10 --num-sample 10000 --iid 1 --rounds 10000 --num-plt 100
run 2dmg-ref-iid1-flgan  flgan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 1000 --iid 1 --epoch 5 --rounds 10000 --num-plt 100
run 2dmg-ref-iid1-mdgan  mdgan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 1000 --iid 1 --rounds 10000 --num-plt 100
for a in cglgan capgan mixgan; do
  run "2dmg-ref-iid1-$a" "$a" --dataset 2dmg --num-workers 10 --num-servers 5 \
      --num-class 10 --num-sample 10000 --iid 1 --cloud-epoch 1 \
      --rounds 10000 --num-plt 100
done
run 2dmg-ref-iid1-fegan  fegan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 10000 --iid 1 --rounds 10000 --num-plt 100

# --- (c) fashion-ref executed-matrix legs (grid_r4c completion) ---------------
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

touch /tmp/grid_r5.done
echo ALL DONE
