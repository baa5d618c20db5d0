#!/usr/bin/env bash
# Round-4 results grid: (a) complete the fashion-iid2 hole, (b) archive the
# reference-exact-scale grids (VERDICT r3 items 1+2).
#
# Each run's knobs equal the matching reference script's module globals 1:1:
#   ACGAN/2DMG/acgan.py:22-33   -> 20w/5s, 10000/class, iid=2, 10000 rounds
#   FLGAN/2DMG/flgan.py:41-57   -> 10w/1s,  1000/class, iid=2, epoch=5
#   MDGAN/2DMG/mdgan.py:41-57   -> 10w/1s,  1000/class, iid=2
#   CGLGAN/2DMG/main.py:36-58   -> 10w/5s, 10000/class (harness iid in {1,2})
#   CGLGAN/MNIST/main.py:40-56  -> 20w/5s,  1000/class, 20000 rounds
#   mixed-gan.py:41-57          -> 10w/5s (also run at 20w/5s per CGL harness)
#   capgan.py:34-50             -> 10w/1s
#   fegan.py:43-59              -> 10w/1s, frac_workers=0.2
# capgan/mixgan/fegan have no 2DMG reference script; they run at the
# CGLGAN/2DMG scale (fegan single-server) to fill the seven-algo grid.
set -u
cd /root/repo
R=results/runs
L=results/logs
run() {
  local name="$1"; shift
  if [ -f "$R/$name/metrics.csv" ]; then echo "SKIP $name (exists)"; return 0; fi
  echo "=== $name: $*"
  local t0=$(date +%s)
  timeout 3600 python -m cglgan_tpu.cli run "$@" --out "$R" --name "$name" \
      > "$L/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc in $(( $(date +%s) - t0 ))s"
}

# --- (a) fashion-iid2 grid completion (same scale as the fashion-iid1 runs) --
for a in flgan fegan capgan cglgan mixgan; do
  s=1; [ "$a" = cglgan ] && s=4; [ "$a" = mixgan ] && s=4
  run "fashion-iid2-$a" "$a" --dataset fashion-mnist --num-workers 16 \
      --num-servers $s --num-sample 1000 --iid 2 --rounds 20000 --num-plt 2000
done

# --- (b) 2DMG at reference-exact module defaults ----------------------------
run 2dmg-ref-acgan  acgan  --dataset 2dmg --num-workers 20 --num-servers 5 \
    --num-class 10 --num-sample 10000 --iid 2 --rounds 10000 --num-plt 100
run 2dmg-ref-flgan  flgan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 1000 --iid 2 --epoch 5 --rounds 10000 --num-plt 100
run 2dmg-ref-mdgan  mdgan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 1000 --iid 2 --rounds 10000 --num-plt 100
for a in cglgan capgan mixgan; do
  run "2dmg-ref-$a" "$a" --dataset 2dmg --num-workers 10 --num-servers 5 \
      --num-class 10 --num-sample 10000 --iid 2 --cloud-epoch 1 \
      --rounds 10000 --num-plt 100
done
run 2dmg-ref-fegan  fegan  --dataset 2dmg --num-workers 10 --num-servers 1 \
    --num-class 10 --num-sample 10000 --iid 2 --rounds 10000 --num-plt 100

# --- (c) MNIST CGL/Mix at the CGLGAN/MNIST harness scale (20w/5s) -----------
for iid in 1 2; do
  for a in cglgan mixgan; do
    run "mnist-ref-iid$iid-$a" "$a" --dataset mnist --num-workers 20 \
        --num-servers 5 --num-sample 1000 --iid $iid --cloud-epoch 1 \
        --segema 0 --rounds 20000 --num-plt 2000
  done
done

# --- (d) root-script-exact MNIST scales (capgan 10w/1s, mixgan 10w/5s,
#         fegan 10w/1s frac=0.2) ---------------------------------------------
for iid in 1 2; do
  run "mnist-ref-iid$iid-capgan" capgan --dataset mnist --num-workers 10 \
      --num-servers 1 --num-sample 1000 --iid $iid --cloud-epoch 1 \
      --segema 0 --rounds 20000 --num-plt 2000
  run "mnist-ref-iid$iid-mixgan10" mixgan --dataset mnist --num-workers 10 \
      --num-servers 5 --num-sample 1000 --iid $iid --cloud-epoch 1 \
      --segema 0 --rounds 20000 --num-plt 2000
  run "mnist-ref-iid$iid-fegan" fegan --dataset mnist --num-workers 10 \
      --num-servers 1 --num-sample 1000 --iid $iid --frac-workers 0.2 \
      --rounds 20000 --num-plt 2000
done

touch /tmp/grid_r4.done
echo ALL DONE
