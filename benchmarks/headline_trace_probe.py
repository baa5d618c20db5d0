"""Attribute the headline round's device time op-by-op (VERDICT r2 weak #4).

Captures a jax.profiler trace of one scan(200) of the headline workload
(16-client CAP-GAN MNIST, f32, epoch=1), separates the device lanes
(the single "XLA Modules" event is the true device time; the "XLA Ops"
lane nests leaf ops inside the while.N container), buckets the leaf ops
into matmul / glue / copy via the compiled HLO's op_name annotations, and
prints the decomposition that settles where the ~0.29 ms round goes —
whether the ~50% whole-round MFU figure is a latency floor or a missed
optimization.  Findings as of round 3 (v5e via axon):

    wall 0.289 ms/round = 0.255 device (88% occupancy) + dispatch
    device leaf 0.240 ms = 0.174 matmul (31 dot fusions, 72 TFLOP/s
      aggregate = ~73% of f32 peak inside the matmuls)
      + 0.040 glue (132 fusions, largest 7.5 us — already fused)
      + 0.026 copies (mostly HBM->VMEM staging of the 512x1024 and
        1024x784 G trunk weights, re-staged per forward/backward pass)
    biggest single op: the per-client D weight-grad batched matmul
      [16,784,B]x[16,B,512] at ~22 TFLOP/s — contraction dim = the
      per-client batch (~106), inherent to 16 independent small Ds.

Run on the TPU:

    python -m benchmarks.headline_trace_probe
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import scan_rounds
from cglgan_tpu.core.config import FedGANConfig

TRACE_DIR = "/tmp/xprof_headline"
CHUNK = 200
# container (non-leaf) trace rows: exact control-flow frame names with an
# optional .N suffix, or jit_* module frames — anchored so a leaf op that
# merely starts with one of these words is never dropped from the totals
_CONTAINER = re.compile(r"(?:(?:while|body|condition|region)(?:\.\d+)?|jit_.*)$")


def main():
    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=16, num_servers=1, iid=1, batch_size=100,
                       epoch=1, num_communication=20000)
    runner = build_runner(cfg)
    state = runner.init_state()
    run = scan_rounds(runner.round_fn, CHUNK)
    compiled = jax.jit(lambda s: run(s)).lower(state).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    # XLA counts a while body ONCE regardless of trip count, so this is
    # per-ROUND flops (verified: identical for CHUNK=50 and 100)
    round_gflop = ca.get("flops", 0.0) / 1e9
    state, _ = run(state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        state, _ = run(state)
        jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    print(f"scan({CHUNK}) wall-with-profiler {wall / CHUNK * 1e3:.3f} ms/round"
          f"   (round flops {round_gflop:.2f} GFLOP)", flush=True)

    traces = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"profiler produced no trace file under {TRACE_DIR} "
                         "(is the TPU plugin's profiler available?)")
    f = traces[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)

    # lanes: thread_name metadata -> (pid, tid)
    names = {}
    lanes = collections.defaultdict(list)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e.get("tid"))] = e["args"]["name"]
        elif e.get("ph") == "X":
            lanes[(e["pid"], e.get("tid"))].append(e)
    ops_lane, mod_lane = None, None
    for k, n in names.items():
        if n == "XLA Ops":
            ops_lane = lanes[k]
        elif n == "XLA Modules":
            mod_lane = lanes[k]
    if not ops_lane:
        raise SystemExit("no 'XLA Ops' device lane in the trace")
    if mod_lane:
        dev = sum(e.get("dur", 0) for e in mod_lane) / 1e3 / CHUNK
        print(f"device (XLA Modules lane): {dev:.4f} ms/round", flush=True)

    # op_name annotations from the HLO
    ann = {}
    for m in re.finditer(r"%?([\w.\-]+) = [^\n]*op_name=\"([^\"]+)\"", hlo):
        ann[m.group(1)] = m.group(2)

    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ops_lane:
        if not _CONTAINER.match(e["name"]):       # leaf ops only
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(dur.values())

    classes = collections.Counter()
    ccnt = collections.Counter()
    for op, d in dur.items():
        a = ann.get(op, "")
        if a.endswith("dot_general") or "/conv" in a:
            c = "matmul"
        elif "copy" in op:
            # device copies regardless of annotation (an annotated copy
            # still moves bytes, it is not compute glue)
            c = "copy"
        else:
            c = "glue"
        classes[c] += d
        ccnt[c] += 1
    print(f"device leaf total {total / 1e3 / CHUNK:.4f} ms/round "
          f"({sum(cnt.values())} events, {len(dur)} distinct ops)", flush=True)
    for c, d in classes.most_common():
        line = f"  {c:7} {d / 1e3 / CHUNK:8.4f} ms/round {100 * d / total:5.1f}%  n={ccnt[c]}"
        if c == "matmul" and d:
            line += f"   -> {round_gflop / (d / 1e3 / CHUNK) * 1e3:.0f} GFLOP/s aggregate"
        print(line, flush=True)

    print(f"{'ms/round':>9}  {'%':>5}  op", flush=True)
    for name, d in dur.most_common(15):
        a = ann.get(name, "")
        a = re.sub(r"^jit\(<lambda>\)/jit\(run\)/while/body/closed_call/?", "", a)
        print(f"{d / 1e3 / CHUNK:9.4f}  {100 * d / total:5.1f}  {name}  {a[:90]}",
              flush=True)


if __name__ == "__main__":
    main()
