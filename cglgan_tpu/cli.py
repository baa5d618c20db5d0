"""tpufed — the experiment harness CLI.

Each ``tpufed run <algo>`` maps 1:1 onto a reference entry script with the
same knob names (SURVEY.md §7.4):

    tpufed run capgan --dataset mnist --num-workers 16 --num-servers 4 \
                      --iid 1 --epoch 1 --batch-size 100 --cloud-epoch 1 \
                      --segema 0.0 --rounds 20000
    tpufed run flgan  --dataset 2dmg --num-class 10 --num-sample 1000 ...
    tpufed run mixgan --E 5 ...      # every-E-rounds neighbour D-share, real

Replaces the reference ``__main__`` blocks (topology wiring, run-dir
creation, thread start/join — CGLGAN/MNIST/main.py:459-535) with: build
partition -> build jitted runner -> scan-train with eval ticks -> JSONL/CSV
metrics + PNG artifacts + Orbax checkpoints.
"""
from __future__ import annotations

import argparse
import os
import sys

from cglgan_tpu.core.config import ALGOS, DATASETS, FedGANConfig, WEIGHTINGS


def _add_run_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("algo", choices=ALGOS)
    p.add_argument("--dataset", default="2dmg", choices=DATASETS)
    p.add_argument("--num-workers", type=int, default=10)
    p.add_argument("--num-servers", type=int, default=1)
    p.add_argument("--num-class", type=int, default=10)
    p.add_argument("--num-sample", type=int, default=1000)
    p.add_argument("--iid", type=int, default=1, choices=(0, 1, 2))
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--frac-workers", type=float, default=1.0)
    p.add_argument("--epoch", type=int, default=1)
    p.add_argument("-E", "--E", type=int, default=0, dest="E",
                   help="gossip/D-share period in rounds (0 = off)")
    p.add_argument("-c", "--cloud-epoch", type=int, default=1)
    p.add_argument("-s", "--segema", type=float, default=0.0)
    p.add_argument("--rounds", type=int, default=None,
                   help="num_communication override (default: 10000 for 2dmg, "
                        "20000 for images — the reference scales)")
    p.add_argument("--num-plt", type=int, default=None,
                   help="eval cadence (default: 100 for 2dmg, 500 for images)")
    p.add_argument("--lr-g", type=float, default=2e-4)
    p.add_argument("--lr-d", type=float, default=2e-4)
    p.add_argument("--b1", type=float, default=0.5, help="Adam beta1")
    p.add_argument("--b2", type=float, default=0.999, help="Adam beta2")
    p.add_argument("--lr-lambda", type=float, default=0.1,
                   help="SGD lr for the Lambda game variable")
    p.add_argument("--img-size", type=int, default=28)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="param/activation dtype (bfloat16: +32%% rounds/s; "
                        "see PERF.md)")
    p.add_argument("--seed", type=int, default=20211212)
    p.add_argument("--weighting", default=None, choices=WEIGHTINGS)
    p.add_argument("--dropout-rate", type=float, default=0.0,
                   help="P(client misses a round) — straggler simulation "
                        "(flgan/mdgan/acgan/fegan)")
    p.add_argument("--conv", action="store_true",
                   help="use the conv LSGAN G/D pair (model/lsgan.py parity)")
    p.add_argument("--data-dir", default=None,
                   help="directory with MNIST IDX files (else synthetic)")
    p.add_argument("--out", default="./logger", help="run-dir root")
    p.add_argument("--name", default=None, help="run-dir name")
    p.add_argument("--ckpt-every", type=int, default=5000,
                   help="checkpoint cadence in rounds (reference: 5000)")
    p.add_argument("--resume", default=None,
                   help="path to a checkpoint to resume from")
    p.add_argument("--platform", default=None,
                   help="force a jax platform, e.g. cpu")
    p.add_argument("--devices", type=int, default=0,
                   help="shard clients over the first N devices "
                        "(0 = single-device, no mesh)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of one eval chunk")


def cfg_from_args(args) -> FedGANConfig:
    is_image = args.dataset != "2dmg"
    rounds = args.rounds if args.rounds is not None else (
        20000 if is_image else 10000)
    num_plt = args.num_plt if args.num_plt is not None else (
        500 if is_image else 100)
    return FedGANConfig(
        algo=args.algo, dataset=args.dataset, num_workers=args.num_workers,
        num_servers=args.num_servers, num_class=args.num_class,
        num_sample=args.num_sample, iid=args.iid, batch_size=args.batch_size,
        frac_workers=args.frac_workers, epoch=args.epoch,
        E=args.E, cloud_epoch=args.cloud_epoch, segema=args.segema,
        num_communication=rounds, num_plt=num_plt, lr_g=args.lr_g,
        lr_d=args.lr_d, b1=args.b1, b2=args.b2, lr_lambda=args.lr_lambda,
        img_size=args.img_size, seed=args.seed, weighting=args.weighting,
        conv=args.conv, data_dir=args.data_dir,
        dropout_rate=args.dropout_rate, dtype=args.dtype)


def cmd_run(args) -> int:
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from cglgan_tpu.algos.registry import build_runner, load_partition
    from cglgan_tpu.algos.runner import train
    from cglgan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    from cglgan_tpu.utils.imaging import save_image_grid, save_scatter_2d
    from cglgan_tpu.utils.logging import RunDir

    cfg = cfg_from_args(args)
    if cfg.dataset in ("mnist", "fashion-mnist") and not cfg.data_dir:
        print(f"[tpufed] WARNING: no --data-dir given for {cfg.dataset}; "
              "falling back to the deterministic synthetic glyph dataset "
              "(same shapes/cardinality, not handwriting)")
    part = load_partition(cfg)
    run_dir = RunDir(args.out, args.name, cfg)
    print(f"[tpufed] run dir: {run_dir.path}")
    print(f"[tpufed] devices: {jax.devices()}")
    print(f"[tpufed] shards: {part.lengths.tolist()}")

    # per-device distribution previews (CGLGAN/MNIST/main.py:499-501)
    img_side = cfg.img_size + 4 if cfg.conv else cfg.img_size
    for i in range(min(cfg.num_workers, 32)):
        L = int(part.lengths[i])
        sel = part.data[i, :min(L, 100)]
        if cfg.is_image:
            save_image_grid(sel.reshape(-1, img_side, img_side).astype(
                np.float32) / 255.0,
                            run_dir.file(f"device_{i}.png"), normalize=False)
        else:
            save_scatter_2d(run_dir.file(f"device_{i}.png"), sel)

    mesh = None
    if args.devices:
        from cglgan_tpu.core.meshes import client_mesh
        mesh = client_mesh(args.devices)
        print(f"[tpufed] clients mesh over {args.devices} devices")
    runner = build_runner(cfg, part, mesh=mesh)
    state = runner.init_state()
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"[tpufed] resumed from {args.resume} at round {int(state.t)}")

    eval_pool = np.asarray(part.eval_pool)

    def on_tick(t, tick):
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(tick.items())
                       if isinstance(v, float))
        print(f"[tpufed] round {t}: {msg}")
        run_dir.log(tick)
        samples = np.asarray(runner.sample(state_box[0], min(100, cfg.num_sample)))
        if cfg.is_image:
            save_image_grid(samples, run_dir.file(f"{t}.png"))
        else:
            save_scatter_2d(run_dir.file(f"{t}.png"), eval_pool[:2000], samples)
        if args.ckpt_every and t % args.ckpt_every == 0:
            save_checkpoint(run_dir.file(f"ckpt_{t}"), state_box[0])

    # on_tick needs the evolving state; the loop below updates this box
    state_box = [state]

    remaining = cfg.num_communication - int(state.t)
    if remaining <= 0:
        print("[tpufed] nothing to do (state already past num_communication)")
        return 0

    if args.profile:
        from cglgan_tpu.utils.profiling import trace
        with trace(run_dir.file("profile")):
            out = train(runner, rounds=min(cfg.num_plt, remaining),
                        state=state)
        state_box[0] = out["state"]
        print(f"[tpufed] profile written to {run_dir.file('profile')}")
        return 0

    # chunked manual loop so on_tick sees the current state
    from cglgan_tpu.algos.runner import scan_rounds
    from cglgan_tpu.evalx.hist2d import kl_and_distribution_score, mode_coverage
    import time as _time

    if cfg.is_image:
        # FID/IS per tick on 100-image subsamples, the reference protocol
        # (FLGAN/MNIST/flgan.py:89-98).  Feature space: fixed random conv
        # embedding (no Inception weights exist in a zero-egress image —
        # see evalx/fid.py); IS uses a probe classifier trained on the data.
        from cglgan_tpu.evalx.fid import (classifier_probe,
                                          conv_feature_extractor, fid,
                                          inception_score)
        extractor = conv_feature_extractor(img_side)
        data_all = part.data.reshape(-1, img_side, img_side)
        labels_all = part.labels.reshape(-1)
        probe = classifier_probe(data_all[:20000], labels_all[:20000],
                                 cfg.num_class, steps=300)
        real_eval = (eval_pool[:100].astype(np.float32) / 255.0 - 0.5) / 0.5
        real_eval = real_eval.reshape(-1, 1, img_side, img_side)

    chunk_n = max(1, min(cfg.num_plt, remaining))
    chunk = scan_rounds(runner.round_fn, chunk_n)
    t0 = _time.perf_counter()
    done = int(state.t)
    while done < cfg.num_communication:
        n = min(chunk_n, cfg.num_communication - done)  # exact round count
        if n != chunk_n:
            chunk = scan_rounds(runner.round_fn, n)
            chunk_n = n
        state, metrics = chunk(state)
        state_box[0] = state
        done = int(state.t)
        tick = {k: float(v) for k, v in metrics.items()}
        tick["round"] = done
        if not cfg.is_image:
            # MD-GAN evaluates on 32-bin histograms, everything else 16
            # (MDGAN/2DMG/mdgan.py:69 vs ACGAN/2DMG/acgan.py:64)
            bins = 32 if cfg.algo == "mdgan" else 16
            samples = runner.sample(state, cfg.num_sample)
            kl, ds = kl_and_distribution_score(samples, eval_pool, bins)
            tick["kl_score"] = float(kl)
            tick["distribution_score"] = float(ds)
            tick["mode_coverage"] = float(mode_coverage(samples, eval_pool,
                                                        bins))
        else:
            gen = np.asarray(runner.sample(state, 100)).reshape(
                -1, 1, img_side, img_side)[:100]
            tick["fid"] = fid(extractor, gen, real_eval)
            tick["inception_score"] = inception_score(probe, gen,
                                                      cfg.num_class)
        tick["wall_s"] = _time.perf_counter() - t0
        tick["rounds_per_s"] = done / max(tick["wall_s"], 1e-9)
        on_tick(done, tick)
    save_checkpoint(run_dir.file("ckpt_final"), state)
    run_dir.close()
    print(f"[tpufed] done: {done} rounds in {_time.perf_counter()-t0:.1f}s")
    return 0


def cmd_bench(args) -> int:
    import bench
    bench.main()
    return 0


def cmd_eval(args) -> int:
    """Score a saved checkpoint: rebuild the runner from the run dir's
    config.json, restore, sample, and report the workload's metrics."""
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import json

    import numpy as np

    from cglgan_tpu.algos.registry import build_runner
    from cglgan_tpu.core.config import FedGANConfig
    from cglgan_tpu.utils.checkpoint import restore_checkpoint
    from cglgan_tpu.utils.imaging import save_image_grid, save_scatter_2d

    run_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = FedGANConfig(**json.load(f))
    runner = build_runner(cfg)
    state = restore_checkpoint(args.checkpoint, runner.init_state())
    print(f"[tpufed] checkpoint at round {int(state.t)}")
    samples = np.asarray(runner.sample(state, args.n))
    out = args.out or os.path.join(run_dir, f"eval_{int(state.t)}")
    report = {"round": int(state.t), "n": args.n}
    if cfg.is_image:
        side = cfg.img_size + 4 if cfg.conv else cfg.img_size
        save_image_grid(samples.reshape(-1, 1, side, side)[:100],
                        out + ".png")
        from cglgan_tpu.evalx.fid import conv_feature_extractor, fid
        from cglgan_tpu.algos.registry import load_partition
        part = load_partition(cfg)
        real = (part.eval_pool[:args.n].astype(np.float32) / 255. - .5) / .5
        report["fid"] = fid(conv_feature_extractor(side),
                            samples.reshape(-1, 1, side, side)[:args.n],
                            real.reshape(-1, 1, side, side))
    else:
        from cglgan_tpu.algos.registry import load_partition
        from cglgan_tpu.evalx.hist2d import (kl_and_distribution_score,
                                             mode_coverage)
        part = load_partition(cfg)
        save_scatter_2d(out + ".png", part.eval_pool[:2000], samples)
        bins = 32 if cfg.algo == "mdgan" else 16
        kl, ds = kl_and_distribution_score(samples, part.eval_pool, bins)
        report["kl_score"] = float(kl)
        report["distribution_score"] = float(ds)
        report["mode_coverage"] = float(mode_coverage(samples,
                                                      part.eval_pool, bins))
    print(json.dumps(report))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="tpufed",
                                     description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="cmd", required=True)
    prun = sub.add_parser("run", help="train one algorithm")
    _add_run_args(prun)
    prun.set_defaults(fn=cmd_run)
    pbench = sub.add_parser("bench", help="run the headline benchmark")
    pbench.set_defaults(fn=cmd_bench)
    peval = sub.add_parser("eval", help="score a saved checkpoint")
    peval.add_argument("checkpoint", help="path to an Orbax checkpoint dir "
                                          "inside a run dir")
    peval.add_argument("--n", type=int, default=1000)
    peval.add_argument("--out", default=None)
    peval.add_argument("--platform", default=None)
    peval.set_defaults(fn=cmd_eval)
    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
