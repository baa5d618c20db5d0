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

# mirrors models.zoo.GEN_SPECS (asserted equal in tests/test_cli.py) —
# cli.py keeps its top-level imports jax-free so `tpufed doctor` can probe
# a wedged backend without importing it
GEN_SPECS = ("2dmg-small", "2dmg-mlp", "2dmg-multipath", "mnist-mlp",
             "mnist-multipath", "conv", "conv-multipath")


def _add_run_args(p: argparse.ArgumentParser, with_algo: bool = True) -> None:
    if with_algo:
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
    p.add_argument("--force-dtype", action="store_true",
                   help="override the bfloat16+2dmg fidelity guard "
                        "(measured DS 0.03 vs 0.91 f32 — PERF.md)")
    p.add_argument("--seed", type=int, default=20211212)
    p.add_argument("--weighting", default=None, choices=WEIGHTINGS)
    p.add_argument("--gossip", default="mean", choices=("mean", "delta"),
                   help="AC-GAN every-E-rounds exchange: 'mean' = block "
                        "average of client Ds; 'delta' = the reference "
                        "sketch's delta-accumulating exchange "
                        "(ACGAN/MNIST/acgan.py:240-263)")
    p.add_argument("--d-swap", default="ring", choices=("ring", "shuffle"),
                   help="MD-GAN E-round D-swap: deterministic ring permute "
                        "or the reference's seeded random shuffle")
    p.add_argument("--dropout-rate", type=float, default=0.0,
                   help="P(client misses a round) — straggler simulation "
                        "(flgan/mdgan/acgan/fegan)")
    p.add_argument("--conv", action="store_true",
                   help="use the conv LSGAN G/D pair (model/lsgan.py parity)")
    p.add_argument("--data-dir", default=None,
                   help="directory with MNIST IDX files (else synthetic)")
    p.add_argument("--inception-weights", default=None,
                   help="torchvision inception_v3 state dict (.npz or .pth) "
                        "for reference-comparable FID (else: proxy features)")
    p.add_argument("--fid-stats", default=None,
                   help=".npz with precomputed real-image mu/sigma "
                        "activation stats (pytorch-fid format)")
    p.add_argument("--out", default="./logger", help="run-dir root")
    p.add_argument("--name", default=None, help="run-dir name")
    p.add_argument("--ckpt-every", type=int, default=5000,
                   help="checkpoint cadence in rounds (reference: 5000)")
    p.add_argument("--resume", default=None,
                   help="path to a checkpoint to resume from")
    p.add_argument("--init-from-torch", default=None,
                   help="comma list of reference .pt generator state_dicts "
                        "to warm-start from (one per stacked G, or one to "
                        "broadcast); optimizer state starts fresh")
    p.add_argument("--platform", default=None,
                   help="force a jax platform, e.g. cpu")
    p.add_argument("--devices", type=int, default=0,
                   help="shard clients over the first N devices "
                        "(0 = single-device, no mesh)")
    p.add_argument("--model-shards", type=int, default=1,
                   help="tensor-parallel generator shards over a `model` "
                        "mesh axis (must divide --devices; 1 = off)")
    p.add_argument("--pallas-dstep", default="auto",
                   choices=("auto", "on", "off"),
                   help="fused VMEM-resident local-D-epoch kernel "
                        "(~2.5x rounds at epoch>=2; auto = on when "
                        "eligible and epoch>1)")
    p.add_argument("--pallas-sweep", default="auto",
                   choices=("auto", "on", "off"),
                   help="fused local D/G-sweep kernel for 2DMG flgan/fegan "
                        "(measured slower than the XLA path on v5e; "
                        "auto/off = XLA path, on = force the kernel)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of one eval chunk")
    p.add_argument("--tensorboard", action="store_true",
                   help="also stream per-tick metrics as TensorBoard "
                        "scalars under <run>/tb/")
    p.add_argument("--from-config", default=None, metavar="CONFIG_JSON",
                   help="load the full knob set verbatim from a run dir's "
                        "config.json for an exact rerun (other knob flags "
                        "are ignored; runtime flags --out/--name/--devices/"
                        "--resume/... still apply)")
    _add_cache_arg(p)


def _add_cache_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument("--compile-cache", default="auto", metavar="DIR|off",
                   help="persistent XLA compilation cache directory "
                        "(auto = $CGLGAN_TPU_COMPILE_CACHE or "
                        "~/.cache/cglgan_tpu/xla; off = recompile every "
                        "process). Cuts the 20-100 s first-compile on "
                        "repeat runs to milliseconds.")


def _enable_compile_cache(args) -> None:
    from cglgan_tpu.utils import compile_cache
    val = getattr(args, "compile_cache", "auto")
    compile_cache.enable(None if val == "auto" else val)


def cfg_from_args(args) -> FedGANConfig:
    fc = getattr(args, "from_config", None)
    if fc:
        # exact rerun of an archived run: every run dir saves its frozen
        # config as config.json (RESULTS.md reproduces from these)
        import json
        with open(fc) as f:
            d = json.load(f)
        if args.algo != d.get("algo"):
            raise SystemExit(f"[tpufed] --from-config holds a "
                             f"{d.get('algo')!r} config but the command "
                             f"says {args.algo!r}")
        print(f"[tpufed] config loaded verbatim from {fc} "
              f"(other knob flags ignored; runtime flags still apply)")
        return FedGANConfig(**d)
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
        dropout_rate=args.dropout_rate, dtype=args.dtype,
        model_shards=getattr(args, "model_shards", 1),
        d_swap=getattr(args, "d_swap", "ring"),
        gossip=getattr(args, "gossip", "mean"),
        force_dtype=getattr(args, "force_dtype", False),
        pallas_dstep={"auto": None, "on": True, "off": False}[
            getattr(args, "pallas_dstep", "auto")],
        pallas_sweep={"auto": None, "on": True, "off": False}[
            getattr(args, "pallas_sweep", "auto")])


def cmd_run(args) -> int:
    _execute_run(args)
    return 0


def _execute_run(args) -> dict:
    """One training run; returns {"run_dir": path, "final": last tick dict}."""
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
    if cfg.dtype == "bfloat16" and cfg.dataset == "2dmg":
        # construction only succeeds here with force_dtype=True
        print("[tpufed] WARNING: --force-dtype bfloat16 on 2DMG — measured "
              "Distribution Score 0.03 vs 0.91 (float32) at 8k rounds "
              "(PERF.md); fidelity results from this run are not "
              "reference-comparable")
    part = load_partition(cfg)
    run_dir = RunDir(args.out, args.name, cfg,
                     tensorboard=getattr(args, "tensorboard", False))
    if cfg.dataset in ("mnist", "fashion-mnist") and not cfg.data_dir:
        # permanent marker so archived run dirs can never be mistaken for
        # real-handwriting/real-Fashion-MNIST results (the reference
        # downloads the real sets, e.g. MDGAN/MNIST/mdgan.py:376)
        with open(run_dir.file("DATA_SOURCE.txt"), "w") as f:
            f.write(
                f"dataset={cfg.dataset} trained on the DETERMINISTIC "
                "SYNTHETIC GLYPH BANK (cglgan_tpu/data/mnist.py), not the "
                "real torchvision download — this zero-egress environment "
                "has no access to the real archives.  Shapes, cardinality, "
                "label structure and Non-IID partitions match the real "
                "sets; pixel content does not.  Metrics are comparable "
                "across runs in this archive, NOT to runs on the real "
                "data.  Pass --data-dir with the IDX files to train on "
                "real data.\n")
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
    if args.devices or cfg.model_shards > 1:
        from cglgan_tpu.core.meshes import fed_mesh
        mesh = fed_mesh(args.devices or None, cfg.model_shards)
        print(f"[tpufed] mesh {dict(mesh.shape)}")
    runner = build_runner(cfg, part, mesh=mesh)
    state = runner.init_state()
    init_pts = getattr(args, "init_from_torch", None)
    if init_pts and args.resume:
        raise SystemExit("--init-from-torch and --resume are mutually "
                         "exclusive (a checkpoint already has generators)")
    if init_pts:
        from cglgan_tpu.utils.torch_import import warm_start_generators
        paths = [p.strip() for p in init_pts.split(",") if p.strip()]
        state = warm_start_generators(state, paths)
        print(f"[tpufed] generators warm-started from {len(paths)} "
              f"reference checkpoint(s)")
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"[tpufed] resumed from {args.resume} at round {int(state.t)}")

    eval_pool = np.asarray(part.eval_pool)

    last_ckpt = [int(state.t)]

    def on_tick(t, tick, cur_state):
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(tick.items())
                       if isinstance(v, float))
        print(f"[tpufed] round {t}: {msg}")
        run_dir.log(tick)
        samples = np.asarray(runner.sample(cur_state,
                                           min(100, cfg.num_sample)))
        if cfg.is_image:
            save_image_grid(samples, run_dir.file(f"{t}.png"))
        else:
            save_scatter_2d(run_dir.file(f"{t}.png"), eval_pool[:2000], samples)
        # checkpoint whenever a ckpt_every multiple is crossed (exact
        # divisibility by the tick cadence not required)
        if args.ckpt_every and t // args.ckpt_every > \
                last_ckpt[0] // args.ckpt_every:
            save_checkpoint(run_dir.file(f"ckpt_{t}"), cur_state)
            last_ckpt[0] = t

    remaining = cfg.num_communication - int(state.t)
    if remaining <= 0:
        print("[tpufed] nothing to do (state already past num_communication)")
        return {"run_dir": run_dir.path, "final": {}}

    if args.profile:
        from cglgan_tpu.utils.profiling import trace
        with trace(run_dir.file("profile")):
            train(runner, rounds=min(cfg.num_plt, remaining), state=state,
                  evaluator=False)
        print(f"[tpufed] profile written to {run_dir.file('profile')}")
        return {"run_dir": run_dir.path, "final": {}}

    # the single source of eval truth — library callers get the same metrics
    from cglgan_tpu.evalx.evaluator import make_evaluator
    evaluator = make_evaluator(cfg, part,
                               fid_stats=args.fid_stats,
                               inception_weights=args.inception_weights)
    if cfg.is_image:
        space = "inception-pool3" if args.inception_weights else "proxy-conv"
        print(f"[tpufed] FID feature space: {space}"
              + (f", real stats from {args.fid_stats}" if args.fid_stats
                 else ""))

    out = train(runner, rounds=remaining, state=state, on_tick=on_tick,
                evaluator=evaluator)
    state = out["state"]
    save_checkpoint(run_dir.file("ckpt_final"), state)
    run_dir.close()
    hist = out["history"]
    print(f"[tpufed] done: {int(state.t)} rounds in "
          f"{hist[-1]['wall_s']:.1f}s" if hist else "[tpufed] done")
    return {"run_dir": run_dir.path, "final": hist[-1] if hist else {}}


def cmd_sweep(args) -> int:
    """Sweep algos x datasets x iid in one invocation — the reference's
    ``__main__`` loops (CGLGAN/MNIST/main.py:459-535 loops dataset x iid,
    fegan.py:454-554 likewise) — and emit one comparison table
    (sweep_summary.xlsx/csv) across all runs."""
    import copy
    import time

    from cglgan_tpu.utils.xlsx import write_xlsx

    if getattr(args, "from_config", None):
        # a frozen config would silently override the swept dataset/iid
        raise SystemExit("[tpufed] --from-config is for single runs; "
                         "sweep builds each sub-run's config itself")
    algos = [a.strip() for a in args.algos.split(",") if a.strip()]
    datasets = [d.strip() for d in args.datasets.split(",") if d.strip()]
    iids = [int(x) for x in args.iids.split(",")]
    for a in algos:
        if a not in ALGOS:
            raise SystemExit(f"unknown algo {a!r}")
    root = os.path.join(
        args.out, time.strftime("%Y-%m-%d_%H-%M-%S") + "-sweep")
    os.makedirs(root, exist_ok=True)

    summaries = []
    for dataset in datasets:
        for iid in iids:
            for algo in algos:
                sub = copy.copy(args)
                sub.algo, sub.dataset, sub.iid = algo, dataset, iid
                sub.out = root
                sub.name = f"{algo}-{dataset}-iid{iid}"
                if algo == "mdgan" and args.num_servers != 1:
                    # mdgan has one central generator by definition
                    sub.num_servers = 1
                    print(f"[tpufed] {sub.name}: num_servers forced to 1")
                print(f"[tpufed] === sweep {sub.name} ===")
                res = _execute_run(sub)
                row = {"algo": algo, "dataset": dataset, "iid": iid,
                       "run_dir": res["run_dir"]}
                row.update({k: v for k, v in res["final"].items()
                            if isinstance(v, (int, float))})
                summaries.append(row)
                # partial table after every run: a crash loses nothing
                write_xlsx(os.path.join(root, "sweep_summary.xlsx"),
                           summaries)
                _write_summary_csv(os.path.join(root, "sweep_summary.csv"),
                                   summaries)

    _print_summary_table(summaries, "sweep summary")
    print(f"[tpufed] table: {os.path.join(root, 'sweep_summary.xlsx')}")
    return 0


def _print_summary_table(rows, label: str) -> None:
    cols = []           # union across rows, first-appearance order
    for r in rows:
        cols += [k for k in r if k != "run_dir" and k not in cols]
    print(f"[tpufed] {label}:")
    print("  " + " | ".join(cols))
    for row in rows:
        print("  " + " | ".join(
            f"{row.get(c):.4f}" if isinstance(row.get(c), float)
            else str(row.get(c, "")) for c in cols))


def cmd_compare(args) -> int:
    """Tabulate archived run dirs into one comparison table — the
    cross-run view `sweep` emits, but over ANY existing runs (e.g.
    `tpufed compare results/runs/*`), without retraining anything."""
    import json

    from cglgan_tpu.utils.xlsx import write_xlsx

    rows = []
    for d in args.run_dirs:
        cfg_p = os.path.join(d, "config.json")
        met_p = os.path.join(d, "metrics.jsonl")
        if not (os.path.isfile(cfg_p) and os.path.isfile(met_p)):
            print(f"[tpufed] skipping {d}: no config.json + metrics.jsonl")
            continue
        with open(cfg_p) as f:
            cfg = json.load(f)
        last = None
        with open(met_p) as f:
            for line in f:
                if line.strip():
                    last = json.loads(line)
        if last is None:
            print(f"[tpufed] skipping {d}: empty metrics.jsonl")
            continue
        # data provenance: image runs without --data-dir train on the
        # deterministic glyph bank (the run dir carries DATA_SOURCE.txt) —
        # surface that in the aggregate so a "fashion-mnist" row can never
        # be mistaken for a real-Fashion-MNIST result (the reference
        # downloads the real sets, MDGAN/MNIST/mdgan.py:376).
        ds = cfg.get("dataset")
        if ds == "2dmg":
            src = "gmm"
        elif os.path.isfile(os.path.join(d, "DATA_SOURCE.txt")) \
                or ds == "synthetic-mnist" or not cfg.get("data_dir"):
            src = "glyphs"
        else:
            src = "idx"
        row = {"algo": cfg.get("algo"), "dataset": ds, "data": src,
               "iid": cfg.get("iid"), "run_dir": d}
        row.update({k: v for k, v in last.items()
                    if isinstance(v, (int, float))})
        rows.append(row)
    if not rows:
        raise SystemExit("[tpufed] no usable run dirs")
    rows.sort(key=lambda r: (str(r["dataset"]), str(r["iid"]),
                             str(r["algo"])))
    _print_summary_table(rows, f"comparison ({len(rows)} runs)")
    if args.out:
        write_xlsx(args.out + ".xlsx", rows)
        _write_summary_csv(args.out + ".csv", rows)
        print(f"[tpufed] table: {args.out}.xlsx / .csv")
    return 0


def _write_summary_csv(path: str, rows) -> None:
    import csv
    fields = []
    for r in rows:
        for k in r:
            if k not in fields:
                fields.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


# Categorical series palette, fixed slot order assigned by run position —
# never cycled, never re-sorted (the ordering is the colorblind-safety
# mechanism: the set validates at worst adjacent CVD dE 9.1 / normal-vision
# dE 19.6 on a light surface).  Runs beyond 8 series must facet, not reuse
# hues; numeric values always remain available as the table view
# (`tpufed compare`).
_SERIES_PALETTE = ("#2a78d6", "#eb6834", "#1baf7a", "#eda100",
                   "#e87ba4", "#008300", "#4a3aa7", "#e34948")


def cmd_plot(args) -> int:
    """Render archived runs' metric trajectories into one comparison
    figure — the cross-run view of ``compare``, as curves (one line per
    run, one panel per metric).  The reference's painter only ever plots a
    single run's state (e.g. FLGAN/MNIST/flgan.py:62-104); cross-algorithm
    comparison figures were assembled by hand from the .xlsx files.

        tpufed plot results/runs/mnist-iid2-* --out results/plots/iid2.png
    """
    import json

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    runs = []
    for d in args.run_dirs:
        met_p = os.path.join(d, "metrics.jsonl")
        if not os.path.isfile(met_p):
            print(f"[tpufed] skipping {d}: no metrics.jsonl")
            continue
        with open(met_p) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        if not rows:
            print(f"[tpufed] skipping {d}: empty metrics.jsonl")
            continue
        runs.append((os.path.basename(os.path.normpath(d)), rows))
    if not runs:
        raise SystemExit("[tpufed] no usable run dirs")
    if len(runs) > len(_SERIES_PALETTE):
        raise SystemExit(
            f"[tpufed] {len(runs)} runs exceed the {len(_SERIES_PALETTE)} "
            "validated series slots — facet into several plots instead")

    if args.metrics:
        metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]
    else:
        last = runs[0][1][-1]
        metrics = (["kl_score", "mode_coverage"] if "kl_score" in last
                   else ["fid", "inception_score"])
    fig, axes = plt.subplots(1, len(metrics),
                             figsize=(6.4 * len(metrics), 4.6),
                             squeeze=False)
    plotted = 0
    for ax, metric in zip(axes[0], metrics):
        for slot, (label, rows) in enumerate(runs):
            xs = [r["round"] for r in rows if metric in r]
            ys = [r[metric] for r in rows if metric in r]
            if not xs:
                continue
            ax.plot(xs, ys, color=_SERIES_PALETTE[slot], linewidth=2,
                    label=label)
            plotted += 1
        if args.logy and metric in ("fid", "kl_score"):
            ax.set_yscale("log")
        ax.set_xlabel("round")
        ax.set_ylabel(metric)
        ax.grid(True, alpha=0.25, linewidth=0.5)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
    if plotted == 0:
        raise SystemExit(f"[tpufed] no run carries any of {metrics}")
    axes[0][0].legend(frameon=False, fontsize=8)
    if args.title:
        fig.suptitle(args.title)
    fig.tight_layout()
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    fig.savefig(args.out, dpi=140)
    plt.close(fig)
    print(f"[tpufed] figure: {args.out} ({len(runs)} runs, "
          f"panels: {', '.join(metrics)})")
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
    from cglgan_tpu.algos.registry import load_partition
    from cglgan_tpu.evalx.evaluator import make_evaluator
    part = load_partition(cfg)   # loaded once, shared with the runner
    runner = build_runner(cfg, part)
    state = restore_checkpoint(args.checkpoint, runner.init_state())
    print(f"[tpufed] checkpoint at round {int(state.t)}")
    samples = np.asarray(runner.sample(state, args.n))
    out = args.out or os.path.join(run_dir, f"eval_{int(state.t)}")
    report = {"round": int(state.t), "n": args.n}
    if cfg.is_image:
        side = cfg.img_size + 4 if cfg.conv else cfg.img_size
        save_image_grid(samples.reshape(-1, 1, side, side)[:100],
                        out + ".png")
    else:
        save_scatter_2d(out + ".png", part.eval_pool[:2000], samples)
    evaluator = make_evaluator(
        cfg, part, eval_n=args.n,
        fid_stats=getattr(args, "fid_stats", None),
        inception_weights=getattr(args, "inception_weights", None))
    # reuse the samples already drawn for the artifact (same fixed-z draw)
    report.update(evaluator(runner, state, samples=samples))
    print(json.dumps(report))
    return 0


def cmd_export(args) -> int:
    """Export the trained generator as a portable StableHLO serving
    artifact (utils/export.py): eval-mode G forward, weights baked in,
    callable as z[n, latent] -> samples with no model code or checkpoint."""
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import json

    from cglgan_tpu.algos.registry import build_runner
    from cglgan_tpu.core.config import FedGANConfig
    from cglgan_tpu.utils.checkpoint import restore_checkpoint
    from cglgan_tpu.utils.export import export_generator, save_generator

    run_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = FedGANConfig(**json.load(f))
    runner = build_runner(cfg)
    state = restore_checkpoint(args.checkpoint, runner.init_state())
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    n = args.n if args.n > 0 else None
    extra = {"algo": cfg.algo, "dataset": cfg.dataset, "round": int(state.t)}
    if args.client is not None:
        from cglgan_tpu.utils.export import export_client_generator
        exported = export_client_generator(runner, state, args.client,
                                           n, platforms=platforms)
        default_name = f"generator_{int(state.t)}_client{args.client}.stablehlo"
        extra["client"] = args.client
    else:
        exported = export_generator(runner, state, n, platforms=platforms)
        default_name = f"generator_{int(state.t)}.stablehlo"
    out = args.out or os.path.join(run_dir, default_name)
    manifest = save_generator(exported, out, extra)
    print(json.dumps({"out": out, **manifest}))
    return 0


def cmd_import_torch(args) -> int:
    """Import a reference ``torch.save(net_g.state_dict())`` checkpoint
    (the only artifact the reference trainers produce —
    CGLGAN/MNIST/main.py:191, capgan.py:186-198) into this framework:
    detect the generator family from the state_dict, convert to our
    functional pytrees, and optionally draw samples and/or export a
    StableHLO serving artifact.  Prints one JSON summary line."""
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import json

    import jax
    import numpy as np

    from cglgan_tpu.utils.torch_import import import_generator_file

    model, params, state, info = import_generator_file(
        args.checkpoint, family=args.family,
        num_heads=args.num_heads,
        img_shape=((1, args.img_size, args.img_size)
                   if args.img_size else None))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    report = {"checkpoint": args.checkpoint, **info, "params": n_params}

    def _heads_to_batch(y):
        # (heads, n, ...) -> (heads*n, ...) interleaved sample-major so any
        # downstream truncation (grid [:100], evaluator [:n]) spans ALL
        # heads instead of silently scoring head 0 only — the mode-coverage
        # property of the multi-path G (mixed-gan.py:242-252) lives in the
        # head mixture.
        return np.swapaxes(y, 0, 1).reshape((-1,) + y.shape[2:])

    if args.samples:
        z = jax.random.normal(jax.random.key(args.seed), (args.n, 100))
        y, _ = model.apply(params, state, z, train=False)
        y = np.asarray(y)
        if model.multipath:   # heads onto batch, reference cat(dim=0)
            y = _heads_to_batch(y)
        out_path = args.samples
        if y.ndim >= 3:       # image families -> grid PNG
            from cglgan_tpu.utils.imaging import save_image_grid
            save_image_grid(y.reshape(-1, *y.shape[-3:])[:100], out_path)
        else:                 # 2DMG points -> raw array (np.save appends
            # ".npy" to suffix-less paths; normalize first so the reported
            # path is the file that actually exists)
            if not out_path.endswith(".npy"):
                out_path += ".npy"
            np.save(out_path, y)
        report["samples"] = out_path

    if args.eval_dataset:
        # score the imported G with the standard workload evaluator:
        # FID / Inception Score on images (FLGAN/MNIST/flgan.py:62-104
        # cadence metrics), KL/DS/mode-coverage on 2DMG — the same
        # metrics a `tpufed run` of that dataset reports.
        from cglgan_tpu.algos.registry import load_partition
        from cglgan_tpu.evalx.evaluator import make_evaluator
        img_shape = info["img_shape"]
        conv = info["family"].startswith("conv")
        cfg = FedGANConfig(
            algo="capgan", dataset=args.eval_dataset, conv=conv,
            img_size=(28 if conv else
                      (img_shape[-1] if len(img_shape) == 3 else 28)),
            data_dir=args.data_dir)
        part = load_partition(cfg)
        evaluator = make_evaluator(
            cfg, part, eval_n=args.n, fid_stats=args.fid_stats,
            inception_weights=args.inception_weights)
        z = jax.random.normal(jax.random.key(args.seed + 1), (args.n, 100))
        y, _ = model.apply(params, state, z, train=False)
        y = np.asarray(y)
        if model.multipath:
            y = _heads_to_batch(y)
        report.update(evaluator(None, None, samples=y))

    if args.export:
        from cglgan_tpu.utils.export import export_imported, save_generator
        platforms = ([p.strip() for p in args.platforms.split(",")
                      if p.strip()] if args.platforms else None)
        exported = export_imported(model, params, state,
                                   args.export_n if args.export_n > 0
                                   else None, platforms=platforms)
        manifest = save_generator(exported, args.export,
                                  {"imported_from": args.checkpoint,
                                   "family": info["family"]})
        report["export"] = {"out": args.export, **manifest}

    print(json.dumps(report))
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnosis: versions, a BOUNDED backend probe (the
    tunneled TPU backend can wedge such that `jax.devices()` hangs
    forever — observed on the axon dev tunnel), compile-cache and native
    dataplane status.  Prints one JSON object; exit 0 iff a backend
    answered."""
    import json
    import sys as _sys

    report = {"python": _sys.version.split()[0]}
    import jax
    report["jax"] = jax.__version__

    # bounded backend probe — never hang the caller (backend_probe.py)
    from cglgan_tpu.utils import backend_probe
    status, info = backend_probe.probe(timeout=args.probe_timeout,
                                       platform=args.platform)
    if status == "ok":
        report["backend"] = info
    elif status == "timeout":
        report["backend"] = {
            "error": f"unresponsive (device init exceeded "
                     f"{args.probe_timeout}s — wedged tunnel?)"}
    else:
        report["backend"] = {"error": info}

    from cglgan_tpu.utils import compile_cache
    cache_dir = os.environ.get("CGLGAN_TPU_COMPILE_CACHE",
                               compile_cache.default_dir())
    entries = (sum(len(fs) for _, _, fs in os.walk(cache_dir))
               if os.path.isdir(cache_dir) else 0)
    report["compile_cache"] = {"dir": cache_dir, "entries": entries}

    from cglgan_tpu.data import native
    report["native_dataplane"] = native.load_library() is not None

    print(json.dumps(report, indent=1))
    return 0 if "error" not in report["backend"] else 1


def cmd_fid_stats(args) -> int:
    """Precompute real-image activation statistics for ``--fid-stats``.

    Loads the dataset (IDX files via --data-dir, else the synthetic glyph
    bank), runs the active feature extractor (InceptionV3-pool3 with
    --inception-weights, else the proxy conv embedding the eval path
    defaults to) over --n images and writes the pytorch-fid-style ``.npz``
    (mu, sigma).  Companion of ``evalx.inception.load_fid_stats``: the
    reference computes FID against a live real subsample every tick
    (FLGAN/MNIST/flgan.py:81-98); precomputed stats make the comparison
    portable without shipping the dataset."""
    import numpy as np

    from cglgan_tpu.data.mnist import load_image_dataset
    from cglgan_tpu.evalx.fid import activation_stats, conv_feature_extractor
    from cglgan_tpu.evalx.inception import save_fid_stats

    if args.data_dir is None and args.dataset in ("mnist", "fashion-mnist"):
        print(f"[tpufed] WARNING: no --data-dir given for {args.dataset}; "
              "computing stats over the synthetic glyph bank — only valid "
              "against runs using the same synthetic fallback")
    data, _labels = load_image_dataset(args.dataset, args.data_dir)
    sel = np.random.default_rng(args.seed).permutation(len(data))[:args.n]
    if args.conv:
        # conv runs train and evaluate at the 2px-zero-padded resolution
        # (algos/registry.py:32-33); stats must be computed at the same side
        data = np.pad(data, ((0, 0), (2, 2), (2, 2)))
    side = data.shape[-1]
    imgs = data[sel].astype(np.float32) / 255.0
    imgs = ((imgs - 0.5) / 0.5).reshape(-1, 1, side, side)
    if args.inception_weights:
        from cglgan_tpu.evalx.inception import (inception_extractor,
                                                load_inception_weights)
        extractor = inception_extractor(
            load_inception_weights(args.inception_weights))
    else:
        extractor = conv_feature_extractor(side)
    mu, sigma = activation_stats(extractor, imgs)
    save_fid_stats(args.out, mu, sigma, side=side)
    print(f"[tpufed] wrote {args.out}: mu ({mu.shape[0]},), "
          f"sigma {sigma.shape}, {len(imgs)} images")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="tpufed",
                                     description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="cmd", required=True)
    prun = sub.add_parser("run", help="train one algorithm")
    _add_run_args(prun)
    prun.set_defaults(fn=cmd_run)
    psweep = sub.add_parser(
        "sweep", help="run algos x datasets x iid in one invocation and "
                      "emit a comparison table (the reference __main__ loops)")
    _add_run_args(psweep, with_algo=False)
    psweep.add_argument("--algos", default="cglgan",
                        help="comma list, e.g. cglgan,capgan,flgan")
    psweep.add_argument("--datasets", default="2dmg",
                        help="comma list, e.g. 2dmg,mnist,fashion-mnist")
    psweep.add_argument("--iids", default="1,2",
                        help="comma list of iid settings, e.g. 1,2")
    psweep.set_defaults(fn=cmd_sweep)
    pbench = sub.add_parser("bench", help="run the headline benchmark")
    _add_cache_arg(pbench)
    pbench.set_defaults(fn=cmd_bench)
    peval = sub.add_parser("eval", help="score a saved checkpoint")
    _add_cache_arg(peval)
    peval.add_argument("checkpoint", help="path to an Orbax checkpoint dir "
                                          "inside a run dir")
    peval.add_argument("--n", type=int, default=1000)
    peval.add_argument("--out", default=None)
    peval.add_argument("--platform", default=None)
    peval.add_argument("--inception-weights", default=None)
    peval.add_argument("--fid-stats", default=None)
    peval.set_defaults(fn=cmd_eval)
    pexport = sub.add_parser(
        "export", help="export the trained generator as a portable "
                       "StableHLO serving artifact (z -> samples)")
    _add_cache_arg(pexport)
    pexport.add_argument("checkpoint", help="path to an Orbax checkpoint "
                                            "dir inside a run dir")
    pexport.add_argument("--n", type=int, default=0,
                         help="serving batch size baked into the artifact; "
                              "0 (default) = batch-polymorphic via shape "
                              "polymorphism (any multiple of num_servers)")
    pexport.add_argument("--out", default=None,
                         help="output path (default "
                              "<run dir>/generator_<round>.stablehlo)")
    pexport.add_argument("--client", type=int, default=None, metavar="C",
                         help="export client C's PERSONALIZED generator "
                              "(CGL family: head C%%k of server C//k's G, "
                              "mixed-gan.py:242-252 routing) instead of "
                              "the painter blend; any batch size")
    pexport.add_argument("--platform", default=None)
    pexport.add_argument("--platforms", default=None,
                         help="comma list of lowering targets, e.g. "
                              "cpu,tpu (default: current backend)")
    pexport.set_defaults(fn=cmd_export)
    pimp = sub.add_parser(
        "import-torch",
        help="import a reference torch.save(net_g.state_dict()) .pt "
             "checkpoint: detect the generator family, convert to this "
             "framework's pytrees, optionally sample and/or export")
    pimp.add_argument("checkpoint", help="path to a reference .pt file")
    pimp.add_argument("--family", default=None, choices=GEN_SPECS,
                      help="override the auto-detected generator family")
    pimp.add_argument("--num-heads", type=int, default=None,
                      help="override the detected multipath head count")
    pimp.add_argument("--img-size", type=int, default=None,
                      help="override the detected square image side")
    pimp.add_argument("--samples", default=None,
                      help="write an eval-mode sample artifact here "
                           "(PNG grid for image families, .npy for 2DMG)")
    pimp.add_argument("--n", type=int, default=100,
                      help="latents to draw for --samples")
    pimp.add_argument("--seed", type=int, default=0)
    pimp.add_argument("--eval-dataset", default=None, choices=DATASETS,
                      help="score the imported generator with the standard "
                           "workload evaluator against this dataset "
                           "(FID/IS for images, KL/DS/coverage for 2dmg)")
    pimp.add_argument("--data-dir", default=None,
                      help="IDX files for real MNIST (--eval-dataset)")
    pimp.add_argument("--fid-stats", default=None,
                      help="precomputed real-image (mu, sigma) .npz "
                           "(--eval-dataset)")
    pimp.add_argument("--inception-weights", default=None,
                      help="InceptionV3 weights .npz for reference FID "
                           "(--eval-dataset)")
    pimp.add_argument("--export", default=None,
                      help="also export a StableHLO serving artifact here")
    pimp.add_argument("--export-n", type=int, default=0,
                      help="serving batch baked into --export; 0 = "
                           "batch-polymorphic")
    pimp.add_argument("--platform", default=None)
    pimp.add_argument("--platforms", default=None,
                      help="comma list of lowering targets for --export")
    pimp.set_defaults(fn=cmd_import_torch)
    pcomp = sub.add_parser(
        "compare", help="tabulate archived run dirs into one comparison "
                        "table (final-tick metrics per run)")
    pcomp.add_argument("run_dirs", nargs="+",
                       help="run directories (each with config.json + "
                            "metrics.jsonl), e.g. results/runs/*")
    pcomp.add_argument("--out", default=None,
                       help="also write <out>.xlsx and <out>.csv")
    pcomp.set_defaults(fn=cmd_compare)
    pplot = sub.add_parser(
        "plot", help="render archived runs' metric trajectories into one "
                     "comparison figure (one line per run, one panel per "
                     "metric)")
    pplot.add_argument("run_dirs", nargs="+",
                       help="run directories with metrics.jsonl")
    pplot.add_argument("--metrics", default=None,
                       help="comma-separated metric keys (default: "
                            "kl_score,mode_coverage for 2DMG runs; "
                            "fid,inception_score for image runs)")
    pplot.add_argument("--out", required=True, help="output .png path")
    pplot.add_argument("--logy", action="store_true",
                       help="log y-scale on fid/kl_score panels")
    pplot.add_argument("--title", default=None)
    pplot.set_defaults(fn=cmd_plot)
    pdoc = sub.add_parser(
        "doctor", help="diagnose the environment: versions, bounded "
                       "backend probe, compile cache, native dataplane")
    pdoc.add_argument("--platform", default=None,
                      help="probe this backend (default: env/default)")
    pdoc.add_argument("--probe-timeout", type=int, default=60,
                      help="seconds before declaring the backend wedged")
    pdoc.set_defaults(fn=cmd_doctor)
    pstats = sub.add_parser(
        "fid-stats", help="precompute real-image FID statistics "
                          "(.npz consumable via run/eval --fid-stats)")
    pstats.add_argument("--dataset", default="mnist",
                        choices=[d for d in DATASETS if d != "2dmg"])
    pstats.add_argument("--data-dir", default=None)
    pstats.add_argument("--n", type=int, default=10000)
    pstats.add_argument("--seed", type=int, default=20211212)
    pstats.add_argument("--inception-weights", default=None)
    pstats.add_argument("--conv", action="store_true",
                        help="compute stats at the 2px-padded resolution "
                             "conv runs evaluate at (pass iff the consuming "
                             "run uses --conv)")
    pstats.add_argument("--out", required=True, help="output .npz path")
    pstats.set_defaults(fn=cmd_fid_stats)
    args = parser.parse_args(argv)
    _enable_compile_cache(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
