"""End-to-end CLI runs in a subprocess (the real user surface)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # disable the TPU plugin registration
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # isolate from the developer's real compile cache: keep cold-compile
    # paths tested and never write machine-global state from tests
    env["CGLGAN_TPU_COMPILE_CACHE"] = "off"
    return subprocess.run(
        [sys.executable, "-m", "cglgan_tpu.cli"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


class TestCLI:
    def test_run_2dmg_writes_artifacts(self, tmp_path):
        out = run_cli(["run", "flgan", "--dataset", "2dmg",
                       "--num-workers", "4", "--num-class", "5",
                       "--num-sample", "200", "--batch-size", "32",
                       "--rounds", "20", "--num-plt", "10",
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--out", str(tmp_path), "--name", "t1"])
        assert out.returncode == 0, out.stderr[-2000:]
        d = tmp_path / "t1"
        for f in ("config.json", "metrics.jsonl", "metrics.csv",
                  "10.png", "20.png", "device_0.png", "ckpt_final"):
            assert (d / f).exists(), f"{f} missing; stdout: {out.stdout[-500:]}"
        ticks = [json.loads(l) for l in
                 (d / "metrics.jsonl").read_text().strip().split("\n")]
        assert ticks[-1]["round"] == 20
        assert "kl_score" in ticks[-1]

    def test_run_sharded_devices(self, tmp_path):
        out = run_cli(["run", "capgan", "--dataset", "2dmg",
                       "--num-workers", "8", "--num-class", "4",
                       "--num-sample", "100", "--batch-size", "16",
                       "--rounds", "4", "--num-plt", "2",
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--devices", "8",
                       "--out", str(tmp_path), "--name", "t2"])
        assert out.returncode == 0, out.stderr[-2000:]
        assert "mesh {'clients': 8}" in out.stdout

    def test_fid_stats_roundtrip(self, tmp_path):
        """fid-stats writes a (mu, sigma) npz that run --fid-stats consumes
        (the precomputed-real-statistics path of the FID pipeline)."""
        stats = tmp_path / "stats.npz"
        out = run_cli(["fid-stats", "--dataset", "synthetic-mnist",
                       "--n", "300", "--out", str(stats)])
        assert out.returncode == 0, out.stderr[-2000:]
        assert stats.exists()
        import numpy as np
        z = np.load(stats)
        assert z["mu"].shape == (256,) and z["sigma"].shape == (256, 256)
        out = run_cli(["run", "mdgan", "--dataset", "synthetic-mnist",
                       "--num-workers", "4", "--num-class", "10",
                       "--num-sample", "64", "--batch-size", "32",
                       "--rounds", "4", "--num-plt", "4",
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--fid-stats", str(stats),
                       "--out", str(tmp_path), "--name", "t3"])
        assert out.returncode == 0, out.stderr[-2000:]
        ticks = [json.loads(l) for l in
                 (tmp_path / "t3" / "metrics.jsonl")
                 .read_text().strip().split("\n")]
        assert "fid" in ticks[-1]

    def test_export_serving_artifact(self, tmp_path):
        """train -> export -> the StableHLO artifact regenerates in a
        consumer process with only jax (the serving path of record)."""
        out = run_cli(["run", "flgan", "--dataset", "2dmg",
                       "--num-workers", "4", "--num-class", "5",
                       "--num-sample", "200", "--batch-size", "32",
                       "--rounds", "4", "--num-plt", "4",
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--out", str(tmp_path), "--name", "t5"])
        assert out.returncode == 0, out.stderr[-2000:]
        ckpt = tmp_path / "t5" / "ckpt_final"
        art = tmp_path / "g.stablehlo"
        out = run_cli(["export", str(ckpt), "--n", "20",
                       "--platform", "cpu", "--out", str(art)])
        assert out.returncode == 0, out.stderr[-2000:]
        report = json.loads(out.stdout.strip().splitlines()[-1])
        assert report["algo"] == "flgan" and report["round"] == 4
        assert report["in_shape"] == [20, 100]
        manifest = json.loads((tmp_path / "g.stablehlo.json").read_text())
        assert manifest["out_shape"] == [20, 2]
        code = ("import jax, jax.numpy as jnp\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                f"exp = jax.export.deserialize(open({str(art)!r},"
                "'rb').read())\n"
                "s = exp.call(jax.random.normal(jax.random.key(0),"
                "(20, 100)))\n"
                "assert s.shape == (20, 2) and bool"
                "(jnp.all(jnp.abs(s) <= 1.0))\n"
                "print('SERVE-OK')\n")
        import subprocess
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=120)
        assert "SERVE-OK" in r.stdout, r.stderr[-2000:]

    def test_import_torch_end_to_end(self, tmp_path):
        """A reference-style torch .pt generator checkpoint imports,
        samples, and exports a serving artifact through the CLI."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        class G(tnn.Module):   # CGLGAN/2DMG/model.py:26-50 shape
            def __init__(self, n):
                super().__init__()
                self.model = tnn.Sequential(tnn.Linear(100, 32),
                                            tnn.LeakyReLU(0.2))
                self.paths = tnn.ModuleList(
                    [tnn.Sequential(tnn.Linear(32, 2), tnn.Tanh())
                     for _ in range(n)])

        pt = tmp_path / "Server3.pt"
        torch.save(G(4).state_dict(), str(pt))
        samples = tmp_path / "s.npy"
        art = tmp_path / "imported.stablehlo"
        out = run_cli(["import-torch", str(pt), "--platform", "cpu",
                       "--samples", str(samples), "--n", "10",
                       "--eval-dataset", "2dmg",
                       "--export", str(art), "--export-n", "10"])
        assert out.returncode == 0, out.stderr[-2000:]
        report = json.loads(out.stdout.strip().splitlines()[-1])
        assert report["family"] == "2dmg-multipath"
        assert report["num_heads"] == 4
        # --eval-dataset scored the imported G with the workload evaluator
        assert "kl_score" in report and "mode_coverage" in report
        import numpy as np
        got = np.load(samples)
        assert got.shape == (40, 2)   # heads cat onto batch
        # heads are interleaved sample-major so a truncated prefix spans
        # every head (not just head 0's outputs)
        import jax
        from cglgan_tpu.utils import torch_import as ti
        model, params, state, _ = ti.import_generator_file(str(pt))
        z = jax.random.normal(jax.random.key(0), (10, 100))  # --seed 0
        y, _ = model.apply(params, state, z, train=False)
        expect = np.swapaxes(np.asarray(y), 0, 1).reshape(-1, 2)
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        manifest = json.loads((tmp_path / "imported.stablehlo.json")
                              .read_text())
        assert manifest["out_shape"] == [40, 2]
        assert manifest["imported_from"] == str(pt)

    @pytest.mark.smoke
    def test_gen_specs_mirror(self):
        """cli.GEN_SPECS mirrors models.zoo.GEN_SPECS (kept separate so
        cli.py's top level stays jax-free for `tpufed doctor`)."""
        from cglgan_tpu import cli
        from cglgan_tpu.models import zoo
        assert cli.GEN_SPECS == zoo.GEN_SPECS

    def test_from_config_reruns_exactly(self, tmp_path):
        """--from-config reloads an archived config.json verbatim; the
        rerun's metric stream is bit-identical (deterministic rounds)."""
        base = ["--num-workers", "4", "--num-class", "5",
                "--num-sample", "200", "--batch-size", "32",
                "--rounds", "12", "--num-plt", "6",
                "--ckpt-every", "0", "--platform", "cpu"]
        out = run_cli(["run", "flgan", "--dataset", "2dmg", *base,
                       "--out", str(tmp_path), "--name", "orig"])
        assert out.returncode == 0, out.stderr[-2000:]
        cfgp = tmp_path / "orig" / "config.json"
        out = run_cli(["run", "flgan", "--from-config", str(cfgp),
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--out", str(tmp_path), "--name", "rerun"])
        assert out.returncode == 0, out.stderr[-2000:]
        orig = (tmp_path / "orig" / "metrics.jsonl").read_text()
        rerun = (tmp_path / "rerun" / "metrics.jsonl").read_text()
        strip = lambda t: [  # noqa: E731 — drop wall-clock fields
            {k: v for k, v in json.loads(l).items()
             if k not in ("wall_s", "rounds_per_s")}
            for l in t.strip().splitlines()]
        assert strip(orig) == strip(rerun)
        # algo mismatch is rejected
        out = run_cli(["run", "mdgan", "--from-config", str(cfgp),
                       "--platform", "cpu", "--out", str(tmp_path)],
                      timeout=60)
        assert out.returncode != 0
        assert "holds a 'flgan' config" in out.stderr + out.stdout

    def test_sweep_rejects_from_config(self, tmp_path):
        """--from-config would silently override the swept dataset/iid."""
        out = run_cli(["sweep", "--algos", "flgan", "--datasets", "2dmg",
                       "--iids", "0", "--from-config", "whatever.json",
                       "--out", str(tmp_path)], timeout=60)
        assert out.returncode != 0
        assert "--from-config is for single runs" in out.stderr + out.stdout

    def test_compare_tabulates_archived_runs(self, tmp_path):
        """`tpufed compare` tabulates existing run dirs without
        retraining — driven over the repo's own archived results."""
        import glob
        runs = sorted(glob.glob(os.path.join(REPO, "results", "runs",
                                             "2dmg-iid2-*")))
        if not runs:
            pytest.skip("archived results not present")
        out = run_cli(["compare", *runs,
                       "--out", str(tmp_path / "cmp")], timeout=120)
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [l for l in out.stdout.splitlines() if " | " in l]
        assert len(lines) == len(runs) + 1           # header + one per run
        assert (tmp_path / "cmp.csv").exists()
        assert (tmp_path / "cmp.xlsx").exists()
        # the cglgan row reproduces the RESULTS.md headline metrics
        cgl = [l for l in lines if l.strip().startswith("cglgan")][0]
        assert "1.0000" in cgl                        # full mode coverage
        # data-provenance column: 2DMG rows are sampled gmm draws
        assert "| gmm |" in cgl.replace("  ", " ")
        csv_head = (tmp_path / "cmp.csv").read_text().splitlines()[0]
        assert "data" in csv_head.split(",")

    @pytest.mark.smoke
    def test_plot_renders_trajectory_figure(self, tmp_path):
        """`tpufed plot` renders metric curves from metrics.jsonl dirs;
        >8 runs (the validated series-slot count) is refused, not
        hue-cycled."""
        for i, name in enumerate(["a", "b"]):
            d = tmp_path / name
            d.mkdir()
            with open(d / "metrics.jsonl", "w") as f:
                for r in (50, 100):
                    f.write(json.dumps({"round": r, "kl_score": 1.0 / (i + r),
                                        "mode_coverage": 0.5}) + "\n")
        out_png = tmp_path / "fig.png"
        out = run_cli(["plot", str(tmp_path / "a"), str(tmp_path / "b"),
                       "--out", str(out_png)], timeout=120)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out_png.exists() and out_png.stat().st_size > 1000
        # unknown metric -> hard error, not an empty figure
        out = run_cli(["plot", str(tmp_path / "a"), "--metrics", "nope",
                       "--out", str(tmp_path / "x.png")], timeout=120)
        assert out.returncode != 0
        # 9 runs exceed the fixed palette -> refuse (facet, don't cycle)
        many = [str(tmp_path / "a")] * 9
        out = run_cli(["plot", *many, "--out", str(tmp_path / "y.png")],
                      timeout=120)
        assert out.returncode != 0
        assert "facet" in (out.stdout + out.stderr)

    def test_doctor_reports_environment(self):
        out = run_cli(["doctor", "--platform", "cpu"], timeout=120)
        assert out.returncode == 0, out.stderr[-2000:]
        report = json.loads(out.stdout)
        assert report["backend"]["platform"] == "cpu"
        assert report["backend"]["count"] >= 1
        assert "dir" in report["compile_cache"]
        assert isinstance(report["native_dataplane"], bool)

    @pytest.mark.smoke
    def test_bad_args(self):
        out = run_cli(["run", "nope"], timeout=60)
        assert out.returncode != 0
        assert "invalid choice" in out.stderr

    def test_sweep_emits_comparison_table(self, tmp_path):
        """tpufed sweep = the reference __main__ dataset x iid loops
        (CGLGAN/MNIST/main.py:459-535) in one command, with a summary
        table across runs."""
        out = run_cli(["sweep", "--algos", "flgan,mdgan",
                       "--datasets", "2dmg", "--iids", "1,2",
                       "--num-workers", "4", "--num-class", "4",
                       "--num-sample", "64", "--batch-size", "16",
                       "--rounds", "4", "--num-plt", "4",
                       "--ckpt-every", "0", "--platform", "cpu",
                       "--out", str(tmp_path)])
        assert out.returncode == 0, out.stderr[-2000:]
        roots = list(tmp_path.glob("*-sweep"))
        assert len(roots) == 1
        root = roots[0]
        assert (root / "sweep_summary.xlsx").exists()
        rows = (root / "sweep_summary.csv").read_text().strip().split("\n")
        assert len(rows) == 1 + 4        # header + 2 algos x 2 iids
        for name in ("flgan-2dmg-iid1", "mdgan-2dmg-iid2"):
            assert (root / name / "metrics.jsonl").exists()
        assert "sweep summary" in out.stdout
