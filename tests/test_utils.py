"""Checkpointing, logging, imaging, IDX loading."""
import gzip
import json
import os
import struct

import jax
import numpy as np
import pytest

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.mnist import load_idx_dataset
from cglgan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from cglgan_tpu.utils.imaging import save_image_grid, save_scatter_2d
from cglgan_tpu.utils.logging import RunDir


def tiny_runner():
    cfg = FedGANConfig(algo="capgan", dataset="2dmg", num_workers=4,
                       num_class=5, num_sample=200, iid=1, batch_size=32,
                       num_communication=4, num_plt=2)
    return build_runner(cfg)


class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path):
        r = tiny_runner()
        s0 = r.init_state()
        s1, _ = jax.jit(r.round_fn)(s0)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, s1)
        restored = restore_checkpoint(path, r.init_state())
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, tmp_path):
        """round(restore(save(s))) == round(s): resume is transparent."""
        r = tiny_runner()
        s1, _ = jax.jit(r.round_fn)(r.init_state())
        path = str(tmp_path / "ckpt2")
        save_checkpoint(path, s1)
        restored = restore_checkpoint(path, r.init_state())
        s2a, _ = jax.jit(r.round_fn)(s1)
        s2b, _ = jax.jit(r.round_fn)(restored)
        for a, b in zip(jax.tree.leaves(s2a), jax.tree.leaves(s2b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_roundtrip_preserves_mesh_commitment(self, tmp_path):
        """Resume on a sharded mesh must restore with the template's
        NamedShardings (Orbax restores to the template's shardings), or the
        resumed run silently falls off the jit dispatch fast path — the
        commit_tree bug class (see tests/test_dispatch_guard.py)."""
        from jax.sharding import NamedSharding
        from cglgan_tpu.core import meshes
        cfg = FedGANConfig(algo="flgan", dataset="2dmg", num_workers=8,
                           num_class=5, num_sample=200, iid=1, batch_size=32,
                           num_communication=4, num_plt=2)
        mesh = meshes.client_mesh(8)
        r = build_runner(cfg, mesh=mesh)
        s1, _ = jax.jit(r.round_fn)(r.init_state())
        path = str(tmp_path / "ckpt3")
        save_checkpoint(path, s1)
        restored = restore_checkpoint(path, r.init_state())
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert isinstance(b.sharding, NamedSharding) and b.committed
            assert b.sharding == a.sharding


class TestRunDir:
    def test_logs_jsonl_and_csv(self, tmp_path):
        cfg = FedGANConfig(algo="flgan", dataset="2dmg")
        rd = RunDir(str(tmp_path), "runA", cfg)
        rd.log({"round": 1, "kl": 0.5})
        rd.log({"round": 2, "kl": 0.4})
        rd.close()
        lines = open(rd.file("metrics.jsonl")).read().strip().split("\n")
        assert len(lines) == 2
        assert json.loads(lines[1])["kl"] == 0.4
        csv = open(rd.file("metrics.csv")).read().strip().split("\n")
        assert csv[0] == "round,kl"
        assert len(csv) == 3
        saved_cfg = json.load(open(rd.file("config.json")))
        assert saved_cfg["algo"] == "flgan"

    def test_resume_carries_prior_ticks(self, tmp_path):
        """Re-opening an existing run dir (--resume with the same --name)
        must carry the prior jsonl ticks into metrics.csv/xlsx so the
        aggregate artifacts stay complete across a restart."""
        cfg = FedGANConfig(algo="flgan", dataset="2dmg")
        rd = RunDir(str(tmp_path), "runR", cfg)
        rd.log({"round": 1, "kl": 0.5})
        rd.log({"round": 2, "kl": 0.4})
        rd.close()
        rd2 = RunDir(str(tmp_path), "runR", cfg)
        rd2.log({"round": 3, "kl": 0.3})
        rd2.close()
        lines = open(rd2.file("metrics.jsonl")).read().strip().split("\n")
        assert [json.loads(l)["round"] for l in lines] == [1, 2, 3]
        csv = open(rd2.file("metrics.csv")).read().strip().split("\n")
        assert csv[0] == "round,kl" and len(csv) == 4  # one header + 3 rows
        import zipfile
        sheet = zipfile.ZipFile(rd2.file("metrics.xlsx")).read(
            "xl/worksheets/sheet1.xml").decode()
        for v in ("0.5", "0.4", "0.3"):  # all three ticks, not just the new one
            assert f"<v>{v}</v>" in sheet

    def test_tensorboard_scalar_stream(self, tmp_path):
        """tensorboard=True streams numeric tick fields as TB scalars
        under <run>/tb/ (SURVEY §5: 'CSV/JSONL + optional TensorBoard')."""
        pytest.importorskip("torch.utils.tensorboard")
        rd = RunDir(str(tmp_path), "runTB",
                    FedGANConfig(algo="flgan", dataset="2dmg"),
                    tensorboard=True)
        rd.log({"round": 10, "kl": 0.5, "note": "non-numeric skipped"})
        rd.close()
        import glob
        events = glob.glob(rd.file("tb") + "/events.out.tfevents.*")
        assert events, "no TensorBoard event file written"
        # the scalar round-trips through the event file
        from tensorboard.backend.event_processing.event_accumulator import \
            EventAccumulator
        acc = EventAccumulator(rd.file("tb"))
        acc.Reload()
        assert "kl" in acc.Tags()["scalars"]
        (ev,) = acc.Scalars("kl")
        assert ev.step == 10 and abs(ev.value - 0.5) < 1e-6

    def test_tensorboard_off_by_default(self, tmp_path):
        rd = RunDir(str(tmp_path), "runNoTB",
                    FedGANConfig(algo="flgan", dataset="2dmg"))
        rd.log({"round": 1, "kl": 0.5})
        rd.close()
        assert not os.path.exists(rd.file("tb"))


class TestImaging:
    def test_grid_png(self, tmp_path):
        imgs = np.random.default_rng(0).uniform(-1, 1, (30, 1, 28, 28))
        p = str(tmp_path / "g.png")
        save_image_grid(imgs, p)
        from PIL import Image
        im = Image.open(p)
        assert im.size[0] > 280 and im.size[1] > 84

    def test_scatter_png(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(500, 2)) * 0.3
        p = str(tmp_path / "s.png")
        save_scatter_2d(p, pts, pts + 0.1)
        assert os.path.getsize(p) > 1000


class TestIdxLoader:
    def _write_idx(self, tmp_path, gz=False):
        imgs = np.random.default_rng(0).integers(0, 255, (20, 28, 28)
                                                 ).astype(np.uint8)
        labels = np.random.default_rng(1).integers(0, 10, (20,)
                                                   ).astype(np.uint8)
        opener = gzip.open if gz else open
        ext = ".gz" if gz else ""
        with opener(os.path.join(tmp_path, f"train-images-idx3-ubyte{ext}"),
                    "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 3))
            f.write(struct.pack(">III", 20, 28, 28))
            f.write(imgs.tobytes())
        with opener(os.path.join(tmp_path, f"train-labels-idx1-ubyte{ext}"),
                    "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 1))
            f.write(struct.pack(">I", 20))
            f.write(labels.tobytes())
        return imgs, labels

    @pytest.mark.parametrize("gz", [False, True])
    def test_load(self, tmp_path, gz):
        imgs, labels = self._write_idx(str(tmp_path), gz)
        got_i, got_l = load_idx_dataset(str(tmp_path))
        np.testing.assert_array_equal(got_i, imgs)
        np.testing.assert_array_equal(got_l, labels)

    def test_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_idx_dataset(str(tmp_path))


class TestAdamInline:
    def test_bit_identical_to_optax(self):
        """common.adam_inline shares optax.adam's exact op order — updates
        must match bit-for-bit (benchmarks/adam_fusion_probe.py measures the
        same over 1200 jitted rounds on TPU)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from cglgan_tpu.algos.common import adam_inline

        p = {"w": jnp.linspace(-1, 1, 32).reshape(8, 4), "b": jnp.arange(4.0)}
        ta = optax.adam(2e-4, b1=0.5, b2=0.999)
        tb = adam_inline(2e-4, 0.5, 0.999)

        def mk_step(tx):
            @jax.jit
            def step(p, s, g):
                u, s2 = tx.update(g, s, p)
                return optax.apply_updates(p, u), s2
            return step

        step_a, step_b = mk_step(ta), mk_step(tb)
        sa, sb = ta.init(p), tb.init(p)
        pa = pb = p
        key = jax.random.key(0)
        for i in range(7):
            key, sub = jax.random.split(key)
            g = jax.tree.map(
                lambda x: jax.random.normal(sub, x.shape) * 0.1, p)
            pa, sa = step_a(pa, sa, g)
            pb, sb = step_b(pb, sb, g)
        for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-7, atol=0)
