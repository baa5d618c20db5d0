"""Import of reference torch generator checkpoints (utils/torch_import.py).

Twins are built exactly as the reference defines them (same attribute
names — ``model`` / ``paths`` / ``l1`` / ``conv_blocks`` — so the saved
``state_dict`` has the reference's key layout: ``CGLGAN/2DMG/model.py``,
``model/mnist_model.py``, ``model/lsgan.py``), trained a few BN steps so
running stats are non-trivial, ``torch.save``d, imported, and checked for
**eval-mode** forward parity — eval mode exercises the imported running
stats, which is what sampling/FID/serving of an imported checkpoint uses.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cglgan_tpu.models.zoo import build_generator  # noqa: E402
from cglgan_tpu.utils import torch_import as ti  # noqa: E402


def _block(din, dout, normalize=True):
    layers = [tnn.Linear(din, dout)]
    if normalize:
        layers.append(tnn.BatchNorm1d(dout, 0.8))
    layers.append(tnn.LeakyReLU(0.2))
    return layers


class _SeqG(tnn.Module):
    """Reference single-path shape: everything under ``self.model``."""

    def __init__(self, seq):
        super().__init__()
        self.model = seq

    def forward(self, z):
        return self.model(z)


class _PathG(tnn.Module):
    """Reference multipath shape: ``self.model`` trunk + ``self.paths``."""

    def __init__(self, trunk, heads):
        super().__init__()
        self.model = trunk
        self.paths = tnn.ModuleList(heads)

    def forward(self, z):
        h = self.model(z)
        return torch.stack([p(h) for p in self.paths])


class _ConvG(tnn.Module):
    """model/lsgan.py:3-27 Generator (l1 + conv_blocks)."""

    def __init__(self):
        super().__init__()
        self.l1 = tnn.Sequential(tnn.Linear(100, 128 * 8 * 8))
        self.conv_blocks = tnn.Sequential(
            tnn.Upsample(scale_factor=2),
            tnn.Conv2d(128, 128, 3, stride=1, padding=1),
            tnn.BatchNorm2d(128, 0.8),
            tnn.LeakyReLU(0.2),
            tnn.Upsample(scale_factor=2),
            tnn.Conv2d(128, 64, 3, stride=1, padding=1),
            tnn.BatchNorm2d(64, 0.8),
            tnn.LeakyReLU(0.2),
            tnn.Conv2d(64, 1, 3, stride=1, padding=1),
            tnn.Tanh())

    def forward(self, z):
        out = self.l1(z).view(z.shape[0], 128, 8, 8)
        return self.conv_blocks(out)


class _ConvMixG(tnn.Module):
    """model/lsgan.py:37-70 MixGenerator (with its self.img_shape bug
    fixed — we only need forward for parity, not the reference's view)."""

    def __init__(self, n):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.Sequential(tnn.Linear(100, 128 * 8 * 8)),
            tnn.Unflatten(1, (128, 8, 8)),
            tnn.Upsample(scale_factor=2),
            tnn.Conv2d(128, 128, 3, stride=1, padding=1),
            tnn.BatchNorm2d(128, 0.8),
            tnn.LeakyReLU(0.2),
            tnn.Upsample(scale_factor=2),
            tnn.Conv2d(128, 64, 3, stride=1, padding=1))
        self.paths = tnn.ModuleList([
            tnn.Sequential(tnn.BatchNorm2d(64, 0.8), tnn.LeakyReLU(0.2),
                           tnn.Conv2d(64, 1, 3, stride=1, padding=1),
                           tnn.Tanh())
            for _ in range(n)])

    def forward(self, z):
        h = self.model(z)
        return torch.stack([p(h) for p in self.paths])


def _mk_mnist_mlp(out=784):
    return _SeqG(tnn.Sequential(
        *_block(100, 128, normalize=False), *_block(128, 256),
        *_block(256, 512), *_block(512, 1024),
        tnn.Linear(1024, out), tnn.Tanh()))


def _mk_mnist_multipath(n, out=784):
    trunk = tnn.Sequential(*_block(100, 128, normalize=False),
                           *_block(128, 256), *_block(256, 512))
    heads = [tnn.Sequential(*_block(512, 1024), tnn.Linear(1024, out),
                            tnn.Tanh()) for _ in range(n)]
    return _PathG(trunk, heads)


def _warm_and_save(tg, path, steps=3, zdim=100):
    """Run train-mode forwards so BN running stats move, then save."""
    tg.train()
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for _ in range(steps):
            tg(torch.randn(32, zdim, generator=gen))
    torch.save(tg.state_dict(), path)


def _eval_parity(tg, tmp_path, expect, multipath=False, img=False,
                 atol=1e-5):
    pt = str(tmp_path / "g.pt")
    _warm_and_save(tg, pt)
    model, params, state, info = ti.import_generator_file(pt)
    for k, v in expect.items():
        assert info[k] == v, (k, info)
    z = np.random.default_rng(3).normal(size=(16, 100)).astype(np.float32)
    ours, _ = model.apply(params, state, jnp.asarray(z), train=False)
    tg.eval()
    with torch.no_grad():
        theirs = tg(torch.from_numpy(z)).numpy()
    ours = np.asarray(ours)
    if img and not multipath:
        theirs = theirs.reshape(ours.shape)
    elif img:
        theirs = theirs.reshape(ours.shape)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=atol)


class TestImportEvalParity:
    def test_mnist_mlp(self, tmp_path):
        _eval_parity(_mk_mnist_mlp(), tmp_path,
                     {"family": "mnist-mlp", "num_heads": 1,
                      "img_shape": (1, 28, 28)}, img=True)

    def test_mnist_mlp_img_size_16(self, tmp_path):
        _eval_parity(_mk_mnist_mlp(out=256), tmp_path,
                     {"family": "mnist-mlp", "img_shape": (1, 16, 16)},
                     img=True)

    def test_mnist_multipath(self, tmp_path):
        _eval_parity(_mk_mnist_multipath(3), tmp_path,
                     {"family": "mnist-multipath", "num_heads": 3,
                      "img_shape": (1, 28, 28)}, multipath=True, img=True)

    def test_2dmg_small(self, tmp_path):
        tg = _SeqG(tnn.Sequential(tnn.Linear(100, 32), tnn.LeakyReLU(0.2),
                                  tnn.Linear(32, 2), tnn.Tanh()))
        _eval_parity(tg, tmp_path, {"family": "2dmg-small",
                                    "img_shape": (2,)})

    def test_2dmg_mlp(self, tmp_path):
        tg = _SeqG(tnn.Sequential(tnn.Linear(100, 256), tnn.LeakyReLU(0.2),
                                  tnn.Linear(256, 128), tnn.LeakyReLU(0.2),
                                  tnn.Linear(128, 2), tnn.Tanh()))
        _eval_parity(tg, tmp_path, {"family": "2dmg-mlp", "img_shape": (2,)})

    def test_2dmg_multipath(self, tmp_path):
        trunk = tnn.Sequential(tnn.Linear(100, 32), tnn.LeakyReLU(0.2))
        heads = [tnn.Sequential(tnn.Linear(32, 2), tnn.Tanh())
                 for _ in range(5)]
        _eval_parity(_PathG(trunk, heads), tmp_path,
                     {"family": "2dmg-multipath", "num_heads": 5},
                     multipath=True)

    def test_conv(self, tmp_path):
        _eval_parity(_ConvG(), tmp_path,
                     {"family": "conv", "img_shape": (1, 32, 32)},
                     img=True, atol=1e-4)

    def test_conv_multipath(self, tmp_path):
        _eval_parity(_ConvMixG(2), tmp_path,
                     {"family": "conv-multipath", "num_heads": 2,
                      "img_shape": (1, 32, 32)},
                     multipath=True, img=True, atol=1e-4)


def _save_2dmg_small(tmp_path, name, seed):
    torch.manual_seed(seed)
    g = _SeqG(tnn.Sequential(tnn.Linear(100, 32), tnn.LeakyReLU(0.2),
                             tnn.Linear(32, 2), tnn.Tanh()))
    p = str(tmp_path / name)
    torch.save(g.state_dict(), p)
    return p, g


class TestWarmStart:
    """warm_start_generators: continue training a reference model here."""

    def _cfg(self, algo, **kw):
        from cglgan_tpu.core.config import FedGANConfig
        base = dict(algo=algo, dataset="2dmg", num_workers=4, num_class=5,
                    num_sample=200, iid=1, batch_size=32,
                    num_communication=4, num_plt=2, epoch=1)
        base.update(kw)
        return FedGANConfig(**base)

    def test_stacked_per_server(self, tmp_path):
        """capgan stacks one G per server: one .pt per server lands in its
        slot; D/opt/t untouched; training proceeds."""
        from cglgan_tpu.algos.registry import build_runner
        p0, g0 = _save_2dmg_small(tmp_path, "s0.pt", 10)
        p1, g1 = _save_2dmg_small(tmp_path, "s1.pt", 11)
        r = build_runner(self._cfg("acgan", num_servers=2))
        s = r.init_state()
        s2 = ti.warm_start_generators(s, [p0, p1])
        w = np.asarray(s2.g.params[0]["w"])          # (S, 100, 32)
        np.testing.assert_allclose(
            w[0], g0.model[0].weight.detach().numpy().T, rtol=1e-6)
        np.testing.assert_allclose(
            w[1], g1.model[0].weight.detach().numpy().T, rtol=1e-6)
        assert not np.allclose(w[0], w[1])
        np.testing.assert_array_equal(
            np.asarray(s2.d.params[0]["w"]), np.asarray(s.d.params[0]["w"]))
        assert int(s2.t) == 0
        s3, _ = jax.jit(r.round_fn)(s2)              # still trains
        assert not np.allclose(np.asarray(jax.tree.leaves(s3.g.params)[0]),
                               np.asarray(jax.tree.leaves(s2.g.params)[0]))

    def test_stacked_broadcast_one(self, tmp_path):
        from cglgan_tpu.algos.registry import build_runner
        p0, _ = _save_2dmg_small(tmp_path, "s.pt", 12)
        r = build_runner(self._cfg("acgan", num_servers=2))
        s2 = ti.warm_start_generators(r.init_state(), [p0])
        w = np.asarray(s2.g.params[0]["w"])
        np.testing.assert_allclose(w[0], w[1])

    def test_shared_generator(self, tmp_path):
        """flgan shares ONE G (reference: the server broadcasts one
        state_dict): a single .pt replaces it; two is an error."""
        from cglgan_tpu.algos.registry import build_runner
        # flgan 2DMG uses the 100-256-128-2 MLP (FLGAN/2DMG/model.py:4-20)
        torch.manual_seed(13)
        g = _SeqG(tnn.Sequential(tnn.Linear(100, 256), tnn.LeakyReLU(0.2),
                                 tnn.Linear(256, 128), tnn.LeakyReLU(0.2),
                                 tnn.Linear(128, 2), tnn.Tanh()))
        p0 = str(tmp_path / "g.pt")
        torch.save(g.state_dict(), p0)
        r = build_runner(self._cfg("flgan"))
        s2 = ti.warm_start_generators(r.init_state(), [p0])
        np.testing.assert_allclose(
            np.asarray(s2.g.params[0]["w"]),
            g.model[0].weight.detach().numpy().T, rtol=1e-6)
        with pytest.raises(ti.TorchImportError, match="single"):
            ti.warm_start_generators(r.init_state(), [p0, p0])

    def test_wrong_family_rejected(self, tmp_path):
        from cglgan_tpu.algos.registry import build_runner
        p0, _ = _save_2dmg_small(tmp_path, "s.pt", 14)   # 2dmg-small
        r = build_runner(self._cfg("flgan"))             # wants 2dmg-mlp
        with pytest.raises(ti.TorchImportError):
            ti.warm_start_generators(r.init_state(), [p0])

    def test_count_mismatch_rejected(self, tmp_path):
        from cglgan_tpu.algos.registry import build_runner
        p0, _ = _save_2dmg_small(tmp_path, "s.pt", 15)
        r = build_runner(self._cfg("acgan", num_servers=4))
        with pytest.raises(ti.TorchImportError, match="4 stacked"):
            ti.warm_start_generators(r.init_state(), [p0, p0])


class TestImportErrors:
    def test_discriminator_rejected(self, tmp_path):
        """A reference D state_dict (fan-in != 100) must fail loudly."""
        td = _SeqG(tnn.Sequential(tnn.Linear(784, 512), tnn.LeakyReLU(0.2),
                                  tnn.Linear(512, 256), tnn.LeakyReLU(0.2),
                                  tnn.Linear(256, 1), tnn.Sigmoid()))
        pt = str(tmp_path / "d.pt")
        torch.save(td.state_dict(), pt)
        with pytest.raises(ti.TorchImportError, match="discriminator"):
            ti.import_generator_file(pt)

    def test_conv_discriminator_rejected(self, tmp_path):
        """A conv D (model/lsgan.py:73-98: conv blocks first, no latent
        Linear(100,...)) must get the discriminator hint, not a confusing
        'expected linear, found conv' conversion error."""
        td = _SeqG(tnn.Sequential(
            tnn.Conv2d(1, 16, 3, 2, 1), tnn.LeakyReLU(0.2),
            tnn.Conv2d(16, 32, 3, 2, 1), tnn.LeakyReLU(0.2),
            tnn.Flatten(), tnn.Linear(32 * 8 * 8, 1)))
        pt = str(tmp_path / "d_conv.pt")
        torch.save(td.state_dict(), pt)
        with pytest.raises(ti.TorchImportError, match="discriminator"):
            ti.import_generator_file(pt)

    def test_family_override_mismatch_rejected(self, tmp_path):
        tg = _mk_mnist_mlp()
        pt = str(tmp_path / "g.pt")
        torch.save(tg.state_dict(), pt)
        with pytest.raises(ti.TorchImportError):
            ti.import_generator_file(pt, family="2dmg-small")

    def test_non_state_dict_rejected(self, tmp_path):
        pt = str(tmp_path / "x.pt")
        torch.save([1, 2, 3], pt)
        with pytest.raises(ti.TorchImportError, match="state_dict"):
            ti.import_generator_file(pt)

    def test_bn_running_stats_actually_used(self, tmp_path):
        """Zeroed-vs-warmed running stats must change eval output — guards
        against silently dropping imported state."""
        tg = _mk_mnist_mlp()
        pt = str(tmp_path / "g.pt")
        _warm_and_save(tg, pt, steps=5)
        model, params, state, _ = ti.import_generator_file(pt)
        fresh_state = model.init(jax.random.key(0))[1]
        z = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 100)).astype(np.float32))
        a, _ = model.apply(params, state, z, train=False)
        b, _ = model.apply(params, fresh_state, z, train=False)
        assert not np.allclose(np.asarray(a), np.asarray(b))
