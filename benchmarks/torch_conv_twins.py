"""Eager-torch twins of the conv LSGAN family (model/lsgan.py:3-98).

Shared between the layer/one-step parity tests
(tests/test_torch_conv_parity.py) and the multi-round conv trajectory twin
(benchmarks/trajectory_parity.py TorchMDGANConvTwin): torch modules whose
weights transplant from the jax zoo pytrees (``load_jax``) and whose
Dropout2d is applied via externally supplied channel keep-masks so numerics
compare 1:1 with the jax draw.
"""
import numpy as np
import torch


def _np(x):
    return np.array(x, dtype=np.float32)   # copy: torch needs writable


def copy_conv(m, p):
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(_np(p["w"])))        # OIHW == OIHW
        m.bias.copy_(torch.from_numpy(_np(p["b"])))


def copy_linear(m, p):
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(_np(p["w"]).T.copy()))
        m.bias.copy_(torch.from_numpy(_np(p["b"])))


def copy_bn(m, p, s):
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(_np(p["scale"])))
        m.bias.copy_(torch.from_numpy(_np(p["bias"])))
        m.running_mean.copy_(torch.from_numpy(_np(s["mean"])))
        m.running_var.copy_(torch.from_numpy(_np(s["var"])))


class TorchConvG(torch.nn.Module):
    """lsgan.Generator twin: Linear 100->128*8*8, 2x(Upsample, Conv3x3,
    BN(eps0.8), LReLU), Conv3x3 -> Tanh (lsgan.py:3-27)."""

    def __init__(self):
        super().__init__()
        nn_ = torch.nn
        self.l1 = nn_.Linear(100, 128 * 8 * 8)
        self.c1 = nn_.Conv2d(128, 128, 3, 1, 1)
        self.bn1 = nn_.BatchNorm2d(128, 0.8)
        self.c2 = nn_.Conv2d(128, 64, 3, 1, 1)
        self.bn2 = nn_.BatchNorm2d(64, 0.8)
        self.c3 = nn_.Conv2d(64, 1, 3, 1, 1)
        self.up = nn_.Upsample(scale_factor=2)
        self.act = nn_.LeakyReLU(0.2)

    def forward(self, z):
        x = self.l1(z).view(z.shape[0], 128, 8, 8)
        x = self.act(self.bn1(self.c1(self.up(x))))
        x = self.act(self.bn2(self.c2(self.up(x))))
        return torch.tanh(self.c3(x))

    def load_jax(self, p, s):
        copy_linear(self.l1, p["l1"])
        for name in ("c1", "c2", "c3"):
            copy_conv(getattr(self, name), p[name])
        copy_bn(self.bn1, p["bn1"], s["bn1"])
        copy_bn(self.bn2, p["bn2"], s["bn2"])


class TorchConvMixG(torch.nn.Module):
    """lsgan.MixGenerator twin (model/lsgan.py:34-71), built to the jax
    conv-multipath G's structure (cglgan_tpu/models/zoo.py:166-202), which
    fixes the reference's missing ``self.img_shape`` latent bug
    (lsgan.py:68): trunk = Linear 100->128*8*8, Upsample, Conv3x3(128->128),
    BN(eps 0.8), LReLU, Upsample, Conv3x3(128->64); each of the k
    personalization heads = BN(64, eps 0.8), LReLU, Conv3x3(64->1), Tanh.
    Forward returns the (k, B, 1, 32, 32) stack — head i's batch routes to
    client i (mixed-gan.py:242-252)."""

    def __init__(self, k):
        super().__init__()
        nn_ = torch.nn
        self.l1 = nn_.Linear(100, 128 * 8 * 8)
        self.c1 = nn_.Conv2d(128, 128, 3, 1, 1)
        self.bn1 = nn_.BatchNorm2d(128, 0.8)
        self.c2 = nn_.Conv2d(128, 64, 3, 1, 1)
        heads = []
        for _ in range(k):
            h = nn_.Module()
            h.bn = nn_.BatchNorm2d(64, 0.8)
            h.c = nn_.Conv2d(64, 1, 3, 1, 1)
            heads.append(h)
        self.heads = nn_.ModuleList(heads)
        self.up = nn_.Upsample(scale_factor=2)
        self.act = nn_.LeakyReLU(0.2)

    def forward(self, z):
        x = self.l1(z).view(z.shape[0], 128, 8, 8)
        x = self.act(self.bn1(self.c1(self.up(x))))
        hidden = self.c2(self.up(x))
        return torch.stack([torch.tanh(h.c(self.act(h.bn(hidden))))
                            for h in self.heads])

    def trunk_tensors(self):
        """Everything the CGL cloud sync moves for the trunk scope:
        params AND BN running stats (copy_parameters is a state_dict walk
        minus 0-dim tensors, CGLGAN/MNIST/main.py:140-145)."""
        return [self.l1.weight, self.l1.bias, self.c1.weight, self.c1.bias,
                self.c2.weight, self.c2.bias, self.bn1.weight, self.bn1.bias,
                self.bn1.running_mean, self.bn1.running_var]

    def set_trunk_grad(self, flag):
        for m in (self.l1, self.c1, self.bn1, self.c2):
            m.requires_grad_(flag)

    def set_heads_grad(self, flag):
        self.heads.requires_grad_(flag)

    def load_jax(self, p, s):
        """p/s: the jax G pytrees indexed down to one server (head leaves
        keep their leading (k,) axis)."""
        t = p["trunk"]
        copy_linear(self.l1, t["l1"])
        copy_conv(self.c1, t["c1"])
        copy_conv(self.c2, t["c2"])
        copy_bn(self.bn1, t["bn1"], s["trunk"]["bn1"])
        for i, h in enumerate(self.heads):
            copy_conv(h.c, {k_: v[i] for k_, v in p["heads"]["c"].items()})
            copy_bn(h.bn,
                    {k_: v[i] for k_, v in p["heads"]["bn"].items()},
                    {k_: v[i] for k_, v in s["heads"]["bn"].items()})


class TorchConvD(torch.nn.Module):
    """lsgan.Discriminator twin: 4 blocks [Conv3x3 s2, LReLU, Dropout2d(.25),
    (BN eps0.8 for blocks 2-4)] + Linear 128*2*2 -> 1 raw logit
    (lsgan.py:73-98).  Dropout is applied via externally supplied channel
    keep-masks so numerics can be compared 1:1 with the jax draw."""

    def __init__(self):
        super().__init__()
        nn_ = torch.nn
        self.c1 = nn_.Conv2d(1, 16, 3, 2, 1)
        self.c2 = nn_.Conv2d(16, 32, 3, 2, 1)
        self.c3 = nn_.Conv2d(32, 64, 3, 2, 1)
        self.c4 = nn_.Conv2d(64, 128, 3, 2, 1)
        self.bn2 = nn_.BatchNorm2d(32, 0.8)
        self.bn3 = nn_.BatchNorm2d(64, 0.8)
        self.bn4 = nn_.BatchNorm2d(128, 0.8)
        self.adv = nn_.Linear(128 * 2 * 2, 1)
        self.act = torch.nn.LeakyReLU(0.2)

    def forward(self, x, masks=None):
        def drop(h, i):
            if masks is None:
                return h
            return h * masks[i] / 0.75
        x = drop(self.act(self.c1(x)), 0)
        # reference block order: conv -> lrelu -> dropout -> bn
        x = self.bn2(drop(self.act(self.c2(x)), 1))
        x = self.bn3(drop(self.act(self.c3(x)), 2))
        x = self.bn4(drop(self.act(self.c4(x)), 3))
        return self.adv(x.reshape(x.shape[0], -1))

    def load_jax(self, p, s):
        for name in ("c1", "c2", "c3", "c4"):
            copy_conv(getattr(self, name), p[name])
        for i in (2, 3, 4):
            copy_bn(getattr(self, f"bn{i}"), p[f"bn{i}"], s[f"bn{i}"])
        copy_linear(self.adv, p["adv"])


def dropout_masks(rng, b):
    """The exact channel keep-masks _conv_d_apply draws (zoo.py:220-238):
    rngs = split(rng, 4); block1 uses rngs[0], block i in (2,3,4) uses
    rngs[i-1]."""
    import jax
    rngs = jax.random.split(rng, 4)
    chans = (16, 32, 64, 128)
    return [torch.from_numpy(np.asarray(jax.random.bernoulli(
        k, 0.75, (b, c, 1, 1)), dtype=np.float32))
        for k, c in zip(rngs, chans)]
