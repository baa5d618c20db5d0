"""Torch numeric cross-checks for the InceptionV3 pool3 math.

tests/test_inception.py certifies shapes and the weight-loader round trip;
this module certifies the NUMERICS with random weights and no torchvision
(VERDICT r2 missing #4): every primitive the pool3 path uses — BasicConv2d
(bias-free conv + eval-BN eps 1e-3 + ReLU) at every stride/padding variant,
MaxPool2d(3,2), AvgPool2d(3,1,1) with count_include_pad, the bilinear-299
preprocess — and an end-to-end full-network forward against an eager torch
twin driven by the SAME torchvision-keyed parameter dict.  The day real
``--inception-weights`` appear, FID is then trusted down to float tolerance.

Reference consumer: FLGAN/MNIST/flgan.py:81-98 (ignite FID over pretrained
inception_v3 features).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F                              # noqa: E402

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from cglgan_tpu.evalx import inception as inc                # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def _rand_basic_params(cout, cin, kh, kw, seed):
    rng = np.random.default_rng(seed)
    return {
        "x.conv.weight": rng.standard_normal(
            (cout, cin, kh, kw)).astype(np.float32) * 0.1,
        "x.bn.weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        "x.bn.bias": rng.standard_normal(cout).astype(np.float32) * 0.1,
        "x.bn.running_mean": rng.standard_normal(cout).astype(
            np.float32) * 0.1,
        "x.bn.running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
    }


def _torch_basic(p, x, stride=(1, 1), padding=(0, 0)):
    """BasicConv2d in eager torch: conv(bias=None) -> eval-mode batch_norm
    (eps 1e-3, torchvision inception) -> relu."""
    y = F.conv2d(x, _t(p["x.conv.weight"]), bias=None, stride=stride,
                 padding=padding)
    y = F.batch_norm(y, _t(p["x.bn.running_mean"]), _t(p["x.bn.running_var"]),
                     _t(p["x.bn.weight"]), _t(p["x.bn.bias"]),
                     training=False, eps=1e-3)
    return F.relu(y)


TOL = dict(rtol=1e-4, atol=1e-5)


class TestBasicConv2d:
    @pytest.mark.parametrize("kh,kw,pad,stride", [
        (3, 3, ((0, 0), (0, 0)), (2, 2)),    # stem Conv2d_1a
        (3, 3, ((1, 1), (1, 1)), (1, 1)),    # P1
        (5, 5, ((2, 2), (2, 2)), (1, 1)),    # P2 (branch5x5)
        (1, 7, ((0, 0), (3, 3)), (1, 1)),    # P17 (branch7x7 row)
        (7, 1, ((3, 3), (0, 0)), (1, 1)),    # P71 (branch7x7 col)
        (1, 3, ((0, 0), (1, 1)), (1, 1)),    # P13 (E-block split)
        (3, 1, ((1, 1), (0, 0)), (1, 1)),    # P31
        (1, 1, ((0, 0), (0, 0)), (1, 1)),    # 1x1 branches
    ])
    def test_variants(self, kh, kw, pad, stride):
        p = _rand_basic_params(8, 5, kh, kw, seed=kh * 10 + kw)
        x = _rand(2, 5, 13, 13, seed=3)
        yj = inc._basic(p, "x", jnp.asarray(x), stride=stride, padding=pad)
        yt = _torch_basic(p, _t(x), stride=stride,
                          padding=(pad[0][0], pad[1][0]))
        np.testing.assert_allclose(np.asarray(yj), yt.numpy(), **TOL)


class TestPools:
    def test_maxpool_3s2(self):
        x = _rand(2, 4, 15, 15, seed=5)
        yj = inc._maxpool3s2(jnp.asarray(x))
        yt = F.max_pool2d(_t(x), 3, 2)
        np.testing.assert_allclose(np.asarray(yj), yt.numpy(), rtol=1e-6)

    def test_avgpool_3s1p1_count_include_pad(self):
        """torch AvgPool2d(3,1,1) divides by 9 even at the border
        (count_include_pad=True default) — the variant the A/C/E branch
        pools rely on."""
        x = _rand(2, 4, 9, 9, seed=6)
        yj = inc._avgpool3s1p1(jnp.asarray(x))
        yt = F.avg_pool2d(_t(x), 3, stride=1, padding=1)
        np.testing.assert_allclose(np.asarray(yj), yt.numpy(), rtol=1e-5,
                                   atol=1e-6)


class TestPreprocess:
    def test_bilinear_299_matches_torch(self):
        """jax.image.resize 'bilinear' == F.interpolate(align_corners=False)
        for upsampling (half-pixel convention; antialias is a no-op
        upscaling) — the reference's PIL-BILINEAR 299 resize
        (FLGAN/MNIST/flgan.py:65-73)."""
        x = _rand(3, 1, 28, 28, seed=7)
        yj = inc.preprocess(jnp.asarray(x))
        xt = _t(x).expand(3, 3, 28, 28)
        yt = F.interpolate(xt, size=(299, 299), mode="bilinear",
                           align_corners=False)
        np.testing.assert_allclose(np.asarray(yj), yt.numpy(), rtol=1e-4,
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end: full pool3 network vs an eager torch twin over the same
# torchvision-keyed random parameter dict
# ---------------------------------------------------------------------------

def _tb(p, name, x, stride=(1, 1), padding=(0, 0)):
    y = F.conv2d(x, _t(p[f"{name}.conv.weight"]), bias=None, stride=stride,
                 padding=padding)
    y = F.batch_norm(y, _t(p[f"{name}.bn.running_mean"]),
                     _t(p[f"{name}.bn.running_var"]),
                     _t(p[f"{name}.bn.weight"]), _t(p[f"{name}.bn.bias"]),
                     training=False, eps=1e-3)
    return F.relu(y)


def _torch_pool3(p, x):
    """The torchvision inception_v3 pool3 forward in eager torch functional
    calls (topology per torchvision.models.inception)."""
    avg = lambda v: F.avg_pool2d(v, 3, stride=1, padding=1)
    mp = lambda v: F.max_pool2d(v, 3, 2)

    x = _tb(p, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _tb(p, "Conv2d_2a_3x3", x)
    x = _tb(p, "Conv2d_2b_3x3", x, padding=(1, 1))
    x = mp(x)
    x = _tb(p, "Conv2d_3b_1x1", x)
    x = _tb(p, "Conv2d_4a_3x3", x)
    x = mp(x)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):       # InceptionA
        b1 = _tb(p, f"{n}.branch1x1", x)
        b5 = _tb(p, f"{n}.branch5x5_2",
                 _tb(p, f"{n}.branch5x5_1", x), padding=(2, 2))
        bd = _tb(p, f"{n}.branch3x3dbl_1", x)
        bd = _tb(p, f"{n}.branch3x3dbl_2", bd, padding=(1, 1))
        bd = _tb(p, f"{n}.branch3x3dbl_3", bd, padding=(1, 1))
        bp = _tb(p, f"{n}.branch_pool", avg(x))
        x = torch.cat([b1, b5, bd, bp], 1)
    n = "Mixed_6a"                                       # InceptionB
    b3 = _tb(p, f"{n}.branch3x3", x, stride=(2, 2))
    bd = _tb(p, f"{n}.branch3x3dbl_1", x)
    bd = _tb(p, f"{n}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = _tb(p, f"{n}.branch3x3dbl_3", bd, stride=(2, 2))
    x = torch.cat([b3, bd, mp(x)], 1)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):  # InceptionC
        b1 = _tb(p, f"{n}.branch1x1", x)
        b7 = _tb(p, f"{n}.branch7x7_1", x)
        b7 = _tb(p, f"{n}.branch7x7_2", b7, padding=(0, 3))
        b7 = _tb(p, f"{n}.branch7x7_3", b7, padding=(3, 0))
        bd = _tb(p, f"{n}.branch7x7dbl_1", x)
        bd = _tb(p, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = _tb(p, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = _tb(p, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = _tb(p, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = _tb(p, f"{n}.branch_pool", avg(x))
        x = torch.cat([b1, b7, bd, bp], 1)
    n = "Mixed_7a"                                       # InceptionD
    b3 = _tb(p, f"{n}.branch3x3_2",
             _tb(p, f"{n}.branch3x3_1", x), stride=(2, 2))
    b7 = _tb(p, f"{n}.branch7x7x3_1", x)
    b7 = _tb(p, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _tb(p, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _tb(p, f"{n}.branch7x7x3_4", b7, stride=(2, 2))
    x = torch.cat([b3, b7, mp(x)], 1)
    for n in ("Mixed_7b", "Mixed_7c"):                   # InceptionE
        b1 = _tb(p, f"{n}.branch1x1", x)
        b3 = _tb(p, f"{n}.branch3x3_1", x)
        b3 = torch.cat([
            _tb(p, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
            _tb(p, f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = _tb(p, f"{n}.branch3x3dbl_1", x)
        bd = _tb(p, f"{n}.branch3x3dbl_2", bd, padding=(1, 1))
        bd = torch.cat([
            _tb(p, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _tb(p, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        bp = _tb(p, f"{n}.branch_pool", avg(x))
        x = torch.cat([b1, b3, bd, bp], 1)
    return x.mean(dim=(2, 3))


class TestFullNetworkParity:
    def test_pool3_features_match(self):
        """End-to-end (2, 3, 299, 299) forward: the jitted pool3 features
        equal the eager torch twin's over the same random torchvision-keyed
        parameter dict."""
        params = inc.inception_init(jax.random.key(5))
        x = _rand(2, 3, 299, 299, seed=9) * 0.5
        feats_j = np.asarray(inc.inception_pool3(params, jnp.asarray(x)))
        pn = {k: np.asarray(v) for k, v in params.items()}
        feats_t = _torch_pool3(pn, _t(x)).numpy()
        assert feats_j.shape == feats_t.shape == (2, 2048)
        # 94 chained random-weight conv layers accumulate float noise;
        # compare with a scale-aware atol
        scale = np.abs(feats_t).max()
        np.testing.assert_allclose(feats_j, feats_t, rtol=2e-3,
                                   atol=2e-4 * scale)
