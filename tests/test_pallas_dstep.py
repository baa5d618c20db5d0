"""Fused VMEM-resident D-epoch kernel vs the reference jitted path.

The kernel must reproduce algos.common.d_step_fn(fuse_concat=True) composed
E times by d_epoch_steps + optax.adam, for both discriminator heads, to
float tolerance (MXU vs XLA accumulation order)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cglgan_tpu.algos import common
from cglgan_tpu.algos.common import NetState
from cglgan_tpu.models.zoo import build_discriminator
from cglgan_tpu.ops.pallas.fused_dstep import fused_d_epoch_steps

W, E, B, DIN = 3, 2, 8, 64
LR, B1, B2 = 2e-4, 0.5, 0.999


def _setup(out_dim, seed=0):
    d = build_discriminator("mnist", out_dim, in_dim=DIN)
    opt = optax.adam(LR, b1=B1, b2=B2)
    net = common.init_net_stacked(d, jax.random.key(seed), opt, W)
    rng = np.random.default_rng(seed)
    shard = rng.integers(0, 256, size=(W, 32, DIN)).astype(np.uint8)
    fake = rng.normal(size=(B, DIN)).astype(np.float32)
    starts = np.asarray([1, 17])[:E]
    return d, opt, net, jnp.asarray(shard), jnp.asarray(fake), starts


def _reference(d, opt, net, shard, fake, starts, head, half):
    adv = common.make_adv_loss(head)
    step = common.d_epoch_steps(
        common.d_step_fn(d, adv, opt, B, is_image=True, d_loss_half=half,
                         fuse_concat=True), E)
    key = jax.random.key(9)   # unused by the MLP D (no dropout)
    new, loss = jax.vmap(step, in_axes=(0, 0, None, None, None))(
        net, shard, jnp.asarray(starts), fake, key)
    return new, loss


def _unpack(net):
    """(params, mu, nu, count) as stacked 6-tuples from a stacked NetState."""
    lin = [p for p in net.params if isinstance(p, dict)]
    six = (lin[0]["w"], lin[0]["b"], lin[1]["w"], lin[1]["b"],
           lin[2]["w"], lin[2]["b"])
    adam_state = net.opt[0]
    mus = [p for p in adam_state.mu if isinstance(p, dict)]
    nus = [p for p in adam_state.nu if isinstance(p, dict)]
    mu6 = (mus[0]["w"], mus[0]["b"], mus[1]["w"], mus[1]["b"],
           mus[2]["w"], mus[2]["b"])
    nu6 = (nus[0]["w"], nus[0]["b"], nus[1]["w"], nus[1]["b"],
           nus[2]["w"], nus[2]["b"])
    return six, mu6, nu6, adam_state.count


def test_kernel_per_client_adam_counts():
    """Per-client bias corrections: counts diverge between clients (e.g. a
    checkpoint trained with dropout masking, then resumed without) and the
    kernel must match the per-client optax trajectories, not client 0's."""
    import jax.numpy as jnp
    d, opt, net, shard, fake, starts = _setup(1)
    # give each client a different pre-existing Adam step count
    counts = jnp.asarray([0, 7, 3], jnp.int32)
    adam_state = net.opt[0]._replace(count=counts)
    net = net._replace(opt=(adam_state,) + tuple(net.opt[1:]))

    ref_net, ref_loss = _reference(d, opt, net, shard, fake, starts,
                                   "sigmoid", False)
    six, mu6, nu6, count = _unpack(net)
    reals = jnp.stack([shard[:, s:s + B] for s in starts], axis=1)
    new_p, _, _, new_count, losses = fused_d_epoch_steps(
        six, mu6, nu6, count, reals, fake, head="sigmoid",
        d_loss_half=False, is_image=True, lr=LR, b1=B1, b2=B2,
        interpret=True)

    ref_six, _, _, ref_count = _unpack(ref_net)
    for a, b in zip(new_p, ref_six):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(new_count),
                                  np.asarray(ref_count))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_loss),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("head,out_dim,half", [
    ("sigmoid", 1, False),          # BCE family (mdgan/acgan/flgan/cgl)
    ("logits2", 2, True),           # CE family (cap/mix MNIST)
])
def test_kernel_matches_reference(head, out_dim, half):
    d, opt, net, shard, fake, starts = _setup(out_dim)
    ref_net, ref_loss = _reference(d, opt, net, shard, fake, starts,
                                   head, half)

    six, mu6, nu6, count = _unpack(net)
    reals = jnp.stack([shard[:, s:s + B] for s in starts], axis=1)  # (W,E,B,D)
    new_p, new_mu, new_nu, new_count, losses = fused_d_epoch_steps(
        six, mu6, nu6, jnp.max(count), reals, fake, head=head,
        d_loss_half=half, is_image=True, lr=LR, b1=B1, b2=B2,
        interpret=True)

    ref_six, ref_mu6, ref_nu6, ref_count = _unpack(ref_net)
    for a, b in zip(new_p, ref_six):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(new_mu, ref_mu6):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(new_nu, ref_nu6):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_loss),
                               rtol=1e-5, atol=1e-7)
    assert int(new_count) == int(np.max(np.asarray(ref_count)))


def test_kernel_bf16_state():
    """bfloat16 state tensors: the kernel upcasts to f32 in VMEM, runs all
    E steps with f32 elementwise/Adam math and bf16-input MXU dots (the
    XLA bf16 path's own matmul precision), and rounds to bf16 once at the
    store — so starting both paths from the same bf16-rounded values, the
    kernel must track the f32 reference to bf16-matmul resolution, and
    every output tensor must keep the bf16 dtype (the aliased in-place
    update)."""
    d, opt, net, shard, fake, starts = _setup(1)
    # round the initial state to bf16 so reference and kernel start equal
    down = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), t)
    up = lambda t: jax.tree.map(lambda x: x.astype(jnp.float32), t)
    net_b = net._replace(
        params=down(net.params),
        opt=jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                         if x.dtype == jnp.float32 else x, net.opt))
    net_f = net_b._replace(params=up(net_b.params),
                           opt=jax.tree.map(
                               lambda x: x.astype(jnp.float32)
                               if x.dtype == jnp.bfloat16 else x,
                               net_b.opt))
    # the kernel consumes bf16 fakes (G runs in bf16); feed the reference
    # the SAME bf16-rounded values upcast to f32 so both paths see
    # identical inputs and the only delta left is the one store-rounding
    fake_b = fake.astype(jnp.bfloat16)
    ref_net, ref_loss = _reference(d, opt, net_f, shard,
                                   fake_b.astype(jnp.float32), starts,
                                   "sigmoid", False)

    six, mu6, nu6, count = _unpack(net_b)
    reals = jnp.stack([shard[:, s:s + B] for s in starts], axis=1)
    new_p, new_mu, new_nu, _, losses = fused_d_epoch_steps(
        six, mu6, nu6, count, reals, fake_b,
        head="sigmoid", d_loss_half=False, is_image=True,
        lr=LR, b1=B1, b2=B2, interpret=True)

    for t in list(new_p) + list(new_mu) + list(new_nu):
        assert t.dtype == jnp.bfloat16
    assert losses.dtype == jnp.float32
    ref_six, ref_mu6, ref_nu6, _ = _unpack(ref_net)
    # identical inputs; the deltas left are the kernel's bf16-input dots
    # (vs the reference's f32 dots) and the one store-rounding, so
    # agreement is bf16 resolution with an atol floor for cancellation
    # tails near zero
    for a, b in zip(new_p, ref_six):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=1e-2, atol=1e-3)
    for a, b in zip(new_mu, ref_mu6):
        # gradients differ at bf16-dot resolution and the moment mixes
        # E of them; cancellation tails reach ~2e-3 absolute
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=2e-2, atol=3e-3)
    for a, b in zip(new_nu, ref_nu6):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=2e-2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_loss),
                               rtol=2e-2, atol=1e-3)


class TestKernelIntegration:
    """The families' kernel rounds must match the baseline rounds with
    identical PRNG draws (float tolerance: interpreter vs XLA)."""

    def _compare(self, algo, _rtol=1e-4, _atol=1e-5, _mtol=1e-4,
                 _force=False, **kw):
        from cglgan_tpu.algos.registry import build_runner, load_partition
        from cglgan_tpu.core.config import FedGANConfig

        base = dict(algo=algo, dataset="2dmg", num_workers=4, num_class=4,
                    num_sample=64, batch_size=16, iid=1, epoch=2,
                    num_communication=4, **kw)
        cfg_k = FedGANConfig(pallas_dstep=True if _force else None, **base)
        if not _force:
            assert cfg_k.pallas_dstep is None   # auto engages at epoch > 1
        cfg_b = FedGANConfig(pallas_dstep=False, **base)
        part = load_partition(cfg_k)
        rk, rb = build_runner(cfg_k, part), build_runner(cfg_b, part)
        sk, sb = rk.init_state(), rb.init_state()
        fk, fb = jax.jit(rk.round_fn), jax.jit(rb.round_fn)
        for _ in range(2):
            sk, mk = fk(sk)
            sb, mb = fb(sb)
        for a, b in zip(jax.tree.leaves(sk.d.params),
                        jax.tree.leaves(sb.d.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=_rtol, atol=_atol)
        for a, b in zip(jax.tree.leaves(sk.g.params),
                        jax.tree.leaves(sb.g.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=_rtol, atol=_atol)
        for key in mk:
            assert abs(float(mk[key]) - float(mb[key])) < _mtol, key

    def test_mdgan_round_matches_baseline(self):
        self._compare("mdgan")

    def test_cglgan_round_matches_baseline(self):
        self._compare("cglgan", num_servers=2)

    def test_capgan_round_matches_baseline(self):
        self._compare("capgan")

    def test_capgan_bf16_round_matches_baseline(self):
        """--dtype bfloat16 composed with the kernel (force-only mode: the
        XLA bf16 path is faster on-chip, so auto does not engage — see
        ``eligible``).  The kernel keeps f32 across the E local steps where
        the XLA bf16 path rounds per step, so tolerance is bf16-resolution."""
        self._compare("capgan", dtype="bfloat16", force_dtype=True,
                      _force=True,
                      _rtol=5e-2, _atol=5e-3, _mtol=5e-2)

    def test_bf16_auto_does_not_engage(self):
        """bf16 auto mode must run the (faster) XLA path, not the kernel."""
        from cglgan_tpu.core.config import FedGANConfig
        from cglgan_tpu.ops.pallas.fused_dstep import eligible
        cfg = FedGANConfig(algo="capgan", dataset="2dmg", num_workers=4,
                           num_class=4, num_sample=64, batch_size=16,
                           epoch=2, dtype="bfloat16", force_dtype=True)
        assert not eligible(cfg, None)
        assert eligible(cfg.replace(dtype="float32"), None)

    def test_force_flag_rejects_ineligible(self):
        from cglgan_tpu.algos.registry import build_runner
        from cglgan_tpu.core.config import FedGANConfig
        cfg = FedGANConfig(algo="mdgan", dataset="2dmg", num_workers=4,
                           num_class=4, num_sample=64, batch_size=16,
                           dropout_rate=0.3, pallas_dstep=True)
        with pytest.raises(ValueError, match="pallas_dstep"):
            build_runner(cfg)
