"""Communication-pattern assertions on the compiled HLO of every sharded round.

The one-chip rig can prove multi-chip *correctness* (the dryrun + the
sharded-vs-unsharded equivalence tests) but not communication *efficiency* —
a GSPMD sharding-propagation regression that all-gathers the full per-client
discriminator stack every round would pass every numeric test and only
surface as an ICI bandwidth wall on real hardware.  These tests compile each
algorithm's jitted round on the 8-device CPU mesh and assert on the
post-GSPMD collective ops directly:

* FedAvg lowers to all-reduce (one fused tuple op), not all-gather + local
  math (FLGAN/MNIST/flgan.py:143-163 semantics);
* the MD-GAN ring D-swap lowers to collective-permute
  (MDGAN/MNIST/mdgan.py:158-164's commented exchange, implemented for real);
* the AC-GAN E-round block share/delta lowers to a segment-sum all-reduce of
  per-server (S, ...) partials (ACGAN/MNIST/acgan.py:240-263);
* negatively: NO round, in any algorithm, contains an all-gather whose
  output is as large as even one full stacked-discriminator leaf — the
  queue-topology replacement thesis of SURVEY §2.3
  (CGLGAN/MNIST/main.py:120-133) is that exchanges ride exactly the intended
  collective, never a full-stack materialisation.
"""
import re

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.core.config import FedGANConfig

pytestmark = pytest.mark.smoke

BASE = dict(dataset="2dmg", num_workers=16, num_class=4, num_sample=64,
            batch_size=16, iid=1, num_communication=2)

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")

# "%name = <type> <opcode>(...)" — <type> may be a tuple "(f32[..], ...)"
_OP_RE = re.compile(
    r"=\s+(?P<type>\([^)]*\)|\S+)\s+(?P<op>" + "|".join(COLLECTIVES)
    + r")\(")
_SHAPE_RE = re.compile(r"[a-z]\d+\[([\d,]*)\]")


def _shape_elems(type_str):
    """Element counts of every array in an HLO result type string."""
    out = []
    for dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n)
    return out or [1]   # scalar f32[] etc.


def _collective_ops(txt):
    """[(opcode, [elem counts of each result array])] for one HLO module."""
    ops = []
    for line in txt.splitlines():
        m = _OP_RE.search(line)
        if m:
            ops.append((m.group("op"), _shape_elems(m.group("type"))))
    return ops


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.asarray(devs[:8]), ("clients",))


def _compile(cfg, mesh):
    runner = build_runner(cfg, mesh=mesh)
    state = runner.init_state()
    txt = jax.jit(runner.round_fn).lower(state).compile().as_text()
    return state, _collective_ops(txt)


def _max_d_leaf(state):
    """Element count of the largest stacked-discriminator leaf — the unit of
    the classic full-stack all-gather regression."""
    return max(int(np.prod(x.shape))
               for x in jax.tree.leaves(state.d.params))


def _assert_no_stack_gather(state, ops, label):
    cap = _max_d_leaf(state)
    for op, sizes in ops:
        if op == "all-gather":
            assert max(sizes) < cap, (
                f"{label}: all-gather of {max(sizes)} elements >= the "
                f"largest stacked-D leaf ({cap}) — a sharded round is "
                f"materialising per-client state it should reduce in place")


class TestFedAvgLowersToAllReduce:
    def test_flgan_single_fused_allreduce(self, mesh):
        cfg = FedGANConfig(algo="flgan", num_servers=1, epoch=1, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        # the G+D FedAvg is ONE fused tuple all-reduce; nothing else moves
        assert kinds.count("all-reduce") == 1, ops
        assert "all-gather" not in kinds, ops
        assert "collective-permute" not in kinds, ops
        _assert_no_stack_gather(state, ops, "flgan")

    def test_fegan_weighted_fedavg_allreduce(self, mesh):
        cfg = FedGANConfig(algo="fegan", num_servers=1, epoch=1,
                           frac_workers=0.5, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "all-reduce" in kinds, ops
        assert "all-gather" not in kinds, ops
        _assert_no_stack_gather(state, ops, "fegan")


class TestGossipLowersToPermute:
    def test_mdgan_ring_dswap_collective_permute(self, mesh):
        cfg = FedGANConfig(algo="mdgan", num_servers=1, epoch=1, E=1, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "collective-permute" in kinds, ops
        assert "all-gather" not in kinds, ops
        # one permute per D leaf (6 for the 2DMG MLP D), not per element
        n_leaves = len(jax.tree.leaves(state.d.params))
        assert kinds.count("collective-permute") <= n_leaves, ops
        _assert_no_stack_gather(state, ops, "mdgan E=1")

    def test_mdgan_no_swap_no_permute(self, mesh):
        cfg = FedGANConfig(algo="mdgan", num_servers=1, epoch=1, E=0, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "collective-permute" not in kinds, ops
        _assert_no_stack_gather(state, ops, "mdgan E=0")


class TestBlockShareLowersToSegmentAllReduce:
    def test_acgan_eround_share(self, mesh):
        cfg = FedGANConfig(algo="acgan", num_servers=2, epoch=1, E=1, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "all-reduce" in kinds, ops
        assert "all-gather" not in kinds, ops
        # the block mean is a per-server SEGMENT sum: the all-reduce moves
        # (S, ...) partials, never the (W, ...) stack
        w_leaf = _max_d_leaf(state)
        for op, sizes in ops:
            if op == "all-reduce":
                assert max(sizes) < w_leaf, (op, sizes, w_leaf)
        _assert_no_stack_gather(state, ops, "acgan E=1")

    def test_capgan_eround_share(self, mesh):
        """The CGL-family E-round share (capgan.py:295-303's para_d
        machinery) uses the same blocked segment mean."""
        cfg = FedGANConfig(algo="capgan", num_servers=2, epoch=1, E=1,
                           cloud_epoch=1, **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "all-gather" not in kinds, ops
        _assert_no_stack_gather(state, ops, "capgan E=1")

    def test_acgan_delta_gossip(self, mesh):
        cfg = FedGANConfig(algo="acgan", num_servers=2, epoch=1, E=1,
                           gossip="delta", **BASE)
        state, ops = _compile(cfg, mesh)
        kinds = [op for op, _ in ops]
        assert "all-reduce" in kinds, ops
        assert "all-gather" not in kinds, ops
        _assert_no_stack_gather(state, ops, "acgan delta")


class TestNoFullStackGatherAnywhere:
    """The load-bearing negative, over every remaining algorithm/topology."""

    @pytest.mark.parametrize("kw", [
        dict(algo="capgan", num_servers=1, epoch=1),
        dict(algo="cglgan", num_servers=2, cloud_epoch=1),
        dict(algo="mixgan", num_servers=2, cloud_epoch=1),
        dict(algo="mdgan", num_servers=1, epoch=1, E=1, dropout_rate=0.25),
    ], ids=lambda kw: kw["algo"] + (".drop" if "dropout_rate" in kw else ""))
    def test_round_has_no_stack_gather(self, mesh, kw):
        cfg = FedGANConfig(**kw, **BASE)
        state, ops = _compile(cfg, mesh)
        _assert_no_stack_gather(state, ops, kw["algo"])

    def test_capgan_dp_x_tp(self):
        """Composed DP x TP: the Megatron column sharding MAY all-gather
        activations/columns between layers, but never a stacked-D leaf."""
        from cglgan_tpu.core.meshes import fed_mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh_tp = fed_mesh(8, model_shards=2, devices=devs[:8])
        cfg = FedGANConfig(algo="capgan", num_servers=1, epoch=1,
                           model_shards=2, **BASE)
        state, ops = _compile(cfg, mesh_tp)
        _assert_no_stack_gather(state, ops, "capgan dp x tp")
