"""Regression guards for the jit dispatch fast path (PERF.md round 3,
"mesh-path dispatch fix").

A mixed-commitment state carry — some leaves mesh-committed, some plain
uncommitted arrays (e.g. the int32 round counter next to committed parameter
stacks) — silently knocks jit dispatch off the C++ fast path: every chunk
call re-traces and re-lowers in Python, which measured 30-45x slower sharded
rounds before ``core.meshes.commit_tree`` closed it.  These tests pin the
two invariants that prevent the bug class from returning:

1. every algorithm's ``init_state()`` under a clients mesh returns a FULLY
   committed tree — every array leaf carries a ``NamedSharding`` and is
   committed;
2. the chunked training loop traces each chunk size exactly once — re-running
   chunks of the same length never re-traces.
"""
import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import train
from cglgan_tpu.core import meshes
from cglgan_tpu.core.config import FedGANConfig

# server-grouped algos shard the per-server client dim k = W/S over the
# 8-device clients axis, so k must divide 8 (same sizing as the driver
# dryrun: __graft_entry__.dryrun_multichip uses W = 2 * n_devices)
ALL = [("flgan", {}), ("fegan", dict(frac_workers=0.5)),
       ("mdgan", {}), ("acgan", dict(num_workers=16, num_servers=2, E=2)),
       ("cglgan", dict(num_workers=16, num_servers=2)), ("capgan", {}),
       ("mixgan", dict(num_workers=16, num_servers=2))]


def tiny_cfg(algo, **kw):
    base = dict(algo=algo, dataset="2dmg", num_workers=8, num_class=5,
                num_sample=200, iid=1, batch_size=32, num_communication=4,
                num_plt=2, epoch=1)
    base.update(kw)
    return FedGANConfig(**base)


class TestFullCommitment:
    @pytest.mark.parametrize("algo,kw", ALL)
    def test_state_fully_committed_on_mesh(self, algo, kw):
        mesh = meshes.client_mesh(8)
        r = build_runner(tiny_cfg(algo, **kw), mesh=mesh)
        state = r.init_state()
        leaves, _ = jax.tree.flatten(state)
        assert leaves, f"{algo}: empty state"
        for i, x in enumerate(leaves):
            if x is None or not hasattr(x, "sharding"):
                continue
            assert isinstance(x.sharding, NamedSharding), (
                f"{algo}: state leaf {i} ({x.shape} {x.dtype}) lacks a "
                f"NamedSharding — commit_tree missed it: {x.sharding}")
            assert x.committed, (
                f"{algo}: state leaf {i} ({x.shape} {x.dtype}) is "
                f"uncommitted — this re-opens the re-trace-per-call bug")


class TestNoRetrace:
    @pytest.mark.parametrize("algo", ["flgan", "cglgan"])
    def test_chunked_train_traces_once(self, algo):
        kw = dict(num_workers=16, num_servers=2) if algo == "cglgan" else {}
        mesh = meshes.client_mesh(8)
        r = build_runner(tiny_cfg(algo, **kw), mesh=mesh)

        traces = []

        def counted_round(state):
            traces.append(1)   # side effect fires once per TRACE, not per call
            return r.round_fn(state)

        counted = r._replace(round_fn=counted_round)
        # epoch=1 batch-sweep => piece = min(eval_every=2, 10000) = 2: the
        # loop runs two ticks x one chunk of length 2 each -> ONE distinct
        # chunk size -> exactly one trace.
        out = train(counted, rounds=4, eval_every=2, eval_n=100,
                    evaluator=False)
        assert len(out["history"]) == 2
        assert len(traces) == 1, (
            f"{algo}: round_fn traced {len(traces)}x across the chunked "
            f"loop; chunks of one length must compile exactly once "
            f"(mixed-commitment carries re-trace every call)")

    def test_rerun_same_chunk_no_retrace_unsharded(self):
        # the single-chip (mesh=None) path must also reuse its compilation
        r = build_runner(tiny_cfg("mdgan"))
        traces = []

        def counted_round(state):
            traces.append(1)
            return r.round_fn(state)

        counted = r._replace(round_fn=counted_round)
        s = counted.init_state()
        from cglgan_tpu.algos.runner import scan_rounds
        run = scan_rounds(counted.round_fn, 2)
        s, _ = run(s)
        s, _ = run(s)
        s, _ = run(s)
        assert len(traces) == 1
        assert int(s.t) == 6
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(s) if l is not None)
