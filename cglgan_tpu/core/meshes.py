"""Device-mesh construction for simulated federation.

The federation axes are logical: ``clients`` indexes the stacked
discriminators (one per federated worker) and ``servers`` indexes the stacked
generators.  On hardware, the ``clients`` axis is sharded across TPU chips so
per-client D steps run in parallel and FedAvg/loss-aggregation ride ICI
collectives; generators are replicated (they are KB-sized).

The reference's equivalent layer is a set of bounded ``queue.Queue`` channels
between Python threads (CGLGAN/MNIST/main.py:120-133); there is nothing to
port — the queue topology *is* the mesh here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CLIENTS = "clients"
MODEL = "model"


def client_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D mesh over the ``clients`` axis.

    ``n_devices`` defaults to all local devices.  Client count need not equal
    device count — stacked client state is sharded over the axis, so each
    device holds ``num_workers / n_devices`` client replicas.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CLIENTS,))


def fed_mesh(n_devices: Optional[int] = None, model_shards: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (clients, model) mesh: data parallelism over per-client state on the
    first axis, optional tensor parallelism for large generators on the
    second (SURVEY.md §2.2).  ``model_shards == 1`` reduces to the 1-D
    clients mesh."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_shards <= 1:
        return Mesh(np.asarray(devices), (CLIENTS,))
    if len(devices) % model_shards != 0:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"model_shards={model_shards}")
    grid = np.asarray(devices).reshape(-1, model_shards)
    return Mesh(grid, (CLIENTS, MODEL))


def model_shards_of(mesh: Optional[Mesh]) -> int:
    if mesh is None or MODEL not in mesh.axis_names:
        return 1
    return mesh.shape[MODEL]


def model_tp_spec(x, mesh: Mesh, lead: int = 0) -> P:
    """Megatron-style column sharding for one leaf: the last (output) dim of
    weights and the feature dim of 1-D vectors split over the ``model`` axis
    when divisible, everything else replicated.  ``lead``: number of leading
    stacked-federation axes to leave unsharded (e.g. 1 for (S, din, dout)
    server-stacked generator weights).  XLA/GSPMD inserts the all-gathers
    between column-sharded layers."""
    ms = model_shards_of(mesh)
    if ms <= 1 or x is None:
        return P()
    shape = getattr(x, "shape", ())
    if len(shape) > lead and shape[-1] % ms == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL]))
    return P()


def place_model_tp(tree, mesh: Optional[Mesh], lead: int = 0):
    """Place a (possibly server-stacked) generator pytree with Megatron
    column sharding over the ``model`` axis; identity without a mesh."""
    if mesh is None or model_shards_of(mesh) <= 1:
        return jax.tree.map(jnp.asarray, tree)

    def put(x):
        return jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, model_tp_spec(x, mesh, lead)))

    return jax.tree.map(put, tree)


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a stacked-over-clients array on its leading axis."""
    return NamedSharding(mesh, P(CLIENTS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_client_tree(tree, mesh: Mesh):
    """Place every leaf of a stacked-over-clients pytree with its leading axis
    split across the mesh."""
    sh = client_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def place(tree, mesh: Optional[Mesh], spec: P):
    """device_put every leaf with NamedSharding(mesh, spec); identity when no
    mesh is given (single-chip).  ``spec`` names the stacked federation axes,
    e.g. P('clients') for (W, ...) leaves or P(None, 'clients') for
    (S, k, ...) leaves."""
    import jax.numpy as jnp
    if mesh is None:
        return jax.tree.map(jnp.asarray, tree)
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def commit_tree(tree, mesh: Optional[Mesh]):
    """Commit every leaf to the mesh — replicated P() — unless it already
    carries a NamedSharding (the clients/model-sharded leaves).

    Leaving ANY state leaf uncommitted (e.g. the int32 round counter next
    to mesh-committed parameter stacks) knocks jit dispatch off the C++
    fast path: every call re-traces and re-lowers in Python.  Measured on
    the single-chip TPU backend: a (committed array, plain scalar) scan
    carry runs 1.29 ms/iter of pure dispatch overhead vs ~0 when fully
    committed (PERF.md round 3, 'mesh-path dispatch fix')."""
    if mesh is None:
        return tree
    rep = replicated(mesh)

    def put(x):
        if x is None:
            return x
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(jnp.asarray(x), rep)

    return jax.tree.map(put, tree)
