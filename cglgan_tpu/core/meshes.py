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
