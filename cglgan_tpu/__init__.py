"""cglgan_tpu — a TPU-native federated-GAN framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
NetworkCommunication/CGL-GAN reference codebase (five distributed-GAN
training algorithms — AC-GAN, FL-GAN, MD-GAN, FeGAN and CGL/CAP-GAN with
the Mix-G module — on a synthetic 2-D Gaussian Mixture and MNIST /
Fashion-MNIST under Non-IID partitions).

Design principles (TPU-first, not a port):

* Every federated node's model lives as one slice of a *stacked* parameter
  pytree (leading axis = clients or servers).  Per-client training steps are
  ``jax.vmap``-ed so that W tiny matmuls become one large batched matmul on
  the MXU.
* The reference's thread-and-queue "network" (see reference
  ``CGLGAN/MNIST/main.py:79-394``) collapses into XLA collectives over a
  ``jax.sharding.Mesh``: FedAvg is a weighted ``psum``, MD-GAN's D-swap is a
  ``ppermute`` ring shift, CAP-GAN's every-E-rounds neighbour D-share is an
  all-gather + mean.
* Whole communication rounds are compiled once and iterated with
  ``jax.lax.scan`` between evaluation ticks — no per-round Python dispatch.
"""

__version__ = "0.1.0"
