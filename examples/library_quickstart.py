"""Programmatic (non-CLI) use of cglgan_tpu — the library surface.

Everything `tpufed run` does is available as plain functions: build a
config, build a runner (config -> data partition -> stacked models ->
one jitted round), then either call `train()` for the managed loop or
drive `round_fn` yourself with `scan_rounds`.

Run on CPU (no TPU needed; ~30 s):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/library_quickstart.py

Reference equivalent: editing the module-level hyperparameters and
`__main__` loops of e.g. CGLGAN/2DMG/main.py — here it is a frozen
dataclass and two function calls.
"""
import jax

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import scan_rounds, train
from cglgan_tpu.core.config import FedGANConfig

# ---------------------------------------------------------------- 1. config
# Every reference knob (SURVEY §2 C1-C19) is a FedGANConfig field; defaults
# match the reference scripts.  iid=2 = fully non-IID (one mode per worker).
cfg = FedGANConfig(algo="cglgan", dataset="2dmg", num_workers=20,
                   num_servers=5, iid=2, batch_size=100,
                   num_communication=400, num_plt=100, seed=2021)

# ------------------------------------------------------- 2. managed training
# build_runner loads + partitions the data and returns the uniform Runner
# contract: init_state / round_fn (one pure jitted federated round) / sample.
runner = build_runner(cfg)
out = train(runner)          # evaluates every cfg.num_plt rounds, like the
                             # reference painter cadence
for tick in out["history"]:
    print(f"round {tick['round']:4d}  kl={tick['kl_score']:.3f}  "
          f"coverage={tick['mode_coverage']:.2f}  "
          f"{tick['rounds_per_s']:.0f} r/s")

# ------------------------------------------------------------- 3. custom loop
# The round function is an ordinary jittable state -> (state, metrics)
# transition: scan it, jit it, shard it, or compose it with your own code.
state = out["state"]
run100 = scan_rounds(runner.round_fn, 100)   # 100 rounds = 1 device program
state, metrics = run100(state)
print("custom loop d_loss:", float(metrics["d_loss"]))

# `sample` draws from the trained generator(s); for multi-path CGL-GAN the
# head routing matches each client's local mixture (zoo.py heads vmapped).
samples = runner.sample(state, 256)
print("samples:", samples.shape, samples.dtype)

# ------------------------------------------------------------- 4. serving
# Package the trained generator as a portable StableHLO artifact: weights
# baked in, callable as z -> samples in any jax process with no model code
# (`tpufed export` is the CLI spelling; utils/export.py).
import tempfile

from cglgan_tpu.utils.export import (export_generator, load_generator,
                                     save_generator)

with tempfile.TemporaryDirectory() as td:
    art = f"{td}/generator.stablehlo"
    save_generator(export_generator(runner, state, n=50), art)
    serve, manifest = load_generator(art)
    z = jax.random.normal(jax.random.key(0), (50, cfg.latent_dim))
    print("served:", serve(z).shape, f"({manifest['bytes']} artifact bytes)")

# -------------------------------------------------------- 5. multi-chip mesh
# The same runner shards over a clients-axis Mesh — state and data shards
# split across devices, FedAvg/collectives lowered to ICI all-reduces.
# (On a multi-chip host: mesh = fed_mesh(len(jax.devices())).)
if len(jax.devices()) >= 2:
    from cglgan_tpu.core.meshes import fed_mesh
    mesh = fed_mesh(2)
    sharded = build_runner(cfg, mesh=mesh)
    s2, m2 = jax.jit(sharded.round_fn)(sharded.init_state())
    print("sharded round ok:", {k: round(float(v), 4) for k, v in m2.items()})
