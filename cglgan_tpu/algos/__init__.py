from cglgan_tpu.algos.registry import build_runner
