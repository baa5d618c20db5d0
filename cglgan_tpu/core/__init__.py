from cglgan_tpu.core.config import FedGANConfig, ALGOS
from cglgan_tpu.core import prng
from cglgan_tpu.core import meshes
