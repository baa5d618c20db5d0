from cglgan_tpu.models import nn
from cglgan_tpu.models.zoo import (
    build_generator, build_discriminator, GEN_SPECS, DISC_SPECS,
)
