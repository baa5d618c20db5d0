from cglgan_tpu.utils.logging import RunDir
from cglgan_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
