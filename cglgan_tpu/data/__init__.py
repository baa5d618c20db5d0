from cglgan_tpu.data.gmm import gmm_dataset
from cglgan_tpu.data.partition import partition, Partition
from cglgan_tpu.data.mnist import load_image_dataset
