from cglgan_tpu.fed.collectives import (
    fedavg_tree, weighted_avg_tree, sigma_mix, ring_shift_tree,
    neighbor_share_tree,
)
from cglgan_tpu.fed.sampling import fegan_scores, init_groups
from cglgan_tpu.fed.topology import block_assignment
