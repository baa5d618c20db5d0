from cglgan_tpu.evalx.hist2d import kl_and_distribution_score, hist2d
