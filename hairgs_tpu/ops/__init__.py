from hairgs_tpu.ops.knn import mean_sq_dist_3nn, knn
from hairgs_tpu.ops.ssim import ssim
