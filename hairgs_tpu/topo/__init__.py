from hairgs_tpu.topo.strands import (
    StrandsInfo,
    compute_strands_info,
    update_strand_root,
    smooth_pair_indices,
)
from hairgs_tpu.topo.graph_ops import (
    hair_densification,
    hair_merging,
    hair_growing,
    hair_reset_opacity,
    clean_hair_gaussians,
)
from hairgs_tpu.topo.merge import compute_endpoint_pair_to_merge, stage2_merge_loop
