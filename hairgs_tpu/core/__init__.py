from hairgs_tpu.core.transforms import (
    build_rotation,
    build_scaling_rotation,
    strip_symmetric,
    rotation_between_vectors,
    matrix_to_quaternion,
)
from hairgs_tpu.core.sh import eval_sh, RGB2SH, SH2RGB, SH_C0
from hairgs_tpu.core.maths import (
    inverse_sigmoid,
    pval_to_dist_to_scale_factor,
    dist_to_scale_factor_to_pval,
)
from hairgs_tpu.core.schedules import expon_lr
from hairgs_tpu.core.camera import (
    Camera,
    make_camera,
    world_to_view,
    projection_matrix,
    fov2focal,
    focal2fov,
)
