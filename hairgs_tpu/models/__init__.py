from hairgs_tpu.models.gaussian import (
    GaussianParams,
    GaussianStats,
    gaussian_activations,
    gaussian_orientation,
    gaussian_render_inputs,
    GaussianModel,
)
from hairgs_tpu.models.hair import HairParams, HairModel, hair_render_inputs
