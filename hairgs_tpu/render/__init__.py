from hairgs_tpu.render.renderer import render, RasterConfig
from hairgs_tpu.render.composite import composite_naive
