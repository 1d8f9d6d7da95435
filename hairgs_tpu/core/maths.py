"""Small math helpers shared across the framework."""

import math
import statistics

import jax.numpy as jnp

MIN_VAL = 1e-7  # reference GaussianModel.min_val (scene/gaussian_model.py:34)


def inverse_sigmoid(x):
    """log(x / (1-x)); reference utils/general.py:22."""
    return jnp.log(x / (1 - x))


def safe_norm(x, axis=-1, keepdims=False, eps=1e-24):
    """L2 norm with a zero subgradient at 0 (torch.norm semantics).

    jnp.linalg.norm's gradient at the origin is NaN, which poisons losses via
    0*NaN even where the result is masked out; sqrt(sum(x^2)+eps) has zero
    gradient there instead — matching what torch gives the reference.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def normal_icdf(q):
    """Standard normal inverse CDF (pure host-side stdlib: this runs at
    class-definition time in models/gaussian.py, and a jax op here would
    force backend init on *import* — which dies whenever the TPU tunnel is
    transiently unavailable, as it was for round 3's bench capture)."""
    x = statistics.NormalDist().inv_cdf(q)
    # stdlib uses Acklam's rational approximation (~1e-9 abs err); two Newton
    # steps on the double-precision erf CDF restore full float64 accuracy.
    # Documented deviation: the reference's 0.5102133812190369
    # (scene/gaussian_model.py:696-704) is a float32-erfinv artifact of
    # torch; the true float64 value 0.510213456924654 differs by 1.5e-7
    # relative — immaterial for widths, and parity tests use rtol 1e-6.
    for _ in range(2):
        cdf = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
        pdf = math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
        x -= (cdf - q) / pdf
    return x


def pval_to_dist_to_scale_factor(pval: float) -> float:
    """dist_to_scale_factor = 1 / icdf(1 - pval/2).

    Reference scene/gaussian_model.py:696-704 (set_pval); pval=0.05 gives
    0.5102133812190369.
    """
    return 1.0 / normal_icdf(1.0 - pval / 2.0)


def dist_to_scale_factor_to_pval(factor: float) -> float:
    """Inverse of the above; reference scene/gaussian_model.py:686-694."""
    # p = 2 * (1 - cdf(1/factor))
    x = 1.0 / factor
    cdf = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    return 2.0 * (1.0 - cdf)
