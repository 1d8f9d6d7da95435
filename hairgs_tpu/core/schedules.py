"""Learning-rate / threshold schedules.

Parity target: reference utils/general.py:35-68 (get_expon_lr_func, copied
from Plenoxels/JaxNeRF). Implemented as a pure function usable both inside jit
(jnp step) and on the host (python float step).
"""

import jax.numpy as jnp


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """Log-linearly interpolated (exponential) decay with optional warm-up.

    Returns 0 when both endpoints are 0 (parameter disabled).
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    # reference returns 0 for negative steps
    return jnp.where(step < 0, 0.0, lr)


def make_expon_lr_fn(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    def fn(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps)

    return fn
