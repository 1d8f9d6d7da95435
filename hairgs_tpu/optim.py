"""Per-group Adam over capacity-padded parameter arenas.

Matches torch.optim.Adam semantics used by the reference (eps=1e-15,
betas (0.9, 0.999); scene/gaussian_model.py:250, hair_gaussian_model.py:246)
with per-parameter-group learning rates. Implemented by hand (not optax)
because topology operations need direct row-level surgery on the moment
buffers — the reference does this via optimizer-state rebuild
(gaussian_model.py:421-507); here the moments live in the same padded arrays
as the parameters, so "surgery" is a masked permutation/zeroing done host-side
at topology boundaries.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # pytree like params
    nu: Any
    step: jnp.ndarray  # () int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), step=jnp.zeros((), jnp.int32))


def adam_step(params, grads, state: AdamState, lr_tree, b1=0.9, b2=0.999, eps=1e-15):
    """One Adam update; lr_tree has the same structure as params with scalar
    leaves (traced values allowed — the xyz LR is scheduled per step)."""
    step = state.step + 1
    c1 = 1.0 - jnp.power(b1, step.astype(jnp.float32))
    c2 = 1.0 - jnp.power(b2, step.astype(jnp.float32))

    new_mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, grads, state.mu)
    new_nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, grads, state.nu)
    new_params = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params,
        new_mu,
        new_nu,
        lr_tree,
    )
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)
