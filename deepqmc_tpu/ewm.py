"""Adaptive exponentially-weighted-mean (EWM) energy estimator.

Reference: /root/reference/src/deepqmc/ewm.py:15-124.  Same adaptive-alpha
window recursion (alpha_new = max(1 - max_alpha, 1 / (2 + step / decay_alpha)),
weights w_i = alpha_i * prod_{j<i}(1 - alpha_j) over a ring buffer of recent
values), with two deliberate changes:

- weights are normalized to sum to one, removing the reference's warm-up bias
  (its first estimate equals x/2);
- the update is a single pure function of arrays (no Python-level branches), so
  it vmaps over the (molecule, state) grid and lives happily inside ``jit``.
"""

from math import ceil
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ()


class EWMState(NamedTuple):
    step: jax.Array
    alpha: jax.Array
    buffer: jax.Array
    mean: jax.Array
    var: jax.Array
    sqerr: jax.Array


def init_ewm(
    max_alpha: float = 0.999,
    decay_alpha: float = 10.0,
    window_size: Optional[int] = None,
):
    """Create an EWM state and its pure update function."""
    if window_size is None:
        window_size = ceil(decay_alpha * (1 / (1 - max_alpha) - 2))

    state = EWMState(
        step=jnp.array(0),
        alpha=jnp.zeros(window_size),
        buffer=jnp.zeros(window_size),
        mean=jnp.array(jnp.nan),
        var=jnp.array(jnp.nan),
        sqerr=jnp.array(jnp.nan),
    )

    def update(x, state: EWMState) -> EWMState:
        buffer = jnp.concatenate([x[None], state.buffer[:-1]])
        head = jnp.maximum(1 - max_alpha, 1 / (2 + state.step / decay_alpha))
        shifted = jnp.concatenate([head[None], state.alpha[:-1]])
        # once the window is full the alphas stay frozen
        alpha = jnp.where(state.step + 1 >= window_size, state.alpha, shifted)
        beta = jnp.concatenate([jnp.ones(1), jnp.cumprod(1 - alpha[:-1])])
        weights = alpha * beta
        weights = weights / jnp.maximum(weights.sum(), jnp.finfo(weights.dtype).tiny)
        mean = (weights * buffer).sum()
        var_terms = weights * (buffer - mean) ** 2
        return EWMState(
            step=state.step + 1,
            alpha=alpha,
            buffer=buffer,
            mean=mean,
            var=var_terms.sum(),
            sqerr=(weights * var_terms).sum(),
        )

    return state, update


def init_multi_mol_multi_state_ewm(
    shape: tuple[int, ...],
    max_alpha: float = 0.999,
    decay_alpha: float = 10.0,
    window_size: Optional[int] = None,
):
    """EWM grid over (molecule, electronic-state) indices with subset updates."""
    state, update = init_ewm(max_alpha, decay_alpha, window_size)

    vupdate = update
    for _ in range(len(shape)):
        vupdate = jax.vmap(vupdate)

    def broadcast(x):
        return jnp.broadcast_to(x, (*shape, *jnp.shape(x)))

    grid_state = jax.tree_util.tree_map(broadcast, state)

    def multi_update(
        x, state: EWMState, sub_idxs: Optional[jax.Array] = None
    ) -> EWMState:
        idx = slice(None) if sub_idxs is None else sub_idxs
        sub = jax.tree_util.tree_map(lambda leaf: leaf[idx], state)
        new_sub = vupdate(x, sub)
        return jax.tree_util.tree_map(
            lambda leaf, new: leaf.at[idx].set(new), state, new_sub
        )

    return grid_state, multi_update
