"""Small array/pytree helpers used across the framework.

Functional parity with the reference's utils layer
(/root/reference/src/deepqmc/utils.py), re-implemented for TPU/XLA:
e.g. :func:`multinomial_resampling` uses a cumulative-sum + ``searchsorted``
formulation (O(n log n)) instead of the reference's O(n^2) dense
upper-triangular matrix (utils.py:29-35), which would materialize an
``n_walkers x n_walkers`` array in HBM.
"""

import os
from collections.abc import Sequence
from contextlib import nullcontext
from typing import Optional, TypeVar, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .types import Stats

__all__ = ()

T = TypeVar('T')


def sampling_precision_ctx():
    """Matmul-precision context for pure-forward MCMC sampling.

    The local-energy path must stay at 'highest' (true f32: the forward
    Laplacian amplifies rounding into the kinetic energy), but the
    Metropolis/Langevin forwards only feed log|psi| differences into an
    accept/reject, where the 3-pass-bf16 'high' mode's ~1e-6 relative error
    is far below the O(0.1-1) log-ratio scale.  'high' roughly halves the
    MXU time of the decorrelation sweeps on TPU.  Override with
    DEEPQMC_TPU_SAMPLING_PRECISION=(highest|high|default) — jax matmul
    precision labels, so 'default' is single-pass bf16 (a further 1e-3-level
    candidate, convergence-gated like 'high') — or 'inherit' to leave the
    global 'highest' pin untouched.  CPU ignores matmul precision entirely,
    so golden tests are unaffected.
    """
    label = os.environ.get('DEEPQMC_TPU_SAMPLING_PRECISION', 'high')
    if label == 'inherit':
        return nullcontext()
    return jax.default_matmul_precision(label)


def grad_precision_ctx():
    """Matmul-precision context for the VMC-gradient vjp.

    The log-psi pullback (one forward + two backwards of every dense/
    attention layer per step) feeds only the stochastic gradient estimator
    and the KFAC curvature taps — quantities with O(1/sqrt(walkers))
    sampling noise, far above the 3-pass-bf16 'high' mode's ~1e-6 rounding.
    The local-energy path is unaffected (it stays 'highest').  Override with
    DEEPQMC_TPU_GRAD_PRECISION=(highest|high|default) or 'inherit'.
    Default 'high', promoted via the LiH convergence A/B (r4_all variant,
    2026-08-20, within 0.5 combined sigma of the full-precision-gradient
    control at matched budget; docs/evidence/ab_lih_convergence.jsonl).
    CPU ignores matmul precision, so the f64 golden lane is unaffected.
    """
    label = os.environ.get('DEEPQMC_TPU_GRAD_PRECISION', 'high')
    if label == 'inherit':
        return nullcontext()
    if 'DEEPQMC_TPU_GRAD_PRECISION' not in os.environ and not getattr(
        grad_precision_ctx, 'logged', False
    ):
        # reduced precision lands as a DEFAULT (advisor r4): announce once
        grad_precision_ctx.logged = True
        import logging

        logging.getLogger(__name__).info(
            "VMC-gradient/KFAC-tap pullback runs at matmul precision 'high' "
            '(3-pass bf16) by default; DEEPQMC_TPU_GRAD_PRECISION=inherit '
            'restores the global highest-precision pin'
        )
    return jax.default_matmul_precision(label)


def flatten(x: jax.Array, start_axis: int = 0) -> jax.Array:
    return x.reshape(*x.shape[:start_axis], -1)


def unflatten(x: jax.Array, axis: int, shape: Sequence[int]) -> jax.Array:
    if axis < 0:
        axis = x.ndim + axis
    return x.reshape(*x.shape[:axis], *shape, *x.shape[axis + 1 :])


def triu_flat(x: jax.Array) -> jax.Array:
    i, j = jnp.triu_indices(x.shape[-1], 1)
    return x[..., i, j]


def multinomial_resampling(
    rng: jax.Array, weights: jax.Array, n_samples: Optional[int] = None
) -> jax.Array:
    """Sample walker indices proportionally to ``weights``.

    Memory-light equivalent of reference utils.py:29-35.
    """
    n = weights.shape[0]
    n_samples = n_samples or n
    cum = jnp.cumsum(weights)
    cum = cum / cum[-1]
    u = jax.random.uniform(rng, (n_samples,))
    return jnp.clip(jnp.searchsorted(cum, u, side='right'), 0, n - 1)


def factorial2(n) -> jax.Array:
    n = jnp.asarray(n)
    gamma = jnp.exp(gammaln(n / 2 + 1))
    factor = jnp.where(
        n % 2, jnp.power(2.0, n / 2 + 0.5) / jnp.sqrt(jnp.pi), jnp.power(2.0, n / 2)
    )
    return factor * gamma


def masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    x = jnp.where(mask, x, 0)
    return x.sum(axis=axis) / jnp.sum(mask, axis=axis)


def norm(rs: jax.Array, safe: bool = False, axis: int = -1) -> jax.Array:
    """Euclidean norm; ``safe`` adds an epsilon so the gradient at 0 is finite."""
    eps = jnp.finfo(rs.dtype).eps
    if safe:
        return jnp.sqrt(eps + (rs * rs).sum(axis=axis))
    return jnp.linalg.norm(rs, axis=axis)


def tree_norm(x) -> jax.Array:
    return jax.tree_util.tree_reduce(lambda acc, v: acc + jnp.linalg.norm(v), x, 0)


def tree_stack(trees: list[T]) -> T:
    return jax.tree_util.tree_map(lambda *v: jnp.stack(v), *trees)


def tree_unstack(tree: T) -> list[T]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [treedef.unflatten(leaf) for leaf in zip(*leaves)]


def tree_any(x) -> bool:
    return jax.tree_util.tree_reduce(lambda acc, leaf: acc or bool(leaf), x, False)


def split_dict(dct: dict, cond) -> tuple[dict, dict]:
    included, excluded = {}, {}
    for k, v in dct.items():
        (included if cond(k) else excluded)[k] = v
    return included, excluded


def InverseSchedule(init_value, decay_rate):
    """lr(n) = init / (1 + n / decay) (reference utils.py:91-92)."""
    return lambda n: init_value / (1 + n / decay_rate)


def ConstantSchedule(value):
    return lambda n: value


def argmax_random_choice(rng: jax.Array, x: jax.Array) -> jax.Array:
    logits = jnp.where(x == x.max(), 0.0, -jnp.inf)
    return jax.random.categorical(rng, logits, shape=())


def log_squeeze(x: jax.Array) -> jax.Array:
    """Soft, sign-preserving log-like squashing (reference utils.py:171-173)."""
    sgn, x = jnp.sign(x), jnp.abs(x)
    return sgn * jnp.log1p((x + x**2 / 2 + x**3) / (1 + x**2))


def weighted_std(
    x: jax.Array, weights: jax.Array, axis: Union[int, Sequence[int], None] = None
) -> jax.Array:
    mean = jnp.average(x, axis=axis, weights=weights, keepdims=True)
    variance = jnp.average((x - mean) ** 2, axis=axis, weights=weights)
    return jnp.sqrt(variance)


def filter_dict(x, keys_whitelist: Optional[list[str]]) -> dict:
    if keys_whitelist is None:
        return {}
    return {k: v for k, v in x.items() if any(white in k for white in keys_whitelist)}


def flatten_dict(dictionary: dict, parent_key: str = '', separator: str = '/') -> dict:
    items: list = []
    for key, value in dictionary.items():
        new_key = parent_key + separator + key if parent_key else key
        if isinstance(value, dict):
            items.extend(flatten_dict(value, new_key, separator=separator).items())
        else:
            items.append((new_key, value))
    return dict(items)


def segment_nanmean(data, segment_ids, num_segments) -> jax.Array:
    mask = ~jnp.isnan(data)
    counts = jnp.bincount(
        jnp.where(mask, segment_ids, num_segments), length=num_segments
    )
    total = jax.ops.segment_sum(jnp.where(mask, data, 0), segment_ids, num_segments)
    return total / counts


def segment_nanstd(data, segment_ids, num_segments) -> jax.Array:
    mask = ~jnp.isnan(data)
    counts = jnp.bincount(
        jnp.where(mask, segment_ids, num_segments), length=num_segments
    )
    mean = segment_nanmean(data, segment_ids, num_segments)
    sq = jnp.where(mask, (mean[segment_ids] - data) ** 2, 0)
    return jnp.sqrt(jax.ops.segment_sum(sq, segment_ids, num_segments) / counts)


def per_mol_stats(
    n_mols: int,
    data: jax.Array,
    mol_idx: jax.Array,
    prefix: str,
    mean_only: bool = False,
) -> Union[jax.Array, Stats]:
    mean = segment_nanmean(data, mol_idx, n_mols)
    if mean_only:
        return mean
    mask = ~jnp.isnan(data)
    return {
        f'{prefix}/mean': mean,
        f'{prefix}/std': segment_nanstd(data, mol_idx, n_mols),
        f'{prefix}/max': jax.ops.segment_max(
            jnp.where(mask, data, -jnp.inf), mol_idx, n_mols
        ),
        f'{prefix}/min': jax.ops.segment_min(
            jnp.where(mask, data, jnp.inf), mol_idx, n_mols
        ),
    }


def permute_matrix(x: jax.Array, idxs: jax.Array) -> jax.Array:
    return x[idxs][:, idxs]


def better_where(condition, true_val, false_val):
    """``where`` broadcasting the condition over trailing dims of the values."""
    condition = jnp.expand_dims(
        condition, tuple(range(condition.ndim, true_val.ndim))
    )
    return jnp.where(condition, true_val, false_val)
