"""Batched small-matrix linear algebra tuned for TPU.

XLA lowers ``lu``/``inv``/``slogdet`` on TPU to a LinAlg custom call that is
pathologically slow for the tiny matrices of molecular VMC (Slater matrices
are N_elec x N_elec, N <= ~50): profiling shows it consuming ~85% of a full
PsiFormer forward pass.  These routines implement partial-pivoting Gaussian
elimination with the row loop *unrolled* (N is static), so each step is a
handful of large batched vector ops on the VPU — no custom calls, no dynamic
control flow.
"""

import jax.numpy as jnp

__all__ = ['slogdet_small', 'inv_small']


def _pivot_swap(a, k, idx):
    """Swap row k with the abs-max row below (vectorized over the batch).

    Returns (a_swapped, swap_sign) where swap_sign is -1 where a swap
    happened.
    """
    col = a[..., :, k]
    eligible = idx >= k
    abs_col = jnp.where(eligible, jnp.abs(col), -jnp.inf)
    piv = jnp.argmax(abs_col, axis=-1)  # [...]
    onehot_k = idx == k  # [n]
    onehot_piv = idx == piv[..., None]  # [..., n]
    pivot_row = jnp.sum(jnp.where(onehot_piv[..., None], a, 0), axis=-2)
    row_k = a[..., k, :]
    a = (
        jnp.where(onehot_k[..., None], pivot_row[..., None, :], 0)
        + jnp.where(
            onehot_piv[..., None] & ~onehot_k[..., None], row_k[..., None, :], 0
        )
        + jnp.where(
            ~onehot_k[..., None] & ~onehot_piv[..., None], a, 0
        )
    )
    swap_sign = jnp.where(piv != k, -1.0, 1.0).astype(a.dtype)
    return a, swap_sign


def slogdet_small(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sign, log|det|) of [..., n, n] via unrolled pivoted elimination."""
    n = a.shape[-1]
    batch = a.shape[:-2]
    idx = jnp.arange(n)
    sign = jnp.ones(batch, a.dtype)
    logdet = jnp.zeros(batch, a.dtype)
    for k in range(n):
        a, swap_sign = _pivot_swap(a, k, idx)
        pivot = a[..., k, k]
        sign = sign * swap_sign * jnp.sign(pivot)
        logdet = logdet + jnp.log(jnp.abs(pivot))
        factors = jnp.where(
            (idx > k)[..., :], a[..., :, k] / pivot[..., None], 0.0
        )
        a = a - factors[..., :, None] * a[..., k : k + 1, :]
    return sign, logdet


def inv_small(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., n, n] via unrolled Gauss-Jordan with partial pivoting."""
    n = a.shape[-1]
    idx = jnp.arange(n)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)  # [..., n, 2n]
    for k in range(n):
        # pivot selection over the left block's column k
        col = aug[..., :, k]
        abs_col = jnp.where(idx >= k, jnp.abs(col), -jnp.inf)
        piv = jnp.argmax(abs_col, axis=-1)
        onehot_k = idx == k
        onehot_piv = idx == piv[..., None]
        pivot_row = jnp.sum(jnp.where(onehot_piv[..., None], aug, 0), axis=-2)
        row_k = aug[..., k, :]
        aug = (
            jnp.where(onehot_k[..., None], pivot_row[..., None, :], 0)
            + jnp.where(
                onehot_piv[..., None] & ~onehot_k[..., None],
                row_k[..., None, :],
                0,
            )
            + jnp.where(~onehot_k[..., None] & ~onehot_piv[..., None], aug, 0)
        )
        pivot = aug[..., k, k]
        norm_row = aug[..., k, :] / pivot[..., None]
        factors = jnp.where(~onehot_k, aug[..., :, k], 0.0)
        aug = aug - factors[..., :, None] * norm_row[..., None, :]
        aug = jnp.where(onehot_k[..., None], norm_row[..., None, :], aug)
    return aug[..., :, n:]
