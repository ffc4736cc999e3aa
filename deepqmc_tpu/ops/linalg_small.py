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

__all__ = ['slogdet_small', 'inv_small', 'slogdet_flat_small', 'inv_flat_small']


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


# --- flat det-major layout --------------------------------------------------
#
# On TPU a [..., D, n, n] batch of Slater matrices pads its minor (n, n)
# pair to (8k, 128) tiles — ~12.8x wasted HBM traffic for molecular n ~ 10,
# and the unrolled elimination above re-materializes that tensor every
# step.  These variants run the SAME pivoted elimination directly on the
# ansatz's flat layout [..., n, D * n] (determinant-major columns, see
# ops/slogdet.py), whose minor pair stays near-dense: per-det column
# extraction is a strided lane slice, per-det masks are lane-expanded by a
# broadcast over the trailing det-block axis, and row swaps become the same
# three-way select with per-lane (det-dependent) one-hot masks.


def _rep_lanes(x, n):
    """[..., m, D] per-det values -> [..., m, D * n] lane-expanded."""
    D = x.shape[-1]
    return jnp.broadcast_to(
        x[..., None], (*x.shape, n)
    ).reshape(*x.shape[:-1], D * n)


def _pivot_swap_flat(a, k, idx, n):
    """Per-det partial-pivot row swap on the flat [..., n, D*n] layout."""
    colk = jnp.abs(a[..., :, k::n])  # [..., n, D]
    eligible = (idx >= k)[..., :, None]
    absc = jnp.where(eligible, colk, -jnp.inf)
    piv = jnp.argmax(absc, axis=-2)  # [..., D]
    onehot_k = (idx == k)[..., :, None]  # [n, 1]
    onehot_piv = idx[..., :, None] == piv[..., None, :]  # [..., n, D]
    onehot_piv_l = _rep_lanes(onehot_piv, n)  # [..., n, D*n]
    # per-det pivot row, flattened over lanes
    pivot_row = jnp.sum(jnp.where(onehot_piv_l, a, 0), axis=-2)  # [..., D*n]
    row_k = a[..., k, :]  # [..., D*n]
    a = (
        jnp.where(onehot_k, pivot_row[..., None, :], 0)
        + jnp.where(onehot_piv_l & ~onehot_k, row_k[..., None, :], 0)
        + jnp.where(~onehot_k & ~onehot_piv_l, a, 0)
    )
    swap_sign = jnp.where(piv != k, -1.0, 1.0).astype(a.dtype)  # [..., D]
    return a, swap_sign


def slogdet_flat_small(
    a_flat: jnp.ndarray, n_det: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-det (sign, log|det|) of flat [..., n, D*n] det-major matrices."""
    n = a_flat.shape[-2]
    assert a_flat.shape[-1] == n_det * n, (a_flat.shape, n_det)
    idx = jnp.arange(n)
    batch = a_flat.shape[:-2]
    sign = jnp.ones((*batch, n_det), a_flat.dtype)
    logdet = jnp.zeros((*batch, n_det), a_flat.dtype)
    a = a_flat
    for k in range(n):
        a, swap_sign = _pivot_swap_flat(a, k, idx, n)
        pivot = a[..., k, k::n]  # [..., D]
        sign = sign * swap_sign * jnp.sign(pivot)
        logdet = logdet + jnp.log(jnp.abs(pivot))
        colk = a[..., :, k::n]  # [..., n, D]
        factors = jnp.where((idx > k)[..., :, None], colk / pivot[..., None, :], 0.0)
        a = a - _rep_lanes(factors, n) * a[..., k : k + 1, :]
    return sign, logdet


def inv_flat_small(a_flat: jnp.ndarray, n_det: int) -> jnp.ndarray:
    """Per-det inverse in the flat layout: [..., n, D*n] -> [..., n, D*n].

    Output block ``d`` holds ``A_d^{-1}`` (rows i, lanes d*n+j), via
    Gauss-Jordan on a per-det augmented [A_d | I] flat layout of block
    width 2n.
    """
    n = a_flat.shape[-2]
    assert a_flat.shape[-1] == n_det * n, (a_flat.shape, n_det)
    idx = jnp.arange(n)
    w = 2 * n
    # interleave [A_d | I_d] blocks: lanes d*w+j = A_d col j, d*w+n+j = I col j
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=a_flat.dtype)[:, None, :],
        (*a_flat.shape[:-1], n_det, n),
    )
    a_parts = a_flat.reshape(*a_flat.shape[:-1], n_det, n)
    aug = jnp.concatenate([a_parts, eye], axis=-1)  # [..., n, D, 2n]
    aug = aug.reshape(*a_flat.shape[:-1], n_det * w)
    for k in range(n):
        aug, _ = _pivot_swap_flat(aug, k, idx, w)
        pivot = aug[..., k, k::w]  # [..., D]
        norm_row = aug[..., k, :] / _rep_lanes(pivot, w)  # [..., D*2n]
        colk = aug[..., :, k::w]  # [..., n, D]
        factors = jnp.where((idx == k)[..., :, None], 0.0, colk)
        aug = aug - _rep_lanes(factors, w) * norm_row[..., None, :]
        aug = jnp.where(
            (idx == k)[..., :, None], norm_row[..., None, :], aug
        )
    inv_parts = aug.reshape(*a_flat.shape[:-1], n_det, w)[..., n:]
    return inv_parts.reshape(*a_flat.shape[:-1], n_det * n)


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
