"""A first-class ``slogdet`` primitive.

Two reasons to own this primitive instead of using ``jnp.linalg.slogdet``:

1. the forward-Laplacian engine (:mod:`deepqmc_tpu.fwdlap`) needs an analytic
   second-order rule for the log-determinant —
   lap log|det A| = tr(A^-1 L_A) - sum_i tr((A^-1 J_i)^2) —
   which is registered against this primitive rather than against the LU
   internals that ``jnp.linalg.slogdet`` would trace into;
2. it is the natural seam for a future Pallas batched small-matrix LU kernel
   on TPU (determinants in molecular VMC are tiny, N <= ~50).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

from .linalg_small import (
    inv_flat_small,
    inv_small,
    slogdet_flat_small,
    slogdet_small,
)

__all__ = ['slogdet', 'slogdet_flat', 'unflatten_dets']

# above this size the unrolled elimination stops paying off
SMALL_N = 64

slogdet_p = jex_core.Primitive('deepqmc_slogdet')
slogdet_p.multiple_results = True


def slogdet(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sign, log|det|) of the trailing square dimensions of ``a``."""
    sign, logdet = slogdet_p.bind(a)
    return sign, logdet


def _inv(a):
    return inv_small(a) if a.shape[-1] <= SMALL_N else jnp.linalg.inv(a)


def _impl(a):
    if a.shape[-1] <= SMALL_N:
        return slogdet_small(a)
    sign, logdet = jnp.linalg.slogdet(a)
    return sign, logdet


def _abstract_eval(a):
    assert a.ndim >= 2 and a.shape[-1] == a.shape[-2], a.shape
    out = jax.core.ShapedArray(a.shape[:-2], a.dtype)
    return out, out


def _batch_rule(args, dims):
    (a,) = args
    (d,) = dims
    a = jnp.moveaxis(a, d, 0)
    return slogdet_p.bind(a), (0, 0)


def _jvp_rule(primals, tangents):
    (a,) = primals
    (da,) = tangents
    sign, logdet = slogdet_p.bind(a)
    inv_a = _inv(a)
    if isinstance(da, ad.Zero):
        d_logdet = ad.Zero.from_primal_value(logdet)
    else:
        # d log|det A| = tr(A^-1 dA); linear in dA so reverse-mode transposes
        d_logdet = jnp.einsum('...ij,...ji->...', inv_a, da)
    d_sign = ad.Zero.from_primal_value(sign)
    return (sign, logdet), (d_sign, d_logdet)


slogdet_p.def_impl(_impl)
slogdet_p.def_abstract_eval(_abstract_eval)
batching.primitive_batchers[slogdet_p] = _batch_rule
ad.primitive_jvps[slogdet_p] = _jvp_rule
mlir.register_lowering(
    slogdet_p, mlir.lower_fun(_impl, multiple_results=True)
)


# --- flat-determinant variant -------------------------------------------------
#
# The ansatz assembles its Slater matrices in a "flat" layout
# [..., n_el, n_det * n] (determinant-major columns): on TPU the (8, 128)
# tiling pads a [n_det, n, n] tensor's minor (n, n) pair catastrophically
# for molecular n ~ 10 (10 lanes -> 128), while the flat layout's minor
# pair (n_el, n_det * n) stays near-dense.  ``slogdet_flat`` is the seam
# that lets every upstream orbital/backflow/envelope op materialize ONLY
# flat tensors; the unpack into per-determinant square matrices happens
# here (and, under the forward-Laplacian engine, inside the fused Pallas
# kernel — see fwdlap._slogdet_flat_rule / ops/fl_slogdet.py).

slogdet_flat_p = jex_core.Primitive('deepqmc_slogdet_flat')
slogdet_flat_p.multiple_results = True


def unflatten_dets(a_flat: jax.Array, n_det: int) -> jax.Array:
    """[..., n, n_det * n] (det-major columns) -> [..., n_det, n, n]."""
    n = a_flat.shape[-2]
    parts = a_flat.reshape(*a_flat.shape[:-1], n_det, -1)
    return jnp.moveaxis(parts, -2, -3)


def slogdet_flat(a_flat: jax.Array, n_det: int) -> tuple[jax.Array, jax.Array]:
    """Per-determinant (sign, log|det|) of a flat orbital matrix.

    ``a_flat`` has shape [..., n, n_det * n] with determinant-major columns
    (column d * n + j is orbital j of determinant d); returns arrays of
    shape [..., n_det].
    """
    sign, logdet = slogdet_flat_p.bind(a_flat, n_det=n_det)
    return sign, logdet


def _flat_impl(a_flat, *, n_det):
    if a_flat.shape[-2] <= SMALL_N:
        # elimination directly on the flat layout: never materializes the
        # tile-padded [..., D, n, n] tensor (~12.8x HBM waste at n ~ 10)
        return slogdet_flat_small(a_flat, n_det)
    return _impl(unflatten_dets(a_flat, n_det))


def _flat_transpose(x_flat, n_det):
    """Per-det transpose in the flat layout: [..., n, D*n] -> [..., n, D*n]."""
    n = x_flat.shape[-2]
    parts = x_flat.reshape(*x_flat.shape[:-1], n_det, n)
    parts = jnp.swapaxes(parts, -1, -3)
    return parts.reshape(*x_flat.shape[:-2], n, n_det * n)


def _flat_abstract_eval(a_flat, *, n_det):
    assert a_flat.ndim >= 2 and a_flat.shape[-1] == n_det * a_flat.shape[-2], (
        a_flat.shape,
        n_det,
    )
    out = jax.core.ShapedArray((*a_flat.shape[:-2], n_det), a_flat.dtype)
    return out, out


def _flat_batch_rule(args, dims, *, n_det):
    (a,) = args
    (d,) = dims
    a = jnp.moveaxis(a, d, 0)
    return slogdet_flat_p.bind(a, n_det=n_det), (0, 0)


def _flat_jvp_rule(primals, tangents, *, n_det):
    (a_flat,) = primals
    (da,) = tangents
    sign, logdet = slogdet_flat_p.bind(a_flat, n_det=n_det)
    if isinstance(da, ad.Zero):
        d_logdet = ad.Zero.from_primal_value(logdet)
    else:
        n = a_flat.shape[-2]
        if n <= SMALL_N:
            # d log|det A_d| = tr(A_d^-1 dA_d) entirely in the flat layout:
            # sum_ij (A_d^-T)[j, i] dA_d[j, i], det-block lane sums via a
            # [D*n, D] summation matrix (one small GEMM)
            invt = _flat_transpose(inv_flat_small(a_flat, n_det), n_det)
            s = (invt * da).sum(axis=-2)  # [..., D*n]
            t1 = (
                jnp.arange(n_det * n)[:, None] // n == jnp.arange(n_det)[None]
            ).astype(a_flat.dtype)
            d_logdet = s @ t1
        else:
            inv_a = _inv(unflatten_dets(a_flat, n_det))  # [..., D, n, n]
            da_unf = da.reshape(*da.shape[:-1], n_det, -1)
            d_logdet = jnp.einsum('...dij,...jdi->...d', inv_a, da_unf)
    d_sign = ad.Zero.from_primal_value(sign)
    return (sign, logdet), (d_sign, d_logdet)


slogdet_flat_p.def_impl(_flat_impl)
slogdet_flat_p.def_abstract_eval(_flat_abstract_eval)
batching.primitive_batchers[slogdet_flat_p] = _flat_batch_rule
ad.primitive_jvps[slogdet_flat_p] = _flat_jvp_rule
mlir.register_lowering(
    slogdet_flat_p, mlir.lower_fun(_flat_impl, multiple_results=True)
)
