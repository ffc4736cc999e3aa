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

from .linalg_small import inv_small, slogdet_small

__all__ = ['slogdet']

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
