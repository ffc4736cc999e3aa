"""Forward-Laplacian engine: single-pass (value, Jacobian, Laplacian) propagation.

The reference computes the kinetic energy by looping 3N JVP-of-gradient
passes per sample (physics.py:101-113) — its #1 hot spot (SURVEY.md §2.2).
This module implements the forward-Laplacian method (Li et al.,
arXiv:2307.08214, see PAPERS.md): trace the per-sample ``log psi`` function
to a jaxpr once, then interpret it, carrying for every intermediate value
``v`` the triplet

    (v,  J[i, ...] = d v / d x_i,  L[...] = sum_i d^2 v / d x_i^2)

with ``x`` the flattened 3N electron coordinates.  The primal work is shared
across all 3N directions and the Jacobian channel turns into *batched*
matmuls that ride the MXU, instead of 3N sequential network passes.

Correctness strategy: a small set of closed-form rules covers the hot
primitives (elementwise table, ``mul``, ``dot_general``, the custom
``slogdet`` primitive); *piecewise-linear* primitives propagate via JVPs
(second derivative zero); every other smooth primitive falls back to a
generic exact rule built from nested JVPs, so the engine is total — any
ansatz expressible in JAX differentiates correctly, at worst less fast.
"""

import logging
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend import core as jex_core

from .ops.slogdet import slogdet_flat_p, slogdet_p

log = logging.getLogger(__name__)

__all__ = ['forward_laplacian']


class FL(NamedTuple):
    """Value with its Jacobian [n, *shape] and Laplacian [*shape] channels.

    ``jac is None`` marks a constant (zero derivative).
    """

    x: Any
    jac: Optional[Any]
    lap: Optional[Any]


class FLRowBlocks(NamedTuple):
    """FL value whose Jacobian is kept as row blocks of a concatenation.

    Produced only for ``concatenate`` eqns whose sole consumer is the
    ``slogdet`` primitive (the full-determinant ansatz concatenates up/down
    orbital blocks right before the determinant): the primal/Laplacian are
    concatenated eagerly (small), but the [K, ...]-sized Jacobian stays in
    pieces so the fused kernel can consume them without materializing the
    concatenated Jacobian in HBM.
    """

    x: Any
    jac_blocks: tuple
    lap: Any

    @property
    def jac(self):
        # non-None marker: a deferred concat is never a constant
        return self.jac_blocks


def _const(x):
    return FL(x, None, None)


def _jac_of(v: FL, n: int):
    if v.jac is not None:
        return v.jac
    return jnp.zeros((n, *jnp.shape(v.x)), jnp.result_type(v.x))


def _lap_of(v: FL):
    if v.lap is not None:
        return v.lap
    return jnp.zeros_like(v.x)


# --- rule machinery ---------------------------------------------------------

RULES = {}


def rule(prim):
    def register(f):
        RULES[prim] = f
        return f

    return register


def _closed_fn(eqn, invals):
    """Bind fn over the *varying* args only, closing over constants."""
    prim, params = eqn.primitive, eqn.params
    var_idx = [i for i, v in enumerate(invals) if v.jac is not None]

    def fn(*var_args):
        args = list(v.x for v in invals)
        for i, a in zip(var_idx, var_args):
            args[i] = a
        out = prim.bind(*args, **params)
        return out if prim.multiple_results else (out,)

    var_xs = tuple(invals[i].x for i in var_idx)
    var_jacs = tuple(invals[i].jac for i in var_idx)
    var_laps = tuple(_lap_of(invals[i]) for i in var_idx)
    return fn, var_xs, var_jacs, var_laps


def _linear_rule(eqn, invals, n):
    """Exact for primitives (piecewise-)linear in their varying args."""
    fn, var_xs, var_jacs, var_laps = _closed_fn(eqn, invals)
    outs = fn(*var_xs)
    jac_outs = jax.vmap(lambda *tans: jax.jvp(fn, var_xs, tans)[1])(*var_jacs)
    lap_outs = jax.jvp(fn, var_xs, var_laps)[1]
    return [FL(o, j, l) for o, j, l in zip(outs, jac_outs, lap_outs)]


def _generic_rule(eqn, invals, n):
    """Exact fallback for any smooth primitive via nested JVPs."""
    fn, var_xs, var_jacs, var_laps = _closed_fn(eqn, invals)
    outs = fn(*var_xs)

    def jvp_tan(*tans):
        return jax.jvp(fn, var_xs, tans)[1]

    def row(*tans):
        j = jvp_tan(*tans)
        # f''[t, t]: differentiate the jvp once more along the same direction
        second = jax.jvp(lambda *p: jax.jvp(fn, p, tans)[1], var_xs, tans)[1]
        return j, second

    jac_outs, second_outs = jax.vmap(row)(*var_jacs)
    first_lap = jax.jvp(fn, var_xs, var_laps)[1]
    lap_outs = [f + s.sum(axis=0) for f, s in zip(first_lap, second_outs)]
    return [FL(o, j, l) for o, j, l in zip(outs, jac_outs, lap_outs)]


def _nondiff_rule(eqn, invals, n):
    """Primitives with non-differentiable (boolean/integer) outputs."""
    prim = eqn.primitive
    outs = prim.bind(*[v.x for v in invals], **eqn.params)
    outs = outs if prim.multiple_results else [outs]
    return [_const(o) for o in outs]


# --- elementwise unary closed forms ----------------------------------------
# name -> (d1(x, y), d2(x, y)) with y = f(x)

_SQRT_PI = 3.141592653589793**0.5

ELEMENTWISE = {
    'exp': (lambda x, y: y, lambda x, y: y),
    'tanh': (
        lambda x, y: 1 - y**2,
        lambda x, y: -2 * y * (1 - y**2),
    ),
    'log': (lambda x, y: 1 / x, lambda x, y: -1 / x**2),
    'log1p': (lambda x, y: 1 / (1 + x), lambda x, y: -1 / (1 + x) ** 2),
    'sqrt': (lambda x, y: 0.5 / y, lambda x, y: -0.25 / (y * x)),
    'rsqrt': (lambda x, y: -0.5 * y / x, lambda x, y: 0.75 * y / x**2),
    'sin': (lambda x, y: jnp.cos(x), lambda x, y: -y),
    'cos': (lambda x, y: -jnp.sin(x), lambda x, y: -y),
    'logistic': (
        lambda x, y: y * (1 - y),
        lambda x, y: y * (1 - y) * (1 - 2 * y),
    ),
    'erf': (
        lambda x, y: 2 / _SQRT_PI * jnp.exp(-(x**2)),
        lambda x, y: -4 * x / _SQRT_PI * jnp.exp(-(x**2)),
    ),
}


def _elementwise_rule(name):
    d1_fn, d2_fn = ELEMENTWISE[name]

    def rule_fn(eqn, invals, n):
        (v,) = invals
        y = eqn.primitive.bind(v.x, **eqn.params)
        d1 = d1_fn(v.x, y)
        d2 = d2_fn(v.x, y)
        jac = d1[None] * v.jac
        lap = d1 * _lap_of(v) + d2 * (v.jac**2).sum(axis=0)
        return [FL(y, jac, lap)]

    return rule_fn


def _integer_pow_rule(eqn, invals, n):
    (v,) = invals
    k = eqn.params['y']
    y = lax.integer_pow(v.x, k)
    d1 = k * lax.integer_pow(v.x, k - 1)
    d2 = k * (k - 1) * lax.integer_pow(v.x, k - 2)
    jac = d1[None] * v.jac
    lap = d1 * _lap_of(v) + d2 * (v.jac**2).sum(axis=0)
    return [FL(y, jac, lap)]


def _bjac(v: FL, out_shape):
    """Broadcast a Jacobian [n, *v.x.shape] to [n, *out_shape]."""
    j = v.jac
    pad = len(out_shape) - (j.ndim - 1)
    j = j.reshape(j.shape[0], *(1,) * pad, *j.shape[1:])
    return jnp.broadcast_to(j, (j.shape[0], *out_shape))


def _pow_rule(eqn, invals, n):
    a, b = invals
    if b.jac is not None:
        return _generic_rule(eqn, invals, n)
    y = lax.pow(a.x, b.x)
    d1 = b.x * lax.pow(a.x, b.x - 1)
    d2 = b.x * (b.x - 1) * lax.pow(a.x, b.x - 2)
    jac_a = _bjac(a, y.shape)
    jac = d1 * jac_a
    lap = d1 * (_lap_of(a) + jnp.zeros_like(y)) + d2 * (jac_a**2).sum(axis=0)
    return [FL(y, jac, lap)]


def _mul_rule(eqn, invals, n):
    a, b = invals
    y = a.x * b.x
    jac = 0
    lap = 0
    if a.jac is not None:
        jac = jac + _bjac(a, y.shape) * b.x
        lap = lap + _lap_of(a) * b.x
    if b.jac is not None:
        jac = jac + a.x * _bjac(b, y.shape)
        lap = lap + a.x * _lap_of(b)
    if a.jac is not None and b.jac is not None:
        lap = lap + 2 * (_bjac(a, y.shape) * _bjac(b, y.shape)).sum(axis=0)
    return [FL(y, jac, lap)]


def _div_rule(eqn, invals, n):
    a, b = invals
    y = a.x / b.x
    if b.jac is None:
        jac = _bjac(a, y.shape) / b.x
        lap = (_lap_of(a) + jnp.zeros_like(y)) / b.x
        return [FL(y, jac, lap)]
    inv_b = 1 / b.x
    jac_a = (
        _bjac(a, y.shape)
        if a.jac is not None
        else jnp.zeros((n, *y.shape), y.dtype)
    )
    jac_b = _bjac(b, y.shape)
    jac = (jac_a - y * jac_b) * inv_b
    lap = (
        (_lap_of(a) - y * _lap_of(b)) * inv_b
        - 2 * inv_b**2 * (jac_a * jac_b).sum(axis=0)
        + 2 * y * inv_b**2 * (jac_b**2).sum(axis=0)
    )
    return [FL(y, jac, lap)]


def _jac_matmul_bf16() -> bool:
    """Run Jacobian-channel ``dot_general``s natively in bf16 on the MXU.

    The jac channel is already *stored* bf16 (:func:`_jac_store_dtype`);
    upcasting it to f32 for a matmul pinned at precision 'highest' costs a
    6-pass bf16 decomposition on the MXU.  Feeding the bf16 values straight
    in (other operand downcast, f32 accumulation) does the same contraction
    in ONE MXU pass with no extra rounding on the already-bf16 operand.
    The primal and Laplacian contractions are never downcast.  Gated like
    the storage lever: ``DEEPQMC_TPU_JAC_MATMUL=bf16`` opts in, ``f32``
    opts out; the default follows bf16 jac storage.  Promotion gated on the
    LiH convergence A/B (r4_all variant, 2026-08-20: -8.071076(442) vs the
    jac_bf16 control -8.070521(925) at matched 1000-step budget — 0.5
    combined sigma; docs/evidence/ab_lih_convergence.jsonl).
    """
    import os

    name = os.environ.get('DEEPQMC_TPU_JAC_MATMUL', '').lower()
    if name in ('bf16', 'bfloat16'):
        return True
    if name in ('f32', 'float32', 'native', 'off', 'highest'):
        return False
    active = _jac_store_dtype() is jnp.bfloat16
    if active and not _jac_matmul_bf16.logged:
        # the reduced precision lands as an accelerator DEFAULT (advisor r4):
        # announce once so runs are auditable without reading env vars
        _jac_matmul_bf16.logged = True
        logging.getLogger(__name__).info(
            'Jacobian-channel dot_generals default to native bf16 on this '
            'platform (DEEPQMC_TPU_JAC_MATMUL=f32 opts out; rule math and '
            'primal/Laplacian contractions stay f32)'
        )
    return active


_jac_matmul_bf16.logged = False


def _dot_general_rule(eqn, invals, n):
    # dispatched WITHOUT the pre-rule jac upcast (registered under the
    # primitive object): the jac-side contractions choose their own dtype
    a, b = invals
    params = eqn.params
    ct = jnp.result_type(a.x, b.x)

    def dot(x, y):
        return lax.dot_general(
            x,
            y,
            dimension_numbers=params['dimension_numbers'],
            precision=params.get('precision'),
            preferred_element_type=params.get('preferred_element_type'),
        )

    low = _jac_matmul_bf16() and any(
        v.jac is not None
        and hasattr(v.jac, 'dtype')
        and v.jac.dtype == jnp.bfloat16
        for v in (a, b)
    )

    def jdot(x, y):
        if low:
            return lax.dot_general(
                x.astype(jnp.bfloat16),
                y.astype(jnp.bfloat16),
                dimension_numbers=params['dimension_numbers'],
                precision=lax.Precision.DEFAULT,
                preferred_element_type=ct,
            )
        return dot(x.astype(ct), y.astype(ct))

    y = dot(a.x, b.x)
    jac = 0
    lap = 0
    if a.jac is not None:
        jac = jac + jax.vmap(lambda ja: jdot(ja, b.x))(a.jac)
        lap = lap + dot(_lap_of(a).astype(ct), b.x)
    if b.jac is not None:
        jac = jac + jax.vmap(lambda jb: jdot(a.x, jb))(b.jac)
        lap = lap + dot(a.x, _lap_of(b).astype(ct))
    if a.jac is not None and b.jac is not None:
        cross = jax.vmap(jdot)(a.jac, b.jac).sum(axis=0)
        lap = lap + 2 * cross
    return [FL(y, jac, lap)]


def _slogdet_rule(eqn, invals, n):
    from .ops.slogdet import _inv

    (v,) = invals
    if isinstance(v, FLRowBlocks):
        import os

        if (
            v.x.ndim == 3
            and _use_pallas()
            and not os.environ.get('DEEPQMC_TPU_NO_SPLIT_SLOGDET')
        ):
            from .ops.fl_slogdet import slogdet_fl_split_tpu

            sign, logdet, jout, lout = slogdet_fl_split_tpu(
                v.x, *v.jac_blocks, v.lap
            )
            return [_const(sign), FL(logdet, jout, lout)]
        v = FL(v.x, jnp.concatenate(v.jac_blocks, axis=-2), v.lap)
    if v.x.ndim == 3 and _use_pallas():
        # the fused VMEM-resident kernel (ops/fl_slogdet.py) computes the
        # whole rule per walker block; [K, D] jac layout -> [D] leading
        from .ops.fl_slogdet import slogdet_fl_tpu

        sign, logdet, jout, lout = slogdet_fl_tpu(
            v.x, _jac_of(v, n), _lap_of(v)
        )
        return [_const(sign), FL(logdet, jout, lout)]
    sign, logdet = slogdet_p.bind(v.x)
    inv_a = _inv(v.x)
    # J log|det| = tr(A^-1 J_A)
    jac = jnp.einsum('...ij,k...ji->k...', inv_a, v.jac)
    m = jnp.einsum('...ij,k...jl->k...il', inv_a, v.jac)
    lap = jnp.einsum('...ij,...ji->...', inv_a, _lap_of(v)) - jnp.einsum(
        'k...ij,k...ji->...', m, m
    )
    return [_const(sign), FL(logdet, jac, lap)]


def _slogdet_flat_rule(eqn, invals, n):
    """FL rule for the flat-layout slogdet (ops/slogdet.py slogdet_flat).

    Per walker the value is [n_el, D * n_el] with det-major columns, so the
    Jacobian channel reaching this rule is flat too — the layout the whole
    determinant assembly runs in to avoid TPU tile-padding blowups.  The
    TPU path hands the flat Jacobian straight to the fused kernel; the
    generic path unpacks and reuses the [D, n, n] math.
    """
    from .ops.slogdet import _inv, unflatten_dets

    n_det = eqn.params['n_det']
    (v,) = invals
    if isinstance(v, FLRowBlocks):
        if v.x.ndim == 2 and _use_pallas():
            from .ops.fl_slogdet import slogdet_fl_flat_split_tpu

            sign, logdet, jout, lout = slogdet_fl_flat_split_tpu(
                v.x, *v.jac_blocks, v.lap, n_det
            )
            return [_const(sign), FL(logdet, jout, lout)]
        v = FL(v.x, jnp.concatenate(v.jac_blocks, axis=-2), v.lap)
    if v.x.ndim == 2 and _use_pallas():
        from .ops.fl_slogdet import slogdet_fl_flat_tpu

        sign, logdet, jout, lout = slogdet_fl_flat_tpu(
            v.x, _jac_of(v, n), _lap_of(v), n_det
        )
        return [_const(sign), FL(logdet, jout, lout)]
    # generic path: unpack to [..., D, n, n] and reuse the square math
    a = unflatten_dets(v.x, n_det)
    jac_f = _jac_of(v, n)
    ja = jnp.moveaxis(
        jac_f.reshape(*jac_f.shape[:-1], n_det, -1), -2, -3
    )  # [K, ..., D, n, n]
    la = unflatten_dets(_lap_of(v), n_det)
    sign, logdet = slogdet_p.bind(a)
    inv_a = _inv(a)
    jac = jnp.einsum('...ij,k...ji->k...', inv_a, ja)
    m = jnp.einsum('...ij,k...jl->k...il', inv_a, ja)
    lap = jnp.einsum('...ij,...ji->...', inv_a, la) - jnp.einsum(
        'k...ij,k...ji->...', m, m
    )
    return [_const(sign), FL(logdet, jac, lap)]


def _stop_gradient_rule(eqn, invals, n):
    (v,) = invals
    return [_const(v.x)]


def _use_pallas() -> bool:
    import os

    if os.environ.get('DEEPQMC_TPU_NO_PALLAS'):
        return False
    return jax.devices()[0].platform != 'cpu'


def _jac_store_dtype():
    """Storage dtype for Jacobian intermediates (None = keep compute dtype).

    Storing every Jacobian intermediate in bfloat16 between ops halves the
    dominant HBM traffic of the local energy (the [3N, ...] jac channel is
    ~30x the forward activations — docs/PERF.md; measured 266 -> 217 ms
    H2O-PsiFormer eloc, docs/evidence/ab_eloc_r03_sweep.jsonl).  All rule
    MATH stays in the compute dtype: non-kernel rules upcast on entry, and
    the Pallas kernels take bf16 operands and upcast after the VMEM load.
    The Laplacian and primal channels are never downcast.

    Default: bfloat16 storage on accelerators, compute dtype on CPU (the
    f64 test/golden-parity lane).  The TPU default is gated on a measured
    LiH convergence A/B — bf16-jac vs f32-jac training at matched budgets
    lands within one sampling error bar of the reference energy
    (docs/evidence/ab_lih_convergence.jsonl).  ``DEEPQMC_TPU_JAC_DTYPE``
    overrides either way: ``bf16`` forces bfloat16 storage, ``f32``
    (also ``native``/``off``) keeps the compute dtype.
    """
    import os

    name = os.environ.get('DEEPQMC_TPU_JAC_DTYPE', '').lower()
    if name in ('bf16', 'bfloat16'):
        return jnp.bfloat16
    if name in ('f32', 'float32', 'native', 'off', 'highest'):
        return None
    return jnp.bfloat16 if jax.devices()[0].platform != 'cpu' else None


def _upcast_fl(val):
    """Return ``val`` with its jac channel in the compute (primal) dtype."""
    if isinstance(val, FLRowBlocks):
        ct = jnp.result_type(val.x)
        if any(b.dtype != ct for b in val.jac_blocks):
            return FLRowBlocks(
                val.x, tuple(b.astype(ct) for b in val.jac_blocks), val.lap
            )
        return val
    if (
        isinstance(val, FL)
        and val.jac is not None
        and hasattr(val.jac, 'dtype')
        and jnp.issubdtype(val.jac.dtype, jnp.floating)
        and val.jac.dtype != jnp.result_type(val.x)
    ):
        return FL(val.x, val.jac.astype(jnp.result_type(val.x)), val.lap)
    return val


def _use_block_kernel() -> bool:
    import os

    if os.environ.get('DEEPQMC_TPU_BLOCK_KERNEL_INTERPRET'):
        # testing hook: exercise the in-kernel interpreter (pallas interpret
        # mode) on CPU, where the real kernel path is otherwise off
        return True
    # opt-in while the in-kernel attention contractions still lower to
    # Mosaic batch loops (slower than the per-op kernels; see ops/fl_block.py)
    if not os.environ.get('DEEPQMC_TPU_BLOCK_KERNEL'):
        return False
    return _use_pallas()


def _try_block_rule(eqn, invals, n):
    """Whole-block fused rule for named-jit units (nn.named_jit_block).

    Returns None when the block is not fusable (multiple varying inputs,
    unsupported primitive, tracer consts) — the caller then falls back to
    per-primitive interpretation, so coverage is opportunistic and
    correctness unconditional.
    """
    from .ops.fl_block import Unsupported, block_fl_call, block_jaxpr_supported

    invals = [_upcast_fl(v) for v in invals]
    closed = eqn.params['jaxpr']
    var_mask = [v.jac is not None for v in invals]
    if sum(var_mask) != 1 or len(closed.jaxpr.outvars) != 1:
        return None
    try:
        if not block_jaxpr_supported(closed, var_mask):
            return None
    except Unsupported:
        return None
    vi = var_mask.index(True)
    v = invals[vi]
    consts = [u.x for i, u in enumerate(invals) if i != vi]

    import os

    interp = bool(os.environ.get('DEEPQMC_TPU_BLOCK_KERNEL_INTERPRET'))

    @jax.custom_batching.custom_vmap
    def run(x, jac, lap, *cs):
        xo, jo, lo = block_fl_call(
            closed, n, vi, x[None], jac[None], lap[None], list(cs),
            interpret=interp,
        )
        return xo[0], jo[0], lo[0]

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, x, jac, lap, *cs):
        assert in_batched[0] and in_batched[1] and in_batched[2]
        assert not any(in_batched[3:]), 'block params must be unbatched'
        out = block_fl_call(
            closed, n, vi, x, jac, lap, list(cs), interpret=interp
        )
        return out, (True, True, True)

    try:
        xo, jo, lo = run(v.x, _jac_of(v, n), _lap_of(v), *consts)
    except Unsupported:
        return None
    return [FL(xo, jo, lo)]


def _mha_core_flat_rule(invals, n, num_heads):
    """Fused rule for the attention core (nn.modules._mha_core_flat).

    Swaps per-primitive interpretation of logits/softmax/attended — whose
    [3N, ...] Jacobian intermediates are what makes the local energy
    HBM-bound — for one VMEM-resident kernel per walker
    (ops/fl_attention.py).  Falls back to the pure-jnp twin off-TPU.
    The core is head-flat [token, H*dh]; the head split/merge here is a
    row-major bitcast, free in XLA.
    """
    from .ops.fl_attention import mha_core_fl, mha_core_fl_tpu

    q, k, v = invals
    tok, dm = q.x.shape
    dh = dm // num_heads

    def heads(x):
        return x.reshape(*x.shape[:-1], num_heads, dh)

    args = []
    for val in (q, k, v):
        args.append(heads(val.x))
    for val in (q, k, v):
        args.append(heads(_jac_of(val, n)))
    for val in (q, k, v):
        args.append(heads(_lap_of(val)))
    core = mha_core_fl_tpu if _use_pallas() else mha_core_fl
    t, jt, lt = core(*args)  # [token, head, dh] (+ jac leading n-axis)
    return [
        FL(
            t.reshape(tok, dm),
            jt.reshape(n, tok, dm),
            lt.reshape(tok, dm),
        )
    ]


# --- closed-form structural rules -------------------------------------------
# For purely shape-structural linear primitives the Jacobian rule is the SAME
# primitive with its dimension parameters shifted by the leading direction
# axis, and the Laplacian rule is the primitive unchanged.  Binding these
# directly instead of going through vmap-of-jvp (_linear_rule) (a) cuts the
# Python trace time of the big training-step jaxpr (the round-2 "~6 min warm
# startup is trace, not compile" finding) and (b) emits exactly one op per
# derivative channel, giving XLA maximal freedom to fuse the [3N, ...]
# Jacobian traffic into neighbors.


def _shift(dims):
    return (0, *(d + 1 for d in dims))


def _reshape_rule(eqn, invals, n):
    (v,) = invals
    p = eqn.params
    dims = p['dimensions']
    y = lax.reshape(v.x, p['new_sizes'], dims)
    jac = lax.reshape(
        v.jac, (n, *p['new_sizes']), None if dims is None else _shift(dims)
    )
    lap = lax.reshape(_lap_of(v), p['new_sizes'], dims)
    return [FL(y, jac, lap)]


def _transpose_rule(eqn, invals, n):
    (v,) = invals
    perm = eqn.params['permutation']
    return [
        FL(
            lax.transpose(v.x, perm),
            lax.transpose(v.jac, _shift(perm)),
            lax.transpose(_lap_of(v), perm),
        )
    ]


def _broadcast_in_dim_rule(eqn, invals, n):
    (v,) = invals
    p = eqn.params
    shape, bdims = p['shape'], p['broadcast_dimensions']
    return [
        FL(
            lax.broadcast_in_dim(v.x, shape, bdims),
            lax.broadcast_in_dim(v.jac, (n, *shape), _shift(bdims)),
            lax.broadcast_in_dim(_lap_of(v), shape, bdims),
        )
    ]


def _squeeze_rule(eqn, invals, n):
    (v,) = invals
    dims = eqn.params['dimensions']
    return [
        FL(
            lax.squeeze(v.x, dims),
            lax.squeeze(v.jac, tuple(d + 1 for d in dims)),
            lax.squeeze(_lap_of(v), dims),
        )
    ]


def _slice_rule(eqn, invals, n):
    (v,) = invals
    p = eqn.params
    starts, limits, strides = (
        p['start_indices'],
        p['limit_indices'],
        p['strides'],
    )
    return [
        FL(
            lax.slice(v.x, starts, limits, strides),
            lax.slice(
                v.jac,
                (0, *starts),
                (n, *limits),
                None if strides is None else (1, *strides),
            ),
            lax.slice(_lap_of(v), starts, limits, strides),
        )
    ]


def _rev_rule(eqn, invals, n):
    (v,) = invals
    dims = eqn.params['dimensions']
    return [
        FL(
            lax.rev(v.x, dims),
            lax.rev(v.jac, tuple(d + 1 for d in dims)),
            lax.rev(_lap_of(v), dims),
        )
    ]


def _reduce_sum_rule(eqn, invals, n):
    (v,) = invals
    prim, p = eqn.primitive, dict(eqn.params)
    jp = dict(p, axes=tuple(d + 1 for d in p['axes']))
    return [
        FL(
            prim.bind(v.x, **p),
            prim.bind(v.jac, **jp),
            prim.bind(_lap_of(v), **p),
        )
    ]


def _cumsum_rule(eqn, invals, n):
    (v,) = invals
    prim, p = eqn.primitive, dict(eqn.params)
    jp = dict(p, axis=p['axis'] + 1)
    return [
        FL(
            prim.bind(v.x, **p),
            prim.bind(v.jac, **jp),
            prim.bind(_lap_of(v), **p),
        )
    ]


def _concatenate_rule(eqn, invals, n):
    d = eqn.params['dimension']
    return [
        FL(
            lax.concatenate([v.x for v in invals], d),
            lax.concatenate([_jac_of(v, n) for v in invals], d + 1),
            lax.concatenate([_lap_of(v) for v in invals], d),
        )
    ]


def _split_rule(eqn, invals, n):
    (v,) = invals
    prim, p = eqn.primitive, dict(eqn.params)
    jp = dict(p, axis=p['axis'] + 1)
    ys = prim.bind(v.x, **p)
    jacs = prim.bind(v.jac, **jp)
    laps = prim.bind(_lap_of(v), **p)
    return [FL(y, j, l) for y, j, l in zip(ys, jacs, laps)]


def _pad_rule(eqn, invals, n):
    v, pv = invals
    if pv.jac is not None:  # varying padding value: exact generic path
        return _linear_rule(eqn, invals, n)
    cfg = eqn.params['padding_config']
    zero = jnp.zeros((), jnp.result_type(v.x))
    return [
        FL(
            lax.pad(v.x, pv.x, cfg),
            lax.pad(v.jac, zero, ((0, 0, 0), *cfg)),
            lax.pad(_lap_of(v), zero, cfg),
        )
    ]


def _dynamic_slice_rule(eqn, invals, n):
    v, *idxs = invals
    sizes = eqn.params['slice_sizes']
    starts = [i.x for i in idxs]
    zero = jnp.zeros((), jnp.result_type(starts[0]) if starts else jnp.int32)
    return [
        FL(
            lax.dynamic_slice(v.x, starts, sizes),
            lax.dynamic_slice(v.jac, [zero, *starts], (n, *sizes)),
            lax.dynamic_slice(_lap_of(v), starts, sizes),
        )
    ]


def _dynamic_update_slice_rule(eqn, invals, n):
    v, u, *idxs = invals
    starts = [i.x for i in idxs]
    zero = jnp.zeros((), jnp.result_type(starts[0]) if starts else jnp.int32)
    return [
        FL(
            lax.dynamic_update_slice(v.x, u.x, starts),
            lax.dynamic_update_slice(
                _jac_of(v, n), _jac_of(u, n), [zero, *starts]
            ),
            lax.dynamic_update_slice(_lap_of(v), _lap_of(u), starts),
        )
    ]


def _neg_rule(eqn, invals, n):
    (v,) = invals
    return [FL(-v.x, -v.jac, -_lap_of(v))]


def _add_sub_rule(eqn, invals, n):
    a, b = invals
    sub = eqn.primitive.name == 'sub'
    y = a.x - b.x if sub else a.x + b.x
    if a.jac is not None and b.jac is not None:
        ja, jb = _bjac(a, y.shape), _bjac(b, y.shape)
        jac = ja - jb if sub else ja + jb
        la, lb = _lap_of(a), _lap_of(b)
        lap = la - lb if sub else la + lb
        lap = jnp.broadcast_to(lap, y.shape)
    elif a.jac is not None:
        jac = _bjac(a, y.shape)
        lap = jnp.broadcast_to(_lap_of(a), y.shape)
    else:
        jac = -_bjac(b, y.shape) if sub else _bjac(b, y.shape)
        lap = jnp.broadcast_to(
            -_lap_of(b) if sub else _lap_of(b), y.shape
        )
    return [FL(y, jac, lap)]


def _select_n_rule(eqn, invals, n):
    pred, *cases = invals
    if pred.jac is not None:  # differentiable predicate never happens, but
        return _linear_rule(eqn, invals, n)
    y = lax.select_n(pred.x, *[c.x for c in cases])
    pred_j = jnp.broadcast_to(pred.x, (n, *jnp.shape(pred.x)))
    jac = lax.select_n(pred_j, *[_jac_of(c, n) for c in cases])
    lap = lax.select_n(pred.x, *[_lap_of(c) for c in cases])
    return [FL(y, jac, lap)]


def _convert_element_type_rule(eqn, invals, n):
    (v,) = invals
    dt = eqn.params['new_dtype']
    y = lax.convert_element_type(v.x, dt)
    if not jnp.issubdtype(dt, jnp.inexact):
        return [_const(y)]
    return [
        FL(
            y,
            lax.convert_element_type(v.jac, dt),
            lax.convert_element_type(_lap_of(v), dt),
        )
    ]


def _copy_rule(eqn, invals, n):
    (v,) = invals
    return [v]


STRUCTURAL_RULES = {
    'reshape': _reshape_rule,
    'transpose': _transpose_rule,
    'broadcast_in_dim': _broadcast_in_dim_rule,
    'squeeze': _squeeze_rule,
    'slice': _slice_rule,
    'rev': _rev_rule,
    'reduce_sum': _reduce_sum_rule,
    'cumsum': _cumsum_rule,
    'concatenate': _concatenate_rule,
    'split': _split_rule,
    'pad': _pad_rule,
    'dynamic_slice': _dynamic_slice_rule,
    'dynamic_update_slice': _dynamic_update_slice_rule,
    'neg': _neg_rule,
    'add': _add_sub_rule,
    'add_any': _add_sub_rule,
    'sub': _add_sub_rule,
    'select_n': _select_n_rule,
    'convert_element_type': _convert_element_type_rule,
    'copy': _copy_rule,
}


# --- primitive classification ----------------------------------------------

PIECEWISE_LINEAR_NAMES = {
    'add',
    'add_any',
    'sub',
    'neg',
    'reduce_sum',
    'cumsum',
    'reshape',
    'broadcast_in_dim',
    'transpose',
    'squeeze',
    'expand_dims',
    'slice',
    'dynamic_slice',
    'dynamic_update_slice',
    'concatenate',
    'split',
    'pad',
    'rev',
    'tile',
    'gather',
    'scatter',
    'scatter-add',
    'select_n',
    'max',
    'min',
    'abs',
    'reduce_max',
    'reduce_min',
    'real',
    'copy',
    'convert_element_type',
}

NONDIFF_NAMES = {
    'eq',
    'ne',
    'ge',
    'gt',
    'le',
    'lt',
    'and',
    'or',
    'not',
    'xor',
    'is_finite',
    'sign',
    'floor',
    'ceil',
    'round',
    'iota',
    'argmax',
    'argmin',
    'reduce_and',
    'reduce_or',
    'shift_left',
    'shift_right_logical',
    'shift_right_arithmetic',
    'rem',
}

SUBJAXPR_NAMES = {'pjit', 'closed_call', 'custom_jvp_call', 'custom_vjp_call',
                  'custom_jvp_call_jaxpr', 'custom_vjp_call_jaxpr', 'remat',
                  'checkpoint', 'jit'}


def _find_subjaxpr(params):
    for key in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
        if key in params:
            return params[key]
    raise KeyError(f'no sub-jaxpr found among params: {list(params)}')


def _deferred_concat_eqns(jaxpr):
    """ids of 2-operand row-concat eqns consumed ONLY by a slogdet eqn.

    For these the Jacobian concatenation can be deferred into the fused
    determinant kernel (see :class:`FLRowBlocks`).
    """
    use_count: dict = {}
    producer: dict = {}
    for eqn in jaxpr.eqns:
        for iv in eqn.invars:
            if not isinstance(iv, jex_core.Literal):
                use_count[iv] = use_count.get(iv, 0) + 1
        for ov in eqn.outvars:
            producer[ov] = eqn
    outvars = {v for v in jaxpr.outvars if not isinstance(v, jex_core.Literal)}
    deferred = set()
    for eqn in jaxpr.eqns:
        if eqn.primitive not in (slogdet_p, slogdet_flat_p):
            continue
        src = eqn.invars[0]
        if isinstance(src, jex_core.Literal) or src in outvars:
            continue
        peqn = producer.get(src)
        if (
            peqn is not None
            and peqn.primitive.name == 'concatenate'
            and len(peqn.invars) == 2
            and peqn.params.get('dimension') == src.aval.ndim - 2
            and use_count.get(src) == 1
        ):
            deferred.add(id(peqn))
    return deferred


def _interpret(jaxpr, consts, args, n):
    env = {}
    store_dt = _jac_store_dtype()

    def read(atom):
        if isinstance(atom, jex_core.Literal):
            return _const(atom.val)
        return env[atom]

    def _store(val):
        if isinstance(val, FLRowBlocks):
            if any(
                jnp.issubdtype(b.dtype, jnp.floating) and b.dtype != store_dt
                for b in val.jac_blocks
            ):
                return FLRowBlocks(
                    val.x,
                    tuple(b.astype(store_dt) for b in val.jac_blocks),
                    val.lap,
                )
            return val
        if (
            isinstance(val, FL)
            and val.jac is not None
            and hasattr(val.jac, 'dtype')
            and jnp.issubdtype(val.jac.dtype, jnp.floating)
            and val.jac.dtype != store_dt
        ):
            return FL(val.x, val.jac.astype(store_dt), val.lap)
        return val

    def write(var, val):
        env[var] = _store(val) if store_dt is not None else val

    for var, const in zip(jaxpr.constvars, consts):
        write(var, _const(const))
    for var, arg in zip(jaxpr.invars, args):
        write(var, arg)

    deferred_concats = _deferred_concat_eqns(jaxpr)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive
        invals = [read(x) for x in eqn.invars]
        if id(eqn) in deferred_concats and any(
            v.jac is not None for v in invals
        ):
            x = prim.bind(*[v.x for v in invals], **eqn.params)
            lap = prim.bind(*[_lap_of(v) for v in invals], **eqn.params)
            outs = [FLRowBlocks(x, tuple(_jac_of(v, n) for v in invals), lap)]
        elif all(v.jac is None for v in invals):
            outs = prim.bind(*[v.x for v in invals], **eqn.params)
            outs = outs if prim.multiple_results else [outs]
            outs = [_const(o) for o in outs]
        elif prim in RULES:
            # kernel-backed rules (slogdet variants): bf16-store aware — the
            # Pallas kernels take bf16 jac operands and upcast in VMEM; the
            # jnp fallbacks promote via einsum
            outs = RULES[prim](eqn, invals, n)
        elif prim.name in RULES:
            if store_dt is not None:
                invals = [_upcast_fl(v) for v in invals]
            outs = RULES[prim.name](eqn, invals, n)
        elif prim.name in SUBJAXPR_NAMES:
            sub_name = eqn.params.get('name') or ''
            if (
                sub_name.startswith('_mha_core_flat_')
                and len(invals) == 3
                and any(v.jac is not None for v in invals)
            ):
                outs = _mha_core_flat_rule(
                    invals, n, int(sub_name.rsplit('_', 1)[1])
                )
            elif (
                sub_name in ('_psiformer_block', '_gnn_stack')
                and _use_block_kernel()
                and (outs := _try_block_rule(eqn, invals, n)) is not None
            ):
                pass
            else:
                sub = _find_subjaxpr(eqn.params)
                sub_jaxpr, sub_consts = (
                    (sub.jaxpr, sub.consts) if hasattr(sub, 'jaxpr') else (sub, [])
                )
                outs = _interpret(
                    sub_jaxpr, [*map(jnp.asarray, sub_consts)], invals, n
                )
        elif prim.name in NONDIFF_NAMES:
            outs = _nondiff_rule(eqn, invals, n)
        else:
            if store_dt is not None:
                invals = [_upcast_fl(v) for v in invals]
            if prim.name in PIECEWISE_LINEAR_NAMES:
                outs = _linear_rule(eqn, invals, n)
            elif prim.name in ELEMENTWISE:
                outs = _elementwise_rule(prim.name)(eqn, invals, n)
            else:
                log.debug('fwdlap: generic rule for primitive %s', prim.name)
                outs = _generic_rule(eqn, invals, n)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for var, out in zip(eqn.outvars, outs):
            write(var, out)

    return [read(v) for v in jaxpr.outvars]


RULES['mul'] = _mul_rule
RULES['div'] = _div_rule
RULES['pow'] = _pow_rule
# registered under the primitive OBJECT: the dispatch loop skips the
# pre-rule jac upcast for these, letting the rule pick jac-matmul dtypes
RULES[lax.dot_general_p] = _dot_general_rule
RULES['integer_pow'] = _integer_pow_rule
RULES['stop_gradient'] = _stop_gradient_rule
RULES[slogdet_p] = _slogdet_rule
RULES[slogdet_flat_p] = _slogdet_flat_rule
for _name in ELEMENTWISE:
    RULES[_name] = _elementwise_rule(_name)
RULES.update(STRUCTURAL_RULES)


def forward_laplacian(f):
    """LaplacianFactory: returns ``x -> (lap f(x), grad f(x))``.

    Drop-in replacement for :func:`deepqmc_tpu.physics.loop_laplacian`
    (the reference's ``LaplacianFactory`` protocol, hamil.py:32-41).
    """

    def lap(x):
        n = x.shape[0]
        closed = jax.make_jaxpr(f)(x)
        eye = jnp.eye(n, dtype=x.dtype)
        args = [FL(x, eye, jnp.zeros_like(x))]
        outs = _interpret(closed.jaxpr, closed.consts, args, n)
        (out,) = outs
        assert jnp.shape(out.x) == (), 'forward_laplacian expects a scalar fn'
        out = _upcast_fl(out)  # bf16-stored jac -> compute dtype
        return out.lap, out.jac

    return lap
