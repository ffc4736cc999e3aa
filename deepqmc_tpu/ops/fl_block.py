"""In-kernel forward-Laplacian interpretation of whole network blocks.

The eloc trace (scripts/trace_eloc.py) shows the forward-Laplacian local
energy is bound by HBM traffic on the [walker, 3N, token, feature] Jacobian
channel: every XLA fusion boundary and kernel hand-off materializes a
~630 MB tensor, and the graph crosses hundreds of such boundaries.  This
module fuses an ENTIRE block — e.g. the PsiFormer attention+MLP layer,
exposed as a named-jit unit by ``nn.named_jit_block`` — into ONE Pallas
program per walker block: a mini-interpreter walks the block's jaxpr with
W-batched (value, Jacobian, Laplacian) rules on VMEM-resident arrays, so
the Jacobian channel touches HBM exactly twice (block input and output).

The rule set mirrors fwdlap.py but under Mosaic's constraints (flat-lane
values, no minor-dim reshapes, leading-dim folds for every GEMM).  A block
containing anything outside the allowlist raises :class:`Unsupported` at
trace time and the caller falls back to per-primitive interpretation —
coverage is opportunistic, correctness is unconditional.
"""

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .fl_attention import _head_fn_factory

__all__ = ['Unsupported', 'block_fl_call', 'block_jaxpr_supported']

import os as _os

WALKER_BLOCK = int(_os.environ.get('DEEPQMC_TPU_BLOCK_WALKERS', '4'))


class Unsupported(Exception):
    """Block contains a primitive the in-kernel interpreter cannot lower."""


class KVal(NamedTuple):
    """W-batched FL value inside the kernel: x [W,*s], jac [W,K,*s], lap."""

    x: Any
    jac: Optional[Any]
    lap: Optional[Any]


def _kconst(x):
    return KVal(x, None, None)


def _jac_of(v: KVal, k: int):
    if v.jac is not None:
        return v.jac
    x = v.x
    return jnp.zeros((x.shape[0], k, *x.shape[1:]), x.dtype)


def _lap_of(v: KVal):
    if v.lap is not None:
        return v.lap
    return jnp.zeros_like(v.x)


# --- W-batched rules ---------------------------------------------------------
# Each rule gets (eqn, invals, k) with every varying shape carrying a leading
# W axis (and jac a [W, k, ...] layout); consts keep their natural shapes.

_ELEMENTWISE = None  # populated lazily from fwdlap to avoid an import cycle


def _elementwise_table():
    global _ELEMENTWISE
    if _ELEMENTWISE is None:
        from ..fwdlap import ELEMENTWISE

        _ELEMENTWISE = ELEMENTWISE
    return _ELEMENTWISE


def _broadcast_const(c, target_ndim):
    """Right-align a const's shape against a W-leading varying operand."""
    return c  # jnp broadcasting right-aligns; W/K leading axes are fine


def _rule_elementwise(name, eqn, invals, k):
    (v,) = invals
    d1_fn, d2_fn = _elementwise_table()[name]
    y = eqn.primitive.bind(v.x, **eqn.params)
    d1 = d1_fn(v.x, y)
    d2 = d2_fn(v.x, y)
    jac = d1[:, None] * _jac_of(v, k)
    lap = d1 * _lap_of(v) + d2 * (_jac_of(v, k) ** 2).sum(axis=1)
    return [KVal(y, jac, lap)]


def _rule_add_sub(eqn, invals, k, sign):
    # jnp ops, not prim.bind: the W (and K) axes are extra leading dims the
    # jaxpr's shapes don't know about, so we need right-aligned broadcasting
    a, b = invals
    y = a.x - b.x if sign < 0 else a.x + b.x
    if a.jac is None and b.jac is None:
        return [_kconst(y)]
    jac = None
    lap = None
    if a.jac is not None:
        jac = _jac_of(a, k)
        lap = _lap_of(a)
    if b.jac is not None:
        jb, lb = sign * _jac_of(b, k), sign * _lap_of(b)
        jac = jb if jac is None else jac + jb
        lap = lb if lap is None else lap + lb
    # broadcast the derivative channels to the primal's batched shape
    W = y.shape[0]
    jac = jnp.broadcast_to(jac, (W, k, *y.shape[1:]))
    lap = jnp.broadcast_to(lap, y.shape)
    return [KVal(y, jac, lap)]


def _rule_mul(eqn, invals, k):
    a, b = invals
    y = a.x * b.x
    if a.jac is None and b.jac is None:
        return [_kconst(y)]
    jac = 0.0
    lap = 0.0
    if a.jac is not None:
        jac = jac + _jac_of(a, k) * (
            b.x[:, None] if b.jac is not None else b.x
        )
        lap = lap + _lap_of(a) * b.x
    if b.jac is not None:
        jac = jac + (
            a.x[:, None] if a.jac is not None else a.x
        ) * _jac_of(b, k)
        lap = lap + a.x * _lap_of(b)
    if a.jac is not None and b.jac is not None:
        lap = lap + 2.0 * (_jac_of(a, k) * _jac_of(b, k)).sum(axis=1)
    W = y.shape[0]
    jac = jnp.broadcast_to(jac, (W, k, *y.shape[1:]))
    lap = jnp.broadcast_to(lap, y.shape)
    return [KVal(y, jac, lap)]


def _rule_dot_general(eqn, invals, k):
    a, b = invals
    dnums = eqn.params['dimension_numbers']
    ((lc, rc), (lb, rb)) = dnums
    if b.jac is not None or a.jac is None:
        raise Unsupported('dot_general: only (varying @ const) is fused')
    if lb or rb:
        raise Unsupported('dot_general: batch dims not fused')
    w = b.x
    if w.ndim != 2 or rc != (0,):
        raise Unsupported('dot_general: rhs must be a [in, out] matrix')
    x = a.x  # [W, ..., in]
    if lc != (x.ndim - 2,):  # per-walker contraction over the LAST dim
        raise Unsupported('dot_general: lhs must contract its last dim')

    def dot(t):
        lead = t.shape[:-1]
        flat = t.reshape(-1, t.shape[-1])
        out = jax.lax.dot_general(
            flat, w, (((1,), (0,)), ((), ())),
            preferred_element_type=t.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(*lead, w.shape[1])

    return [KVal(dot(x), dot(_jac_of(a, k)), dot(_lap_of(a)))]


def _rule_linear_bind(eqn, invals, k):
    """Primitives linear in their (single) varying operand and exactly
    shape-preserving on the derivative channels (convert_element_type &c)."""
    prim, params = eqn.primitive, eqn.params
    xs = [v.x for v in invals]
    y = prim.bind(*xs, **params)
    var = [v for v in invals if v.jac is not None]
    if not var:
        return [_kconst(y)]
    if len(var) != 1:
        raise Unsupported(f'{prim.name}: multiple varying operands')
    (v,) = var
    if jnp.shape(y) != jnp.shape(v.x):
        raise Unsupported(f'{prim.name}: shape-changing linear op')

    def again(t):
        return prim.bind(*[t if u is v else u.x for u in invals], **params)

    jac = jax.vmap(again, in_axes=1, out_axes=1)(_jac_of(v, k))
    return [KVal(y, jac, again(_lap_of(v)))]


def _rule_mha_flat(invals, k, num_heads):
    q2, k2, v2 = invals
    W, n_tok, dm = q2.x.shape
    dh = dm // num_heads
    per_head = _head_fn_factory()(W, n_tok, k, dh, q2.x.dtype)
    args = [_jac_of(v, k) for v in (q2, k2, v2)]
    laps = [_lap_of(v) for v in (q2, k2, v2)]
    ts, jts, lts = [], [], []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        t, jt, lt = per_head(
            q2.x[..., sl], k2.x[..., sl], v2.x[..., sl],
            args[0][..., sl], args[1][..., sl], args[2][..., sl],
            laps[0][..., sl], laps[1][..., sl], laps[2][..., sl],
        )
        ts.append(t)
        jts.append(jt)
        lts.append(lt)
    return [
        KVal(
            jnp.concatenate(ts, axis=-1),
            jnp.concatenate(jts, axis=-1),
            jnp.concatenate(lts, axis=-1),
        )
    ]


def _mha_heads(name):
    if name and name.startswith('_mha_core_flat_'):
        try:
            return int(name.rsplit('_', 1)[1])
        except ValueError:
            return None
    return None


_PIECEWISE_LINEAR = {
    'add', 'add_any', 'sub', 'neg', 'convert_element_type', 'real', 'conj',
    'copy', 'broadcast_in_dim', 'squeeze', 'expand_dims',
}


def _interpret_kernel(jaxpr, consts, args, k):
    """W-batched FL interpretation of ``jaxpr`` with Mosaic-safe rules."""
    from jax.extend import core as jex_core

    env = {}

    def read(atom):
        if isinstance(atom, jex_core.Literal):
            return _kconst(jnp.asarray(atom.val))
        return env[atom]

    for var, const in zip(jaxpr.constvars, consts):
        env[var] = _kconst(const)
    for var, arg in zip(jaxpr.invars, args):
        env[var] = arg

    table = _elementwise_table()
    for eqn in jaxpr.eqns:
        prim = eqn.primitive
        invals = [read(x) for x in eqn.invars]
        if all(v.jac is None for v in invals):
            outs = prim.bind(*[v.x for v in invals], **eqn.params)
            outs = outs if prim.multiple_results else [outs]
            outs = [_kconst(o) for o in outs]
        elif prim.name == 'dot_general':
            outs = _rule_dot_general(eqn, invals, k)
        elif prim.name in ('add', 'add_any'):
            outs = _rule_add_sub(eqn, invals, k, 1.0)
        elif prim.name == 'sub':
            outs = _rule_add_sub(eqn, invals, k, -1.0)
        elif prim.name == 'mul':
            outs = _rule_mul(eqn, invals, k)
        elif prim.name in table:
            outs = _rule_elementwise(prim.name, eqn, invals, k)
        elif prim.name in ('pjit', 'jit', 'closed_call'):
            sub = eqn.params['jaxpr']
            heads = _mha_heads(eqn.params.get('name'))
            if heads is not None:
                outs = _rule_mha_flat(invals, k, heads)
            else:
                outs = _interpret_kernel(
                    sub.jaxpr, [*map(jnp.asarray, sub.consts)], invals, k
                )
        elif prim.name in _PIECEWISE_LINEAR:
            outs = _rule_linear_bind(eqn, invals, k)
        else:
            raise Unsupported(f'primitive {prim.name} not fusable in-kernel')
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for var, out in zip(eqn.outvars, outs):
            env[var] = out

    return [read(v) for v in jaxpr.outvars]


def block_jaxpr_supported(closed_jaxpr, var_mask):
    """Dry-run the supported-primitives scan with abstract const/varying
    marking; returns True iff the kernel interpreter can lower the block."""

    def scan(jaxpr, varying):
        from jax.extend import core as jex_core

        var = dict(varying)
        table = _elementwise_table()
        for eqn in jaxpr.eqns:
            inv = [
                (not isinstance(x, jex_core.Literal)) and var.get(x, False)
                for x in eqn.invars
            ]
            name = eqn.primitive.name
            out_varying = any(inv)
            if out_varying:
                if name == 'dot_general':
                    a, b = inv
                    ((lc, rc), (lb, rb)) = eqn.params['dimension_numbers']
                    if b or not a or lb or rb or rc != (0,):
                        return False
                    if lc != (eqn.invars[0].aval.ndim - 1,):
                        return False
                elif name in ('pjit', 'jit', 'closed_call'):
                    if _mha_heads(eqn.params.get('name')) is None:
                        sub = eqn.params['jaxpr']
                        sub_var = {
                            v: b for v, b in zip(sub.jaxpr.invars, inv)
                        }
                        if not scan(sub.jaxpr, sub_var):
                            return False
                elif name in ('add', 'add_any', 'sub', 'mul'):
                    pass
                elif name in table:
                    pass
                elif name in _PIECEWISE_LINEAR:
                    out_shape = eqn.outvars[0].aval.shape
                    in_shapes = [
                        x.aval.shape
                        for x, b in zip(eqn.invars, inv)
                        if b and not isinstance(x, jex_core.Literal)
                    ]
                    if sum(1 for b in inv if b) != 1:
                        return False
                    if in_shapes[0] != out_shape:
                        return False
                else:
                    return False
            for v in eqn.outvars:
                var[v] = out_varying
        return True

    jaxpr = closed_jaxpr.jaxpr
    varying = {v: m for v, m in zip(jaxpr.invars, var_mask)}
    return scan(jaxpr, varying)


# --- pallas plumbing ---------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=('jaxpr_fn', 'var_idx', 'k', 'interpret')
)
def _pallas_block(jaxpr_fn, var_idx, k, x, jac, lap, *consts, interpret=False):
    """consts = the block's non-varying pjit operands followed by its jaxpr
    consts (closure-captured parameters), scalars lifted to rank-1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    closed_jaxpr, n_eqn_consts, scalar_mask = jaxpr_fn()
    B = x.shape[0]
    W = min(WALKER_BLOCK, B)
    pad = (-B) % W
    if pad:
        padb = lambda t: jnp.pad(t, [(0, pad)] + [(0, 0)] * (t.ndim - 1))
        x, jac, lap = padb(x), padb(jac), padb(lap)
    Bp = x.shape[0]
    n_blocks = Bp // W

    vmem = pltpu.VMEM

    def wspec(shape):
        return pl.BlockSpec(
            (W, *shape[1:]),
            lambda i: (i, *(0,) * (len(shape) - 1)),
            memory_space=vmem,
        )

    def fullspec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=vmem
        )

    out_aval = closed_jaxpr.jaxpr.outvars[0].aval

    def kernel(x_ref, jac_ref, lap_ref, *rest):
        eqn_refs = rest[:n_eqn_consts]
        jc_refs = rest[n_eqn_consts : len(consts)]
        xo_ref, jo_ref, lo_ref = rest[len(consts):]
        inval = KVal(x_ref[:], jac_ref[:], lap_ref[:])
        args = [_kconst(r[:]) for r in eqn_refs]
        args.insert(var_idx, inval)  # jaxpr invar order
        jconsts = [
            r[0] if is_scalar else r[:]
            for r, is_scalar in zip(jc_refs, scalar_mask)
        ]
        (out,) = _interpret_kernel(closed_jaxpr.jaxpr, jconsts, args, k)
        xo_ref[:] = out.x
        jo_ref[:] = _jac_of(out, k)
        lo_ref[:] = _lap_of(out)

    xo, jo, lo = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, *out_aval.shape), x.dtype),
            jax.ShapeDtypeStruct((Bp, k, *out_aval.shape), x.dtype),
            jax.ShapeDtypeStruct((Bp, *out_aval.shape), x.dtype),
        ),
        in_specs=[
            wspec(x.shape),
            wspec(jac.shape),
            wspec(lap.shape),
            *(fullspec(c.shape) for c in consts),
        ],
        out_specs=(
            wspec((Bp, *out_aval.shape)),
            wspec((Bp, k, *out_aval.shape)),
            wspec((Bp, *out_aval.shape)),
        ),
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                'compiler_params': pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',),
                    vmem_limit_bytes=100 * 1024 * 1024,
                )
            }
        ),
    )(x, jac, lap, *consts)
    if pad:
        xo, jo, lo = xo[:B], jo[:B], lo[:B]
    return xo, jo, lo


def block_fl_call(
    closed_jaxpr, k, var_idx, x, jac, lap, consts, interpret=False
):
    """FL of one named block for a WALKER BATCH via one blocked pallas_call.

    ``x``/``lap`` are [B, *s], ``jac`` is [B, k, *s] — the FL triple of the
    block's single varying input (position ``var_idx`` among the jaxpr's
    invars); ``consts`` are the remaining (non-varying, unbatched) inputs.
    The jaxpr's own consts (closure-captured parameters — concrete arrays
    or outer-trace tracers alike) ride along as extra kernel inputs.
    Returns the FL triple of the block's single output.
    """
    jconsts = [jnp.asarray(c) for c in closed_jaxpr.consts]
    scalar_mask = tuple(c.ndim == 0 for c in jconsts)
    jconsts = [c[None] if c.ndim == 0 else c for c in jconsts]
    n_eqn_consts = len(consts)

    def jaxpr_fn():
        return closed_jaxpr, n_eqn_consts, scalar_mask

    return _pallas_block(
        jaxpr_fn,
        var_idx,
        k,
        x,
        jac,
        lap,
        *consts,
        *jconsts,
        interpret=interpret,
    )
