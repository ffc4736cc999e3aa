"""Fused forward-Laplacian attention core.

The trace-profiled eloc hot spot (scripts/trace_eloc.py) is the attention
softmax core under the forward-Laplacian: every elementwise op and tiny
matmul on the ``[walker, 3N, head, elec, elec|head_dim]`` Jacobian channel
round-trips ~630 MB through HBM, making the local energy HBM-bandwidth
bound.  This module computes the whole core — logits, softmax, attention
application — for the (value, Jacobian, Laplacian) triple of a BLOCK of
walkers in a single Pallas program, so Jacobian intermediates live in VMEM
and HBM sees only the kernel's inputs and outputs.

Implementations of the same math:

- :func:`mha_core_fl` — pure jnp einsums; the CPU/f64 path and the
  correctness oracle (tests pin it against the generic fwdlap rules and a
  nested-autodiff Laplacian);
- :func:`_mha_core_fl_2d` — the kernel body: per-head walker-batched 2-D
  ``dot_general``s only (multi-dimensional contractions and minor-dim
  reshapes are not implemented by the TPU Mosaic backend);
- :func:`mha_core_fl_tpu` — ``custom_vmap`` wrapper: vmapping over walkers
  dispatches to one ``pallas_call`` whose grid tiles the walker axis in
  blocks of :data:`WALKER_BLOCK`.

The forward-Laplacian rules mirror deepqmc_tpu/fwdlap.py exactly: the dot
rule for q k^T and a v (first/cross/second-order terms), the exp closed
form, and the div rule for the softmax normalization, with the numerically
stabilizing max-shift under ``stop_gradient`` (a constant shift leaves all
derivatives of softmax unchanged).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['mha_core_fl', 'mha_core_fl_tpu']

# walkers per Pallas program; VMEM use is ~10 jac-sized [K, n, dm] buffers
# per walker (~3 MB at K=30, n=10, dm=256, f32) plus double buffering
import os as _os

WALKER_BLOCK = int(_os.environ.get('DEEPQMC_TPU_ATTN_WALKER_BLOCK', '1'))


def _softmax_fl(z, Jz, Lz, k_axis):
    """softmax over the last axis of ``z`` with jac/lap channels.

    ``Jz`` carries the Laplacian-direction axis at position ``k_axis``;
    ``z``/``Lz`` lack that axis.
    """
    m = z - jax.lax.stop_gradient(z.max(axis=-1, keepdims=True))
    e = jnp.exp(m)
    e_k = jnp.expand_dims(e, k_axis)
    Je = e_k * Jz
    Le = e * (Lz + (Jz**2).sum(axis=k_axis))
    s = e.sum(axis=-1, keepdims=True)
    Js = Je.sum(axis=-1, keepdims=True)
    Ls = Le.sum(axis=-1, keepdims=True)
    inv_s = 1.0 / s
    a = e * inv_s
    Ja = (Je - jnp.expand_dims(a, k_axis) * Js) * jnp.expand_dims(inv_s, k_axis)
    La = (
        (Le - a * Ls) * inv_s
        - 2 * inv_s**2 * (Je * Js).sum(axis=k_axis)
        + 2 * a * inv_s**2 * (Js**2).sum(axis=k_axis)
    )
    return a, Ja, La


def mha_core_fl(q, k, v, Jq, Jk, Jv, Lq, Lk, Lv):
    """(attended, J, L) of softmax(q k^T / sqrt(dh)) v for ONE walker.

    Shapes: primals [n, H, dh]; Jacobians [K, n, H, dh] with K the number of
    Laplacian directions (3N electron coordinates); Laplacians like primals.
    Returns the attended values in [n, H, dh] layout with matching channels.
    """
    scale = jnp.asarray(1.0, q.dtype) / jnp.sqrt(
        jnp.asarray(q.shape[-1], q.dtype)
    )
    z = jnp.einsum('ihd,jhd->hij', q, k) * scale
    Jz = (
        jnp.einsum('Kihd,jhd->Khij', Jq, k)
        + jnp.einsum('ihd,Kjhd->Khij', q, Jk)
    ) * scale
    Lz = (
        jnp.einsum('ihd,jhd->hij', Lq, k)
        + jnp.einsum('ihd,jhd->hij', q, Lk)
        + 2 * jnp.einsum('Kihd,Kjhd->hij', Jq, Jk)
    ) * scale
    a, Ja, La = _softmax_fl(z, Jz, Lz, k_axis=0)
    t = jnp.einsum('hij,jhd->ihd', a, v)
    Jt = jnp.einsum('Khij,jhd->Kihd', Ja, v) + jnp.einsum(
        'hij,Kjhd->Kihd', a, Jv
    )
    Lt = (
        jnp.einsum('hij,jhd->ihd', La, v)
        + jnp.einsum('hij,jhd->ihd', a, Lv)
        + 2 * jnp.einsum('Khij,Kjhd->ihd', Ja, Jv)
    )
    return t, Jt, Lt


def _bmm(a, b, contract, low=False):
    """Walker-batched matmul: contract one dim, batch the leading dim.

    Precision is pinned to HIGHEST (true f32): Mosaic only lowers
    DEFAULT/HIGHEST, so the kernel must not inherit a global 'high' default,
    and the attention logits/Laplacian cross terms want full f32 anyway.

    ``low=True`` (jac-channel contractions under the
    ``DEEPQMC_TPU_JAC_MATMUL=bf16`` lever): both operands truncate to bf16
    and the MXU runs ONE native bf16 pass with f32 accumulation instead of
    the 6-pass f32 decomposition — the jac values were bf16 in HBM anyway.
    """
    if low:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            ((contract[0], contract[1]), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mha_core_fl_2d(q, k, v, Jq, Jk, Jv, Lq, Lk, Lv):
    """Walker-batched kernel body; Mosaic-compatible ops only.

    Shapes: primals [W, n, H, dh]; Jacobians [W, K, n, H, dh].  All
    contractions are single-dim ``dot_general``s batched over the walker
    block W; reshapes merge/split only major dims; transposes touch either
    minor pairs or [.., K, n, n]-sized arrays.
    """
    W, n, H, dh = q.shape
    K = Jq.shape[1]
    per_head = _make_head_fn(W, n, K, dh, q.dtype)
    ts, jts, lts = [], [], []
    for h in range(H):
        t, jt, lt = per_head(
            q[:, :, h], k[:, :, h], v[:, :, h],
            Jq[..., h, :], Jk[..., h, :], Jv[..., h, :],
            Lq[:, :, h], Lk[:, :, h], Lv[:, :, h],
        )
        ts.append(t)
        jts.append(jt)
        lts.append(lt)
    t = jnp.stack(ts, axis=2)  # [W, n, H, dh]
    jt = jnp.stack(jts, axis=3)  # [W, K, n, H, dh]
    lt = jnp.stack(lts, axis=2)
    return t, jt, lt


def _jac_bmm_low(dtype) -> bool:
    """Native-bf16 MXU mode for the K-scaled jac contractions (f32 only)."""
    from ..fwdlap import _jac_matmul_bf16

    return _jac_matmul_bf16() and jnp.dtype(dtype) == jnp.float32


def _make_head_fn(W, n, K, dh, dtype):
    scale = jnp.asarray(1.0, dtype) / jnp.sqrt(jnp.asarray(dh, dtype))
    low = _jac_bmm_low(dtype)

    def bcast(x):
        """[W, n, d] -> [W*K, n, d]: replicate the primal per direction."""
        return jnp.broadcast_to(x[:, None], (W, K, *x.shape[1:])).reshape(
            W * K, *x.shape[1:]
        )

    def per_head(qh, kh, vh, jqh, jkh, jvh, lqh, lkh, lvh):
        # every contraction is a (W- or W*K-)batched single-dim dot_general;
        # primals are broadcast across the direction axis so NO transposes
        # (Mosaic relayouts dominated earlier formulations) appear at all.
        # The K-scaled jac contractions (the kernel's FLOPs bulk) run in
        # native bf16 under the jac-matmul lever; primal/Laplacian dots
        # (1/K of the work) stay full f32.
        q_b, k_b, v_b = bcast(qh), bcast(kh), bcast(vh)
        jq_m = jqh.reshape(W * K, n, dh)
        jk_m = jkh.reshape(W * K, n, dh)
        jv_m = jvh.reshape(W * K, n, dh)

        jq_f = jqh.reshape(W, K * n, dh)

        z = _bmm(qh, kh, ((2,), (2,))) * scale  # [W, i, j]
        jz = (
            _bmm(jq_f, kh, ((2,), (2,)), low).reshape(W, K, n, n)
            + _bmm(q_b, jk_m, ((2,), (2,)), low).reshape(W, K, n, n)
        ) * scale
        cross_z = _bmm(jq_m, jk_m, ((2,), (2,)), low).reshape(W, K, n, n).sum(1)
        lz = (
            _bmm(lqh, kh, ((2,), (2,)))
            + _bmm(qh, lkh, ((2,), (2,)))
            + 2 * cross_z
        ) * scale

        a, ja, la = _softmax_fl(z, jz, lz, k_axis=1)
        a_b = bcast(a)
        ja_m = ja.reshape(W * K, n, n)

        t = _bmm(a, vh, ((2,), (1,)))  # [W, i, d]
        jt = (
            _bmm(ja.reshape(W, K * n, n), vh, ((2,), (1,)), low).reshape(
                W, K, n, dh
            )
            + _bmm(a_b, jv_m, ((2,), (1,)), low).reshape(W, K, n, dh)
        )
        cross_t = _bmm(ja_m, jv_m, ((2,), (1,)), low).reshape(W, K, n, dh).sum(1)
        lt = (
            _bmm(la, vh, ((2,), (1,)))
            + _bmm(a, lvh, ((2,), (1,)))
            + 2 * cross_t
        )
        return t, jt, lt

    return per_head


def _make_head_fn_kron(W, n, K, dh, dtype):
    """Per-head FL attention with K folded into GEMM dimensions.

    The straightforward formulation (:func:`_make_head_fn`) batches most
    contractions over W*K, which Mosaic lowers to a LOOP of [n, dh]-sized
    matmuls — per-iteration MXU latency dominates at n=10.  Here every
    K-bearing contraction is ONE chunky GEMM per walker in "row form"
    ([(k,i), cols]), using three structural constants:

    - ``tile_v(X)``: K row-stacked copies ([n, c] -> [K*n, c]),
    - ``tile_h(X)``: K lane-stacked copies ([r, n] -> [r, K*n]),
    - ``mask_bd``: the [K*n, K*n] block-diagonal indicator,

    so e.g. ``q @ Jk[k]^T`` for all k is the block-diagonal part of
    ``tile_v(q) @ Jk_flat^T`` followed by a column-block sum (one GEMM with
    the summation matrix T1), at ~K/2x FLOP inflation on the [K*n, K*n]
    products.

    MEASURED (v5e, H2O psiformer eloc): 635-650 ms vs 504 ms for the loop
    form at walker blocks 1/4/8 — the FLOP inflation loses to the loop
    form's latency; kept opt-in (DEEPQMC_TPU_ATTN_KRON=1) as the starting
    point for a masked-GEMM variant if Mosaic grows one.
    """
    scale = jnp.asarray(1.0, dtype) / jnp.sqrt(jnp.asarray(dh, dtype))
    # structural constants from iota (no captured const arrays in-kernel)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (K * n, K * n), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (K * n, K * n), 1)
    mask_bd = (iota_r // n == iota_c // n).astype(dtype)
    t1 = (
        jax.lax.broadcasted_iota(jnp.int32, (K * n, n), 0) % n
        == jax.lax.broadcasted_iota(jnp.int32, (K * n, n), 1)
    ).astype(dtype)  # [K*n, n]: K row-stacked identities

    def tile_v(x):  # [W, n, c] -> [W, K*n, c]
        return jnp.concatenate([x] * K, axis=1)

    def tile_h(x):  # [W, r, n] -> [W, r, K*n]
        return jnp.concatenate([x] * K, axis=2)

    def bdot(x, y, transpose_rhs=False):
        c = (2,) if transpose_rhs else (1,)
        return jax.lax.dot_general(
            x, y, (((2,), c), ((0,), (0,))),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def sum_col_blocks(g):  # [W, r, K*n] -> [W, r, n], sum over k of blocks
        return bdot(g, jnp.broadcast_to(t1, (W, K * n, n)))

    def sum_row_blocks(g):  # [W, K*n, c] -> [W, n, c]
        return bdot(
            jnp.broadcast_to(t1.T[None], (W, n, K * n)), g
        )

    def ksum(x_row):  # [W, K*n, c] -> [W, n, c] elementwise-sum over k
        return x_row.reshape(W, K, n, -1).sum(axis=1)

    def per_head(qh, kh, vh, jqh, jkh, jvh, lqh, lkh, lvh):
        jq_f = jqh.reshape(W, K * n, dh)
        jk_f = jkh.reshape(W, K * n, dh)
        jv_f = jvh.reshape(W, K * n, dh)

        z = bdot(qh, kh, transpose_rhs=True) * scale  # [W, n, n]
        # jz row form [(k,i), j]
        jz1 = bdot(jq_f, kh, transpose_rhs=True)  # [W, K*n, n]
        g = bdot(tile_v(qh), jk_f, transpose_rhs=True)  # [W, K*n, K*n]
        jz2 = sum_col_blocks(g * mask_bd)
        jz = (jz1 + jz2) * scale
        # lz = Lq k^T + q Lk^T + 2 sum_k Jq[k] Jk[k]^T
        g2 = bdot(jq_f, jk_f, transpose_rhs=True)  # [W, K*n, K*n]
        cross_z = sum_row_blocks(sum_col_blocks(g2 * mask_bd))
        lz = (
            bdot(lqh, kh, transpose_rhs=True)
            + bdot(qh, lkh, transpose_rhs=True)
            + 2.0 * cross_z
        ) * scale

        # softmax FL in row form
        m = z - jax.lax.stop_gradient(z.max(axis=-1, keepdims=True))
        e = jnp.exp(m)
        s = e.sum(axis=-1, keepdims=True)
        inv_s = 1.0 / s
        a = e * inv_s
        je = tile_v(e) * jz  # [W, K*n, n]
        ls_term = lz + ksum(jz * jz)
        le = e * ls_term
        js = je.sum(axis=-1, keepdims=True)  # [W, K*n, 1]
        ls = le.sum(axis=-1, keepdims=True)  # [W, n, 1]
        ja = (je - tile_v(a) * js) * tile_v(inv_s)
        # the k-sums here go through sum_row_blocks (a GEMM with the T1
        # summation matrix): the reshape-based ksum on lane-1 [W, K*n, 1]
        # arrays trips Mosaic's unimplemented lane-broadcast path
        la = (
            (le - a * ls) * inv_s
            - 2.0 * inv_s**2 * sum_row_blocks(je * js)
            + 2.0 * a * inv_s**2 * sum_row_blocks(js * js)
        )

        t = bdot(a, vh)  # [W, n, dh]
        jt = bdot(ja, vh) + bdot(tile_v(tile_h(a)) * mask_bd, jv_f)
        qq = tile_h(ja) * mask_bd  # [W, K*n, K*n]
        cross_t = sum_row_blocks(bdot(qq, jv_f))
        lt = bdot(la, vh) + bdot(a, lvh) + 2.0 * cross_t
        return t, jt.reshape(W, K, n, dh), lt

    return per_head


def _make_head_fn_colform(W, n, K, dh, dtype):
    """Per-head FL attention with NO batch-W*K contractions.

    Mosaic lowers a batched ``dot_general`` to a serial loop over the batch
    (~8 ns/iteration — scripts/probe_vpu_contract.py), so the W*K-batched
    forms in :func:`_make_head_fn` cost ~240 iterations each.  Here every
    contraction is batch-W with the K directions row- or column-stacked
    into the GEMM shape ([K*n, dh] x [dh, n] and friends), and the form
    conversions (row <-> col) are per-direction static lane/sublane slices
    + concats of VMEM-resident blocks — the pattern proven to legalize in
    ops/fl_slogdet.py's column-stacked kernel.
    """
    scale = jnp.asarray(1.0, dtype) / jnp.sqrt(jnp.asarray(dh, dtype))

    def k_blocks(x, axis_from, size):
        """Static per-direction slices [K x block] along ``axis_from``."""
        blocks = []
        for k in range(K):
            idx_lo = [0] * x.ndim
            idx_hi = list(x.shape)
            idx_lo[axis_from] = k * size
            idx_hi[axis_from] = (k + 1) * size
            blocks.append(jax.lax.slice(x, idx_lo, idx_hi))
        return blocks

    def squeeze1(x, axis):
        return x.reshape(*x.shape[:axis], *x.shape[axis + 1:])

    def per_head(qh, kh, vh, jqh, jkh, jvh, lqh, lkh, lvh):
        # jqh/jkh/jvh: [W, K, n, dh]
        jq_rows = jqh.reshape(W, K * n, dh)
        jv_rows = jvh.reshape(W, K * n, dh)

        # arrangements: [W, K, n, dh] -> [W, dh, K*n] (transposed col-stack)
        jk_t = jnp.swapaxes(jkh, -1, -2)  # [W, K, dh, n]
        jk_cols_t = jnp.concatenate(
            [squeeze1(b, 1) for b in k_blocks(jk_t, 1, 1)], axis=-1
        )  # [W, dh, K*n]
        # [W, K, n, dh] -> [W, n, K*dh] (direction-major lanes)
        jq_kd = jnp.concatenate(
            [squeeze1(b, 1) for b in k_blocks(jqh, 1, 1)], axis=-1
        )  # [W, n, K*dh]
        jk_kd_rows = jnp.concatenate(
            [squeeze1(b, 1) for b in k_blocks(jk_t, 1, 1)], axis=1
        )  # [W, K*dh, n]
        jv_cols = jnp.concatenate(
            [squeeze1(b, 1) for b in k_blocks(jvh, 1, 1)], axis=-1
        )  # [W, n, K*dh]

        z = _bmm(qh, kh, ((2,), (2,))) * scale  # [W, n, n]
        jz1 = _bmm(jq_rows, kh, ((2,), (2,)))  # [W, K*n, n] row form
        jz2_col = _bmm(qh, jk_cols_t, ((2,), (1,)))  # [W, n, K*n] col form
        # col -> row: per-direction [W, n, n] lane blocks, stacked on rows
        jz2_rows = jnp.concatenate(k_blocks(jz2_col, 2, n), axis=1)
        jz = ((jz1 + jz2_rows) * scale).reshape(W, K, n, n)
        cross_z = _bmm(jq_kd, jk_kd_rows, ((2,), (1,)))  # [W, n, n]
        lz = (
            _bmm(lqh, kh, ((2,), (2,)))
            + _bmm(qh, lkh, ((2,), (2,)))
            + 2 * cross_z
        ) * scale

        a, ja, la = _softmax_fl(z, jz, lz, k_axis=1)  # ja [W, K, n, n]

        t = _bmm(a, vh, ((2,), (1,)))  # [W, n, dh]
        ja_rows = ja.reshape(W, K * n, n)
        jt1 = _bmm(ja_rows, vh, ((2,), (1,)))  # [W, K*n, dh]
        jt2_col = _bmm(a, jv_cols, ((2,), (1,)))  # [W, n, K*dh]
        jt2_rows = jnp.concatenate(k_blocks(jt2_col, 2, dh), axis=1)
        jt = (jt1 + jt2_rows).reshape(W, K, n, dh)
        # cross_t: joint (k, j) contraction — Ja col-stacked along lanes
        ja_col = jnp.concatenate(
            [squeeze1(b, 1) for b in k_blocks(ja, 1, 1)], axis=-1
        )  # [W, n, K*n]
        cross_t = _bmm(ja_col, jv_rows, ((2,), (1,)))  # [W, n, dh]
        lt = (
            _bmm(la, vh, ((2,), (1,)))
            + _bmm(a, lvh, ((2,), (1,)))
            + 2 * cross_t
        )
        return t, jt, lt

    return per_head


def _head_fn_factory():
    if _os.environ.get('DEEPQMC_TPU_ATTN_KRON'):
        return _make_head_fn_kron
    if _os.environ.get('DEEPQMC_TPU_ATTN_COLFORM'):
        return _make_head_fn_colform
    return _make_head_fn


def _kernel(q_ref, k_ref, v_ref, jq_ref, jk_ref, jv_ref, lq_ref, lk_ref,
            lv_ref, t_ref, jt_ref, lt_ref):
    # one head at a time, written straight to the output refs, to keep the
    # kernel's peak VMEM at a single head's working set
    W, n, H, dh = q_ref.shape
    K = jq_ref.shape[1]
    ct = q_ref.dtype  # compute dtype; jac operands may arrive bf16-stored
    # upcast the whole jac block once after the VMEM load: Mosaic's 16-bit
    # layouts do not support the unit-dim shape casts the per-head slicing
    # performs, and a single bf16->f32 extend is cheaper than H of them
    jq = jq_ref[...].astype(ct)
    jk = jk_ref[...].astype(ct)
    jv = jv_ref[...].astype(ct)
    per_head = _head_fn_factory()(W, n, K, dh, ct)
    for h in range(H):
        t, jt, lt = per_head(
            q_ref[:, :, h], k_ref[:, :, h], v_ref[:, :, h],
            jq[:, :, :, h], jk[:, :, :, h], jv[:, :, :, h],
            lq_ref[:, :, h], lk_ref[:, :, h], lv_ref[:, :, h],
        )
        t_ref[:, :, h, :] = t
        jt_ref[:, :, :, h, :] = jt
        lt_ref[:, :, h, :] = lt


@functools.partial(jax.jit, static_argnames=('interpret',))
def _pallas_blocked(q, k, v, Jq, Jk, Jv, Lq, Lk, Lv, interpret=False):
    """Walker-batched pallas_call: grid tiles the leading walker axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = q.shape[0]
    W = min(WALKER_BLOCK, B)
    pad = (-B) % W
    if pad:
        padding = [(0, pad)] + [(0, 0)] * (q.ndim - 1)
        jpad = [(0, pad)] + [(0, 0)] * (Jq.ndim - 1)
        q, k, v = (jnp.pad(x, padding) for x in (q, k, v))
        Jq, Jk, Jv = (jnp.pad(x, jpad) for x in (Jq, Jk, Jv))
        Lq, Lk, Lv = (jnp.pad(x, padding) for x in (Lq, Lk, Lv))
    n_blocks = q.shape[0] // W

    def pspec(shape):
        return pl.BlockSpec(
            (W, *shape[1:]),
            lambda i: (i, *(0,) * (len(shape) - 1)),
            memory_space=pltpu.VMEM,
        )

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        # jac OUTPUT stays in the compute dtype: Mosaic cannot shape-cast
        # 16-bit stores across the per-head unit dim; the bf16-jac mode
        # downcasts outside, where XLA fuses the convert into consumers
        jax.ShapeDtypeStruct(Jq.shape, q.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
    )
    t, jt, lt = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=[pspec(x.shape) for x in (q, k, v, Jq, Jk, Jv, Lq, Lk, Lv)],
        out_specs=(pspec(q.shape), pspec(Jq.shape), pspec(q.shape)),
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
    )(q, k, v, Jq, Jk, Jv, Lq, Lk, Lv)
    if pad:
        t, jt, lt = t[:B], jt[:B], lt[:B]
    return t, jt, lt


@jax.custom_batching.custom_vmap
def mha_core_fl_tpu(q, k, v, Jq, Jk, Jv, Lq, Lk, Lv):
    """Pallas (VMEM-resident) version of :func:`mha_core_fl`, one walker.

    vmapping over walkers dispatches to the blocked pallas_call so each
    program handles :data:`WALKER_BLOCK` walkers.
    """
    t, jt, lt = _pallas_blocked(
        q[None], k[None], v[None],
        Jq[None], Jk[None], Jv[None],
        Lq[None], Lk[None], Lv[None],
    )
    return t[0], jt[0], lt[0]


@mha_core_fl_tpu.def_vmap
def _mha_core_fl_tpu_vmap(axis_size, in_batched, *args):
    assert all(in_batched), 'all attention core inputs must be walker-batched'
    out = _pallas_blocked(*args)
    return out, (True, True, True)
