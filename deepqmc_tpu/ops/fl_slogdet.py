"""Fused forward-Laplacian log-determinant kernel.

Trace profiling (scripts/precision_eloc.py --trace) shows the eloc is
dominated by XLA memory-space copies around the determinant path: the
rule's ``m = A^-1 J_k`` intermediate ([walker, 3N, n_det, n, n] — hundreds
of MB) round-trips HBM, and the [walker, 3N, n_det, n, n] Jacobian channel
gets relayouted (multi-ms async copies each) on entry and exit of the
einsum chain.  This kernel computes the contraction-heavy tail of the
slogdet forward-Laplacian rule

    J_k log|det A| = tr(A^-1 J_k),
    L log|det A|   = tr(A^-1 L_A) - sum_k tr((A^-1 J_k)^2)

for a BLOCK of walkers inside one Pallas program: the trace terms are
walker-batched single-contraction ``dot_general``s (Mosaic-compatible, as
in ops/fl_attention.py) over VMEM-resident blocks, so HBM sees only
A^-1/J/L in and the tiny per-det outputs out — no ``m`` tensor, no
relayouts.  The inverse/sign/logdet themselves are O(n^3) on tiny
matrices and stay on the existing XLA path (ops/linalg_small.py); a
pivoted elimination inside the kernel does not legalize in Mosaic
(argmax/f32->i32 materialization).

``slogdet_fl`` is the pure-jnp twin (CPU/f64 path and correctness oracle);
``slogdet_fl_tpu`` is the ``custom_vmap`` wrapper dispatching walker batches
to the blocked ``pallas_call``.
"""

import functools

import jax
import jax.numpy as jnp

from .linalg_small import inv_small, slogdet_small

__all__ = [
    'slogdet_fl',
    'slogdet_fl_tpu',
    'slogdet_fl_split',
    'slogdet_fl_split_tpu',
    'slogdet_fl_flat',
    'slogdet_fl_flat_split',
    'slogdet_fl_flat_tpu',
    'slogdet_fl_flat_split_tpu',
]

WALKER_BLOCK = 8


def slogdet_fl(a, ja, la):
    """FL rule for slogdet of ONE walker: a [D,n,n], ja [K,D,n,n], la [D,n,n].

    Returns (sign [D], logdet [D], j_logdet [K,D], l_logdet [D]); the math
    mirrors fwdlap._slogdet_rule exactly.
    """
    sign, logdet = slogdet_small(a)
    inv_a = inv_small(a)
    jout = jnp.einsum('dij,kdji->kd', inv_a, ja)
    m = jnp.einsum('dij,kdjl->kdil', inv_a, ja)
    lout = jnp.einsum('dij,dji->d', inv_a, la) - jnp.einsum(
        'kdij,kdji->d', m, m
    )
    return sign, logdet, jout, lout


def _bmm(x, y, contract):
    """Batched (leading-dim) single-contraction dot, full-f32 on the MXU."""
    return jax.lax.dot_general(
        x, y, ((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(inv_ref, invt_ref, j_ref, l_ref, jout_ref, lout_ref):
    # one (walker-block, determinant) pair per program — the grid walks the
    # determinant axis so the working set stays a few MB of VMEM; every
    # intermediate stays rank>=2 (rank-1 vectors crash this Mosaic
    # toolchain, layout.h implicit_dim check)
    W, _, n, _ = inv_ref.shape
    K = j_ref.shape[1]
    eye = jnp.eye(n, dtype=inv_ref.dtype)
    inv_d = inv_ref[:, 0]  # [W, n, n]
    # tr(A^-1 L_A) = sum_ij (A^-T * L_A)_ij — elementwise on the VPU
    lout_d = (
        (invt_ref[:, 0] * l_ref[:, 0]).sum(axis=2).sum(axis=1, keepdims=True)
    )  # [W, 1]
    # fold K into the leading batch dim (leading-dim reshapes are the only
    # shape casts Mosaic supports; minor-dim merges are not)
    j_d = j_ref[:, :, 0].reshape(W * K, n, n).astype(inv_ref.dtype)
    inv_rep = jnp.broadcast_to(inv_d[:, None], (W, K, n, n)).reshape(
        W * K, n, n
    )
    m = _bmm(inv_rep, j_d, ((2,), (1,)))  # [W*K, n, n] = A^-1 J_k
    jout_ref[0] = (m * eye).sum(axis=2).reshape(W, K, n).sum(axis=2)
    # sum_k tr(m_k m_k) via one more batched GEMM (k in the batch dim)
    q = _bmm(m, m, ((2,), (1,)))
    tr_q = (
        (q * eye).sum(axis=2).reshape(W, K, n).sum(axis=2).sum(
            axis=1, keepdims=True
        )
    )  # [W, 1]
    lout_ref[0] = lout_d - tr_q


@functools.partial(jax.jit, static_argnames=('interpret',))
def _pallas_blocked(a, ja, la, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, n, _ = a.shape
    K = ja.shape[1]
    sign, logdet = slogdet_small(a)
    inv_a = inv_small(a)
    inv_t = jnp.swapaxes(inv_a, -1, -2)

    W = min(WALKER_BLOCK, B)
    pad = (-B) % W
    if pad:
        padb = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        inv_a, inv_t, ja, la = map(padb, (inv_a, inv_t, ja, la))
    n_blocks = inv_a.shape[0] // W
    Bp = inv_a.shape[0]

    vmem = pltpu.VMEM
    mat_spec = pl.BlockSpec(
        (W, 1, n, n), lambda i, d: (i, d, 0, 0), memory_space=vmem
    )
    jac_spec = pl.BlockSpec(
        (W, K, 1, n, n), lambda i, d: (i, 0, d, 0, 0), memory_space=vmem
    )
    # outputs carry D leading (the last two block dims must be full or
    # (8,128)-divisible); transposed back after the call — they are tiny
    jout, lout = pl.pallas_call(
        _kernel,
        grid=(n_blocks, D),
        out_shape=(
            jax.ShapeDtypeStruct((D, Bp, K), a.dtype),  # jac
            jax.ShapeDtypeStruct((D, Bp, 1), a.dtype),  # lap
        ),
        in_specs=[mat_spec, mat_spec, jac_spec, mat_spec],
        out_specs=(
            pl.BlockSpec(
                (1, W, K), lambda i, d: (d, i, 0), memory_space=vmem
            ),
            pl.BlockSpec(
                (1, W, 1), lambda i, d: (d, i, 0), memory_space=vmem
            ),
        ),
        interpret=interpret,
    )(inv_a, inv_t, ja, la)
    jout = jnp.transpose(jout, (1, 2, 0))  # [Bp, K, D]
    lout = jnp.transpose(lout[..., 0], (1, 0))  # [Bp, D]
    if pad:
        jout, lout = jout[:B], lout[:B]
    return sign, logdet, jout, lout


def slogdet_fl_split(a, ju, jd, la):
    """:func:`slogdet_fl` with the Jacobian in row blocks (jnp twin).

    ``a``/``la`` are the full [D,n,n] matrices; ``ju``/``jd`` carry the
    Jacobian of the top/bottom row block ([K,D,nu,n] / [K,D,nd,n]) — the
    layout the full-determinant ansatz produces (up/down orbitals
    concatenated along rows, wf/nn_wave_function.py _determinant_mix).
    """
    return slogdet_fl(a, jnp.concatenate([ju, jd], axis=-2), la)


def _split_kernel(
    il_ref, ir_ref, invt_ref, ju_ref, jd_ref, l_ref, jout_ref, lout_ref
):
    # like _kernel, but m = A^-1 J is accumulated from the two row blocks:
    # m = A^-1[:, :nu] @ J_up + A^-1[:, nu:] @ J_down; the column halves
    # arrive pre-split (il/ir) so no minor-dim slicing happens in-kernel
    W, _, n, nu = il_ref.shape
    nd = ir_ref.shape[3]
    K = ju_ref.shape[1]
    eye = jnp.eye(n, dtype=il_ref.dtype)
    lout_d = (
        (invt_ref[:, 0] * l_ref[:, 0]).sum(axis=2).sum(axis=1, keepdims=True)
    )  # [W, 1]
    ju_d = ju_ref[:, :, 0].reshape(W * K, nu, n).astype(il_ref.dtype)
    jd_d = jd_ref[:, :, 0].reshape(W * K, nd, n).astype(il_ref.dtype)
    il_rep = jnp.broadcast_to(il_ref[:, 0][:, None], (W, K, n, nu)).reshape(
        W * K, n, nu
    )
    ir_rep = jnp.broadcast_to(ir_ref[:, 0][:, None], (W, K, n, nd)).reshape(
        W * K, n, nd
    )
    m = _bmm(il_rep, ju_d, ((2,), (1,))) + _bmm(ir_rep, jd_d, ((2,), (1,)))
    jout_ref[0] = (m * eye).sum(axis=2).reshape(W, K, n).sum(axis=2)
    q = _bmm(m, m, ((2,), (1,)))
    tr_q = (
        (q * eye).sum(axis=2).reshape(W, K, n).sum(axis=2).sum(
            axis=1, keepdims=True
        )
    )  # [W, 1]
    lout_ref[0] = lout_d - tr_q


@functools.partial(jax.jit, static_argnames=('interpret',))
def _pallas_blocked_split(a, ju, jd, la, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, n, _ = a.shape
    K = ju.shape[1]
    nu, nd = ju.shape[3], jd.shape[3]
    sign, logdet = slogdet_small(a)
    inv_a = inv_small(a)
    inv_t = jnp.swapaxes(inv_a, -1, -2)
    inv_l, inv_r = inv_a[..., :nu], inv_a[..., nu:]

    W = min(WALKER_BLOCK, B)
    pad = (-B) % W
    if pad:
        padb = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        inv_l, inv_r, inv_t, ju, jd, la = map(
            padb, (inv_l, inv_r, inv_t, ju, jd, la)
        )
    n_blocks = inv_t.shape[0] // W
    Bp = inv_t.shape[0]

    vmem = pltpu.VMEM

    def mat_spec(cols):
        return pl.BlockSpec(
            (W, 1, n, cols), lambda i, d: (i, d, 0, 0), memory_space=vmem
        )

    def jac_spec(rows):
        return pl.BlockSpec(
            (W, K, 1, rows, n), lambda i, d: (i, 0, d, 0, 0), memory_space=vmem
        )

    jout, lout = pl.pallas_call(
        _split_kernel,
        grid=(n_blocks, D),
        out_shape=(
            jax.ShapeDtypeStruct((D, Bp, K), a.dtype),  # jac
            jax.ShapeDtypeStruct((D, Bp, 1), a.dtype),  # lap
        ),
        in_specs=[
            mat_spec(nu),
            mat_spec(nd),
            mat_spec(n),
            jac_spec(nu),
            jac_spec(nd),
            mat_spec(n),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, W, K), lambda i, d: (d, i, 0), memory_space=vmem
            ),
            pl.BlockSpec(
                (1, W, 1), lambda i, d: (d, i, 0), memory_space=vmem
            ),
        ),
        interpret=interpret,
    )(inv_l, inv_r, inv_t, ju, jd, la)
    jout = jnp.transpose(jout, (1, 2, 0))  # [Bp, K, D]
    lout = jnp.transpose(lout[..., 0], (1, 0))  # [Bp, D]
    if pad:
        jout, lout = jout[:B], lout[:B]
    return sign, logdet, jout, lout


@jax.custom_batching.custom_vmap
def slogdet_fl_split_tpu(a, ju, jd, la):
    """Pallas version of :func:`slogdet_fl_split`; one walker per call, vmap
    for batches (dispatches whole walker batches to one blocked
    pallas_call)."""
    sign, logdet, jout, lout = _pallas_blocked_split(
        a[None], ju[None], jd[None], la[None]
    )
    return sign[0], logdet[0], jout[0], lout[0]


@slogdet_fl_split_tpu.def_vmap
def _slogdet_fl_split_tpu_vmap(axis_size, in_batched, a, ju, jd, la):
    assert all(in_batched), 'all slogdet FL inputs must be walker-batched'
    out = _pallas_blocked_split(a, ju, jd, la)
    return out, (True, True, True, True)


# --- flat-layout variants -----------------------------------------------------
#
# The ansatz assembles orbitals in the flat [n, D * n] det-major column
# layout (ops/slogdet.py slogdet_flat) precisely so the Jacobian channel
# reaching this rule is [K, n, D * n]: near-dense under TPU (8, 128)
# tiling, where the unpacked [K, D, n, n] layout pads its minor (n, n)
# pair ~6x for molecular n ~ 10.  These kernels take the flat Jacobian
# and Laplacian straight from HBM and do the per-determinant unpacking as
# static lane slices on VMEM-resident blocks; only the primal (no K axis,
# ~K times smaller) is unpacked outside for the inverse/logdet.


def _flat_unpack_jac(jf, n_det):
    """[..., K, n, D*n] -> [..., K, D, n, n] (jnp twin / oracle only)."""
    out = jf.reshape(*jf.shape[:-1], n_det, -1)
    return jnp.moveaxis(out, -2, -3)


def slogdet_fl_flat(a_flat, ja_flat, la_flat, n_det):
    """jnp twin of the flat kernel for ONE walker: a_flat [n, D*n],
    ja_flat [K, n, D*n], la_flat [n, D*n] -> as :func:`slogdet_fl`."""
    from .slogdet import unflatten_dets

    return slogdet_fl(
        unflatten_dets(a_flat, n_det),
        _flat_unpack_jac(ja_flat, n_det),
        unflatten_dets(la_flat, n_det),
    )


def slogdet_fl_flat_split(a_flat, ju_flat, jd_flat, la_flat, n_det):
    """Row-blocked jnp twin: ju/jd carry the up/down electron rows."""
    return slogdet_fl_flat(
        a_flat, jnp.concatenate([ju_flat, jd_flat], axis=-2), la_flat, n_det
    )


def _flat_split_kernel(
    invf_ref, invtf_ref, juk_ref, jdk_ref, jout_ref, trq_ref, *, trq_chunk
):
    """ONE program per walker block; all det/direction unpacking in VMEM.

    Inputs (pre-arranged OUTSIDE the kernel — XLA transposes are cheap in
    HBM, Mosaic minor-dim reshapes do not exist):

      invf_ref  [W, n, D*n]      flat inverse (det-major lanes)
      invtf_ref [W, n, D*n]      flat per-det-transposed inverse
      juk_ref   [W, D, nu, K*n]  up-rows Jacobian: det-major leading axis,
                                 direction-major (k, col) lanes
      jdk_ref   [W, D, nd, K*n]  down-rows Jacobian

    Outputs: jout [W, K, D] = tr(A_d^-1 J_k,d);
             trq  [W*D, 1]  = sum_k tr((A_d^-1 J_k,d)^2).

    Mosaic lowers a batched dot_general to a SERIAL loop over the batch at
    ~8 ns/iteration regardless of operand size up to MXU tiles
    (scripts/probe_vpu_contract.py), so the kernel minimizes loop
    iterations, not FLOPs: m = A_d^-1 J_k,d runs as ONE batched GEMM pair
    at batch W*D with all K directions column-stacked in the rhs
    ([n, nu] x [nu, K*n]) — ~60x fewer iterations than batch W*K*D of
    [n, nu] x [nu, n] — and tr(m^2) uses a (legal) minor-pair transpose
    of the per-direction blocks instead of a second GEMM.
    """
    W, n, Dn = invf_ref.shape
    D = Dn // n
    nu = juk_ref.shape[2]
    nd = jdk_ref.shape[2]
    Kn = juk_ref.shape[3]
    K = Kn // n

    # jac operands may arrive in the bf16 storage dtype; upcast after the
    # VMEM load so all kernel math runs in the compute dtype
    juk = juk_ref[...].astype(invf_ref.dtype)
    jdk = jdk_ref[...].astype(invf_ref.dtype)
    invf = invf_ref[...]
    invtf = invtf_ref[...]

    # per-det inverse column blocks, stacked on a leading axis
    il = jnp.stack(
        [
            jax.lax.slice(invf, (0, 0, d * n), (W, n, d * n + nu))
            for d in range(D)
        ],
        axis=1,
    ).reshape(W * D, n, nu)
    ir = jnp.stack(
        [
            jax.lax.slice(invf, (0, 0, d * n + nu), (W, n, (d + 1) * n))
            for d in range(D)
        ],
        axis=1,
    ).reshape(W * D, n, nd)

    # m in column-stacked form: [W*D, n, K*n]
    m_col = _bmm(il, juk.reshape(W * D, nu, Kn), ((2,), (1,))) + _bmm(
        ir, jdk.reshape(W * D, nd, Kn), ((2,), (1,))
    )

    # sum_k tr(m_k^2) = <m_k, m_k^T>: per-k lane slices stacked on a
    # non-minor axis, then a minor-pair transpose + elementwise reduce.
    # The [W*D, kc, n, n] stack tile-pads its minor pair to (8, 128), so it
    # is the VMEM high-water mark at large n*K (ScO/benzene blew the 128M
    # budget here) — accumulate it in direction chunks sized by the planner.
    trq = None
    for k0 in range(0, K, trq_chunk):
        kc = min(trq_chunk, K - k0)
        m_c = jnp.stack(
            [
                jax.lax.slice(
                    m_col, (0, 0, (k0 + j) * n), (W * D, n, (k0 + j + 1) * n)
                )
                for j in range(kc)
            ],
            axis=1,
        )  # [W*D, kc, n, n]
        part = (
            (m_c * jnp.swapaxes(m_c, -1, -2))
            .sum(axis=3)
            .sum(axis=2)
            .sum(axis=1, keepdims=True)
        )  # [W*D, 1]
        trq = part if trq is None else trq + part
    trq_ref[...] = trq

    # jout: tr(A_d^-1 J_k,d) — elementwise against the tiled transposed
    # inverse, per-direction lane-block sums via a [K*n, K] summation GEMM
    t2 = (
        jax.lax.broadcasted_iota(jnp.int32, (Kn, K), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (Kn, K), 1)
    ).astype(invf.dtype)
    jouts = []
    for d in range(D):
        invt_d = jax.lax.slice(invtf, (0, 0, d * n), (W, n, (d + 1) * n))
        iu = jnp.concatenate(
            [jax.lax.slice_in_dim(invt_d, 0, nu, axis=1)] * K, axis=2
        )  # [W, nu, K*n]
        idn = jnp.concatenate(
            [jax.lax.slice_in_dim(invt_d, nu, n, axis=1)] * K, axis=2
        )  # [W, nd, K*n]
        ju_d = jax.lax.slice(
            juk, (0, d, 0, 0), (W, d + 1, nu, Kn)
        ).reshape(W, nu, Kn)
        jd_d = jax.lax.slice(
            jdk, (0, d, 0, 0), (W, d + 1, nd, Kn)
        ).reshape(W, nd, Kn)
        s = (iu * ju_d).sum(axis=1) + (idn * jd_d).sum(axis=1)  # [W, K*n]
        jouts.append(
            jax.lax.dot_general(
                s, t2, (((1,), (0,)), ((), ())),
                preferred_element_type=invf.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
        )  # [W, K]
    jout_ref[...] = jnp.stack(jouts, axis=2)  # [W, K, D]


def _pad_to(x, m):
    return -(-x // m) * m


def _flat_split_vmem_bytes(W, D, n, nu, nd, K, kc, jac_itemsize):
    """Conservative VMEM estimate of one _flat_split_kernel program.

    Models Mosaic's (sublane, lane) tile padding — f32 tiles are (8, 128),
    bf16 (16, 128) — for every tensor the kernel keeps live: the
    double-buffered input windows, the f32 jac upcasts, the per-det inverse
    column stacks, m_col, one trq direction chunk (+ its transpose), and the
    jout loop temporaries.  Calibrated against the ScO failure (est ~217M
    vs the compiler's measured 174.78M for W=8, kc=K): the estimate
    overshoots ~25%, so the 84M default budget keeps the true footprint
    under the 100M request (and leaves the measured H2O production config
    — W=8, unchunked trq, est 83.1M — exactly as benchmarked).
    """
    f32 = 4
    Dn, Kn = _pad_to(D * n, 128), _pad_to(K * n, 128)
    sub_j = 16 if jac_itemsize == 2 else 8
    est = 2 * 2 * W * _pad_to(n, 8) * Dn * f32  # inv/invt windows
    est += (
        2 * 2 * W * D * (_pad_to(nu, sub_j) + _pad_to(nd, sub_j))
        * Kn * jac_itemsize
    )  # jac input windows (double-buffered)
    est += W * D * (_pad_to(nu, 8) + _pad_to(nd, 8)) * Kn * f32  # f32 upcast
    est += (
        W * D * _pad_to(n, 8) * (_pad_to(nu, 128) + _pad_to(nd, 128)) * f32
    )  # il/ir
    est += W * D * _pad_to(n, 8) * Kn * f32  # m_col
    est += 2 * W * D * kc * _pad_to(n, 8) * _pad_to(n, 128) * f32  # trq chunk
    est += 3 * W * (_pad_to(nu, 8) + _pad_to(nd, 8)) * Kn * f32  # jout temps
    return est


def _flat_split_plan(B, D, n, nu, nd, K, jac_itemsize):
    """Pick (walker_block, trq_chunk) fitting the VMEM budget, or None.

    Prefers shrinking the trq chunk (keeps the GEMM batch large) before
    shrinking the walker block; None means even (W=1, kc=1) does not fit
    and the caller must take the unfused XLA path.
    """
    import os

    budget = (
        int(os.environ.get('DEEPQMC_TPU_FL_SLOGDET_VMEM_MB', '84')) * 2**20
    )
    for W in (8, 4, 2, 1):
        W = min(W, B)
        kc = K
        while kc >= 1:
            if _flat_split_vmem_bytes(W, D, n, nu, nd, K, kc, jac_itemsize) <= budget:
                return W, kc
            kc = kc // 2
    return None


@functools.partial(
    jax.jit, static_argnames=('n_det', 'interpret')
)
def _pallas_blocked_flat_split(a_flat, ju, jd, la, n_det, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .linalg_small import inv_flat_small, slogdet_flat_small
    from .slogdet import _flat_transpose

    B, K, nu, _ = ju.shape
    nd = jd.shape[2]
    n = nu + nd
    D = n_det
    plan = _flat_split_plan(B, D, n, nu, nd, K, ju.dtype.itemsize)
    if plan is None:
        # even (W=1, kc=1) overflows VMEM — unfused XLA fallback
        f32 = a_flat.dtype
        return jax.vmap(
            lambda af, juu, jdd, laa: slogdet_fl_flat_split(
                af, juu.astype(f32), jdd.astype(f32), laa, n_det
            )
        )(a_flat, ju, jd, la)
    W, trq_chunk = plan
    # primal linear algebra entirely in the flat layout: the tile-padded
    # [B, D, n, n] tensor is never materialized (12.8x HBM waste at n ~ 10)
    sign, logdet = slogdet_flat_small(a_flat, D)
    inv_flat = inv_flat_small(a_flat, D)  # [B, n, D*n]
    # linear Laplacian term on the flat layout, outside the kernel:
    # tr(A_d^-1 L_d) = sum_{j,i} invT_flat[j, d*n+i] * la_flat[j, d*n+i]
    invt_flat = _flat_transpose(inv_flat, D)
    s_l = (invt_flat * la).sum(axis=-2)  # [B, D*n]
    t1b = (
        jax.lax.broadcasted_iota(jnp.int32, (D * n, D), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (D * n, D), 1)
    ).astype(a_flat.dtype)
    lout_lin = s_l @ t1b  # [B, D]

    def rearrange_dirs(j, rows):
        """[B, K, rows, D*n] -> [B, D, rows, K*n] (det-major leading)."""
        x = j.reshape(B, K, rows, D, n)
        x = jnp.transpose(x, (0, 3, 2, 1, 4))
        return x.reshape(B, D, rows, K * n)

    juk = rearrange_dirs(ju, nu)
    jdk = rearrange_dirs(jd, nd)

    pad = (-B) % W
    if pad:
        padb = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        inv_flat, invt_flat, juk, jdk = map(
            padb, (inv_flat, invt_flat, juk, jdk)
        )
    n_blocks = inv_flat.shape[0] // W
    Bp = inv_flat.shape[0]

    vmem = pltpu.VMEM

    inv_spec = pl.BlockSpec(
        (W, n, D * n), lambda i: (i, 0, 0), memory_space=vmem
    )

    def jac_spec(rows):
        return pl.BlockSpec(
            (W, D, rows, K * n), lambda i: (i, 0, 0, 0), memory_space=vmem
        )

    jout, trq = pl.pallas_call(
        functools.partial(_flat_split_kernel, trq_chunk=trq_chunk),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, K, D), a_flat.dtype),
            jax.ShapeDtypeStruct((Bp * D, 1), a_flat.dtype),
        ),
        in_specs=[inv_spec, inv_spec, jac_spec(nu), jac_spec(nd)],
        out_specs=(
            pl.BlockSpec((W, K, D), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((W * D, 1), lambda i: (i, 0), memory_space=vmem),
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
    )(inv_flat, invt_flat, juk, jdk)
    trq = trq.reshape(Bp, D)
    if pad:
        jout, trq = jout[:B], trq[:B]
    return sign, logdet, jout, lout_lin - trq


def _make_flat_split_tpu(n_det):
    @jax.custom_batching.custom_vmap
    def flat_split_tpu(a_flat, ju, jd, la):
        sign, logdet, jout, lout = _pallas_blocked_flat_split(
            a_flat[None], ju[None], jd[None], la[None], n_det
        )
        return sign[0], logdet[0], jout[0], lout[0]

    @flat_split_tpu.def_vmap
    def _vmap(axis_size, in_batched, a_flat, ju, jd, la):
        assert all(in_batched), 'all slogdet FL inputs must be walker-batched'
        out = _pallas_blocked_flat_split(a_flat, ju, jd, la, n_det)
        return out, (True, True, True, True)

    return flat_split_tpu


_FLAT_SPLIT_TPU_CACHE: dict = {}


def slogdet_fl_flat_split_tpu(a_flat, ju, jd, la, n_det):
    """Pallas flat-layout split kernel; one walker per call, vmap batches."""
    if n_det not in _FLAT_SPLIT_TPU_CACHE:
        _FLAT_SPLIT_TPU_CACHE[n_det] = _make_flat_split_tpu(n_det)
    return _FLAT_SPLIT_TPU_CACHE[n_det](a_flat, ju, jd, la)


def slogdet_fl_flat_tpu(a_flat, ja, la, n_det):
    """Unsplit flat variant: whole-row Jacobian [K, n, D*n]."""
    n = a_flat.shape[-2]
    nu = (n + 1) // 2
    return slogdet_fl_flat_split_tpu(
        a_flat, ja[..., :nu, :], ja[..., nu:, :], la, n_det
    )


@jax.custom_batching.custom_vmap
def slogdet_fl_tpu(a, ja, la):
    """Pallas version of :func:`slogdet_fl`; one walker per call, vmap for
    batches (dispatches whole walker batches to one blocked pallas_call)."""
    sign, logdet, jout, lout = _pallas_blocked(a[None], ja[None], la[None])
    return sign[0], logdet[0], jout[0], lout[0]


@slogdet_fl_tpu.def_vmap
def _slogdet_fl_tpu_vmap(axis_size, in_batched, a, ja, la):
    assert all(in_batched), 'all slogdet FL inputs must be walker-batched'
    out = _pallas_blocked(a, ja, la)
    return out, (True, True, True, True)
