"""Fused forward-Laplacian slogdet kernel (ops/fl_slogdet.py).

Pins the pure-jnp twin to the fwdlap interpreter's einsum rule (via a
nested-autodiff Laplacian oracle) and the Pallas kernel (interpret mode) to
the twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.ops.fl_slogdet import _pallas_blocked, slogdet_fl
from deepqmc_tpu.physics import loop_laplacian


def _random_problem(n_dets=3, n=4, k=7, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(k,)), dtype)
    w1 = jnp.asarray(rng.normal(size=(k, n_dets, n, n)) / k, dtype)
    w2 = jnp.asarray(rng.normal(size=(n_dets, n, n)), dtype)

    def mats_of(xvec):
        # nonlinear map so the jacobian and laplacian are both nontrivial
        return jnp.tanh(jnp.einsum('K,Kdij->dij', xvec, w1)) + w2 * (
            1 + (xvec**2).sum()
        )

    return x, mats_of


def _fl_inputs(x, mats_of):
    k = x.shape[0]
    a = mats_of(x)
    jac = jax.jacfwd(mats_of)(x)  # [d, i, j, K]
    ja = jnp.moveaxis(jac, -1, 0)  # [K, d, i, j]
    # laplacian of each matrix entry: trace of the per-entry Hessian
    flat = lambda xv: mats_of(xv).reshape(-1)
    hess = jax.hessian(flat)(x)  # [a.size, K, K]
    lap_entries = jnp.trace(hess, axis1=-2, axis2=-1).reshape(a.shape)
    return a, ja, lap_entries


def test_twin_matches_nested_autodiff():
    """slogdet_fl's (jac, lap) of log|det| match a nested-autodiff oracle."""
    x, mats_of = _random_problem()
    a, ja, la = _fl_inputs(x, mats_of)
    sign, logdet, jout, lout = slogdet_fl(a, ja, la)

    def logdet_of(xv):
        return jnp.linalg.slogdet(mats_of(xv))[1]

    for d in range(a.shape[0]):
        lap_d, grad_d = loop_laplacian(lambda xv, d=d: logdet_of(xv)[d])(x)
        np.testing.assert_allclose(np.asarray(jout[:, d]), grad_d, rtol=1e-9)
        np.testing.assert_allclose(float(lout[d]), float(lap_d), rtol=1e-8)
    s_ref, l_ref = jnp.linalg.slogdet(a)
    np.testing.assert_allclose(np.asarray(sign), np.asarray(s_ref))
    np.testing.assert_allclose(
        np.asarray(logdet), np.asarray(l_ref), rtol=1e-12
    )


def test_split_twin_matches_concat():
    """Row-block FL rule == plain rule on the concatenated Jacobian."""
    from deepqmc_tpu.ops.fl_slogdet import slogdet_fl_split

    x, mats_of = _random_problem(n_dets=2, n=6)
    a, ja, la = _fl_inputs(x, mats_of)
    got = slogdet_fl_split(a, ja[:, :, :2], ja[:, :, 2:], la)
    want = slogdet_fl(a, ja, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)


@pytest.mark.parametrize('batch', [1, 5, 16])
def test_split_pallas_kernel_matches_twin(batch):
    """The blocked split kernel (interpret mode) equals the jnp twin."""
    from deepqmc_tpu.ops.fl_slogdet import (
        _pallas_blocked_split,
        slogdet_fl_split,
    )

    problems = [_random_problem(n_dets=2, n=6, seed=s) for s in range(batch)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = jnp.stack([i[0] for i in inputs])
    ja = jnp.stack([i[1] for i in inputs])
    la = jnp.stack([i[2] for i in inputs])
    ju, jd = ja[:, :, :, :2], ja[:, :, :, 2:]
    got = _pallas_blocked_split(a, ju, jd, la, interpret=True)
    want = jax.vmap(slogdet_fl_split)(a, ju, jd, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10)


def test_fwdlap_defers_concat_into_slogdet():
    """forward_laplacian on a concat->slogdet function matches the
    nested-autodiff oracle (exercises the FLRowBlocks path)."""
    from deepqmc_tpu.fwdlap import forward_laplacian
    from deepqmc_tpu.ops.slogdet import slogdet

    x, mats_of = _random_problem(n_dets=2, n=4)

    def log_abs_dets(xv):
        m = mats_of(xv)  # [D, 4, 4]
        a = jnp.concatenate([m[..., :2, :], 2.0 * m[..., 2:, :]], axis=-2)
        _, logdet = slogdet(a)
        return logdet.sum()

    lap, grad = forward_laplacian(log_abs_dets)(x)
    lap_ref, grad_ref = loop_laplacian(log_abs_dets)(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref), rtol=1e-9)
    np.testing.assert_allclose(float(lap), float(lap_ref), rtol=1e-8)


@pytest.mark.parametrize('batch', [1, 5, 16])
def test_pallas_kernel_matches_twin(batch):
    """The blocked kernel (interpret mode) equals the jnp twin, incl. the
    walker-padding path (batch not a multiple of the block)."""
    problems = [_random_problem(seed=s) for s in range(batch)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = jnp.stack([i[0] for i in inputs])
    ja = jnp.stack([i[1] for i in inputs])
    la = jnp.stack([i[2] for i in inputs])
    got = _pallas_blocked(a, ja, la, interpret=True)
    want = jax.vmap(slogdet_fl)(a, ja, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10)


def _flatten_dets(a):
    """[..., D, n, n] -> [..., n, D*n] det-major columns."""
    moved = jnp.moveaxis(a, -3, -2)  # [..., n, D, n]
    return moved.reshape(*moved.shape[:-2], -1)


def test_flat_twin_matches_square():
    """The flat-layout twin equals the square-layout rule."""
    from deepqmc_tpu.ops.fl_slogdet import slogdet_fl, slogdet_fl_flat

    x, mats_of = _random_problem(n_dets=3, n=4)
    a, ja, la = _fl_inputs(x, mats_of)
    got = slogdet_fl_flat(_flatten_dets(a), _flatten_dets(ja), _flatten_dets(la), 3)
    want = slogdet_fl(a, ja, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)


@pytest.mark.parametrize('batch', [1, 5, 16])
def test_flat_split_pallas_kernel_matches_twin(batch):
    """The flat blocked kernel (interpret mode) equals the jnp twin."""
    from deepqmc_tpu.ops.fl_slogdet import (
        _pallas_blocked_flat_split,
        slogdet_fl_flat_split,
    )

    problems = [_random_problem(n_dets=2, n=6, seed=s) for s in range(batch)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = _flatten_dets(jnp.stack([i[0] for i in inputs]))
    ja = _flatten_dets(jnp.stack([i[1] for i in inputs]))
    la = _flatten_dets(jnp.stack([i[2] for i in inputs]))
    ju, jd = ja[:, :, :2], ja[:, :, 2:]
    got = _pallas_blocked_flat_split(a, ju, jd, la, 2, interpret=True)
    want = jax.vmap(lambda *t: slogdet_fl_flat_split(*t, 2))(a, ju, jd, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10)


def test_flat_split_pallas_kernel_accepts_bf16_jac():
    """bf16-stored jac row blocks upcast after the VMEM load."""
    from deepqmc_tpu.ops.fl_slogdet import (
        _pallas_blocked_flat_split,
        slogdet_fl_flat_split,
    )

    problems = [_random_problem(n_dets=2, n=6, seed=s) for s in range(3)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = _flatten_dets(jnp.stack([i[0] for i in inputs])).astype(jnp.float32)
    ja = _flatten_dets(jnp.stack([i[1] for i in inputs]))
    la = _flatten_dets(jnp.stack([i[2] for i in inputs])).astype(jnp.float32)
    ju16 = ja[:, :, :2].astype(jnp.bfloat16)
    jd16 = ja[:, :, 2:].astype(jnp.bfloat16)
    got = _pallas_blocked_flat_split(a, ju16, jd16, la, 2, interpret=True)
    want = jax.vmap(lambda *t: slogdet_fl_flat_split(*t, 2))(
        a,
        ju16.astype(jnp.float32),
        jd16.astype(jnp.float32),
        la,
    )
    assert got[2].dtype == jnp.float32
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )


def test_flat_split_vmem_plan():
    """The planner keeps the proven H2O config, chunks trq for ScO-size
    systems, and falls back (None) at benzene scale where even W=1
    overflows VMEM."""
    from deepqmc_tpu.ops.fl_slogdet import _flat_split_plan

    # H2O psiformer: n=10, K=31, D=16, bf16 jac — untouched fast path
    w, kc = _flat_split_plan(2048, 16, 10, 5, 5, 31, 2)
    assert w == 8 and kc == 31
    # ScO: n=17, K=52 — W stays 8, trq chunked
    w, kc = _flat_split_plan(1024, 16, 17, 9, 8, 52, 2)
    assert w == 8 and 1 <= kc < 52
    # benzene: n=42, K=127 — single-walker blocks, heavily chunked trq
    w, kc = _flat_split_plan(1024, 16, 42, 21, 21, 127, 2)
    assert w == 1 and 1 <= kc < 127
    # a pathological scale must still fall back cleanly
    assert _flat_split_plan(1024, 64, 128, 64, 64, 385, 2) is None


def test_flat_split_pallas_kernel_chunked_trq(monkeypatch):
    """With a tiny VMEM budget the planner picks trq_chunk < K (and a
    smaller walker block); the chunked kernel still equals the twin."""
    from deepqmc_tpu.ops import fl_slogdet
    from deepqmc_tpu.ops.fl_slogdet import (
        _flat_split_plan,
        _pallas_blocked_flat_split,
        slogdet_fl_flat_split,
    )

    problems = [_random_problem(n_dets=2, n=6, seed=s) for s in range(5)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = _flatten_dets(jnp.stack([i[0] for i in inputs]))
    ja = _flatten_dets(jnp.stack([i[1] for i in inputs]))
    la = _flatten_dets(jnp.stack([i[2] for i in inputs]))
    ju, jd = ja[:, :, :2], ja[:, :, 2:]
    monkeypatch.setenv('DEEPQMC_TPU_FL_SLOGDET_VMEM_MB', '1')
    plan = _flat_split_plan(5, 2, 6, 2, 4, ja.shape[1], ja.dtype.itemsize)
    assert plan is not None and plan[1] < ja.shape[1]
    _pallas_blocked_flat_split.clear_cache()
    try:
        got = _pallas_blocked_flat_split(a, ju, jd, la, 2, interpret=True)
    finally:
        _pallas_blocked_flat_split.clear_cache()
    want = jax.vmap(lambda *t: slogdet_fl_flat_split(*t, 2))(a, ju, jd, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-10)


def test_flat_split_infeasible_plan_falls_back(monkeypatch):
    """A zero budget forces the unfused XLA fallback, which must agree with
    the twin (and accept bf16 jac blocks)."""
    from deepqmc_tpu.ops.fl_slogdet import (
        _pallas_blocked_flat_split,
        slogdet_fl_flat_split,
    )

    problems = [_random_problem(n_dets=2, n=6, seed=s) for s in range(3)]
    inputs = [_fl_inputs(x, f) for x, f in problems]
    a = _flatten_dets(jnp.stack([i[0] for i in inputs])).astype(jnp.float32)
    ja = _flatten_dets(jnp.stack([i[1] for i in inputs])).astype(jnp.float32)
    la = _flatten_dets(jnp.stack([i[2] for i in inputs])).astype(jnp.float32)
    ju, jd = ja[:, :, :2], ja[:, :, 2:]
    monkeypatch.setenv('DEEPQMC_TPU_FL_SLOGDET_VMEM_MB', '0')
    _pallas_blocked_flat_split.clear_cache()
    try:
        got = _pallas_blocked_flat_split(a, ju, jd, la, 2, interpret=True)
    finally:
        _pallas_blocked_flat_split.clear_cache()
    want = jax.vmap(lambda *t: slogdet_fl_flat_split(*t, 2))(a, ju, jd, la)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5
        )


def test_fwdlap_flat_slogdet_matches_oracle():
    """forward_laplacian through slogdet_flat (concat->flat det path, as the
    ansatz builds it) matches the nested-autodiff oracle."""
    from deepqmc_tpu.fwdlap import forward_laplacian
    from deepqmc_tpu.ops.slogdet import slogdet_flat

    x, mats_of = _random_problem(n_dets=2, n=4)

    def log_abs_dets(xv):
        m = _flatten_dets(mats_of(xv))  # [4, 2*4]
        a = jnp.concatenate([m[:2], 2.0 * m[2:]], axis=-2)
        _, logdet = slogdet_flat(a, 2)
        return logdet.sum()

    lap, grad = forward_laplacian(log_abs_dets)(x)
    lap_ref, grad_ref = loop_laplacian(log_abs_dets)(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref), rtol=1e-9)
    np.testing.assert_allclose(float(lap), float(lap_ref), rtol=1e-8)


def test_slogdet_flat_reverse_ad():
    """slogdet_flat under standard reverse-mode AD matches jnp.linalg."""
    from deepqmc_tpu.ops.slogdet import slogdet_flat

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(3, 4, 4)), jnp.float64)

    def f_flat(m_flat):
        return slogdet_flat(m_flat, 3)[1].sum()

    def f_ref(m):
        return jnp.linalg.slogdet(m)[1].sum()

    g_flat = jax.grad(f_flat)(_flatten_dets(a))
    g_ref = _flatten_dets(jax.grad(f_ref)(a))
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref), rtol=1e-10)


def test_flat_elimination_matches_square():
    """Flat-layout slogdet/inverse are bitwise-equal to the square path.

    The flat variants run the same pivoted elimination on the ansatz's
    native [.., n, D*n] layout (ops/linalg_small.py), so pivoting decisions
    — and therefore floating-point results — must match exactly.
    """
    from deepqmc_tpu.ops.linalg_small import (
        inv_flat_small,
        inv_small,
        slogdet_flat_small,
        slogdet_small,
    )
    from deepqmc_tpu.ops.slogdet import unflatten_dets

    rng = np.random.default_rng(11)
    B, D, n = 5, 4, 7
    a_flat = jnp.asarray(rng.normal(size=(B, n, D * n)), jnp.float64)
    a = unflatten_dets(a_flat, D)
    s, l = slogdet_flat_small(a_flat, D)
    s_ref, l_ref = slogdet_small(a)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l_ref))
    inv_f = unflatten_dets(inv_flat_small(a_flat, D), D)
    np.testing.assert_array_equal(np.asarray(inv_f), np.asarray(inv_small(a)))
    # and against numpy, loosely (different pivoting path than LAPACK)
    np.testing.assert_allclose(
        np.asarray(inv_f), np.linalg.inv(np.asarray(a)), atol=1e-10
    )
