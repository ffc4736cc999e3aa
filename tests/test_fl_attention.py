"""Fused forward-Laplacian attention core (ops/fl_attention.py).

Pins the hand-derived attention (value, jacobian, laplacian) propagation to
the generic fwdlap interpreter rules, and the Pallas kernel (interpret mode)
to its pure-jnp twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.fwdlap import forward_laplacian
from deepqmc_tpu.nn.modules import _MHA_FLAT_CORES, _mha_core_flat
from deepqmc_tpu.ops.fl_attention import _pallas_blocked, mha_core_fl


def _flat(x):
    """[n, heads, dh] -> [n, heads*dh] (the core's flat calling convention)."""
    return x.reshape(x.shape[0], -1)


def _random_mha_problem(n=6, heads=2, dh=8, k=9, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(k,)), dtype)
    w_in = jnp.asarray(rng.normal(size=(k, 3, n, heads, dh)) / k, dtype)
    w_sq = jnp.asarray(rng.normal(size=(3, n, heads, dh)) / k, dtype)

    def qkv_of(xvec):
        # nonlinear map x -> (q, k, v) so jac and lap are both nontrivial
        base = jnp.einsum('K,Kqnhd->qnhd', xvec, w_in)
        return jnp.tanh(base) + w_sq * (xvec**2).sum()

    return x, qkv_of


def test_fl_core_matches_generic_interpreter():
    x, qkv_of = _random_mha_problem()

    def scalar_through_attention(xvec):
        q, k, v = qkv_of(xvec)
        return jnp.sum(jnp.cos(_mha_core_flat(_flat(q), _flat(k), _flat(v), 2)))

    # generic path: break the name-based dispatch by interpreting an
    # identical core under a different name
    _mha_core_flat(jnp.zeros((6, 16)), jnp.zeros((6, 16)), jnp.zeros((6, 16)), 2)

    @jax.jit
    def _mha_core_unfused(q, k, v):
        return _MHA_FLAT_CORES[2].__wrapped__(q, k, v)

    def scalar_unfused(xvec):
        q, k, v = qkv_of(xvec)
        return jnp.sum(jnp.cos(_mha_core_unfused(_flat(q), _flat(k), _flat(v))))

    lap_fused, grad_fused = forward_laplacian(scalar_through_attention)(x)
    lap_ref, grad_ref = forward_laplacian(scalar_unfused)(x)
    np.testing.assert_allclose(
        np.asarray(grad_fused), np.asarray(grad_ref), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lap_fused), np.asarray(lap_ref), rtol=1e-10
    )


def test_fl_core_matches_autodiff_laplacian():
    """Ultimate oracle: nested-autodiff Laplacian of the same scalar."""
    from deepqmc_tpu.physics import loop_laplacian

    x, qkv_of = _random_mha_problem(seed=3)

    def scalar(xvec):
        q, k, v = qkv_of(xvec)
        return jnp.sum(jnp.sin(_mha_core_flat(_flat(q), _flat(k), _flat(v), 2)))

    lap_fl, grad_fl = forward_laplacian(scalar)(x)
    lap_ad, grad_ad = loop_laplacian(scalar)(x)
    np.testing.assert_allclose(np.asarray(grad_fl), np.asarray(grad_ad),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(lap_fl), np.asarray(lap_ad),
                               rtol=1e-9)


@pytest.mark.parametrize('dtype', [jnp.float32])
def test_pallas_kernel_matches_jnp_twin(dtype):
    rng = np.random.default_rng(1)
    n, heads, dh, k = 5, 2, 8, 12
    args = [
        jnp.asarray(rng.normal(size=shape), dtype)
        for shape in [(n, heads, dh)] * 3
        + [(k, n, heads, dh)] * 3
        + [(n, heads, dh)] * 3
    ]
    ref = mha_core_fl(*args)
    out = _pallas_blocked(*(a[None] for a in args), interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o[0]), np.asarray(r), rtol=1e-4, atol=1e-5
        )


def test_pallas_kernel_accepts_bf16_jac_operands():
    """bf16-stored jac operands upcast in-kernel; output stays compute dtype."""
    rng = np.random.default_rng(3)
    n, heads, dh, k = 5, 2, 8, 12
    prim = [
        jnp.asarray(rng.normal(size=(n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    jacs32 = [
        jnp.asarray(rng.normal(size=(k, n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    laps = [
        jnp.asarray(rng.normal(size=(n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    jacs16 = [j.astype(jnp.bfloat16) for j in jacs32]
    ref = mha_core_fl(*prim, *(j.astype(jnp.float32) for j in jacs16), *laps)
    out = _pallas_blocked(
        *(a[None] for a in (*prim, *jacs16, *laps)), interpret=True
    )
    assert out[1].dtype == jnp.float32
    for r, o in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(o[0]), np.asarray(r), rtol=1e-4, atol=1e-5
        )


def test_kron_head_matches_loop_head():
    """The kron/block-diagonal head formulation == the loop formulation."""
    from deepqmc_tpu.ops.fl_attention import _make_head_fn, _make_head_fn_kron

    rng = np.random.default_rng(4)
    W, n, dh, k = 3, 5, 8, 12
    args = [
        jnp.asarray(rng.normal(size=shape), jnp.float64)
        for shape in [(W, n, dh)] * 3
        + [(W, k, n, dh)] * 3
        + [(W, n, dh)] * 3
    ]
    ref = _make_head_fn(W, n, k, dh, jnp.float64)(*args)
    got = _make_head_fn_kron(W, n, k, dh, jnp.float64)(*args)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9)


def test_pallas_kernel_blocks_and_pads(helpers):
    """The blocked pallas_call tiles walkers and pads ragged blocks."""
    rng = np.random.default_rng(2)
    B, n, heads, dh, k = 5, 5, 2, 8, 12  # 5 walkers -> blocks of 4 + pad
    args = [
        jnp.asarray(rng.normal(size=(B, *shape)), jnp.float32)
        for shape in [(n, heads, dh)] * 3
        + [(k, n, heads, dh)] * 3
        + [(n, heads, dh)] * 3
    ]
    out = _pallas_blocked(*args, interpret=True)
    ref = jax.vmap(mha_core_fl)(*args)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_2d_rewrite_matches_einsum_form():
    from deepqmc_tpu.ops.fl_attention import _mha_core_fl_2d

    rng = np.random.default_rng(5)
    n, heads, dh, k = 5, 3, 8, 12
    args = [
        jnp.asarray(rng.normal(size=shape), jnp.float64)
        for shape in [(n, heads, dh)] * 3
        + [(k, n, heads, dh)] * 3
        + [(n, heads, dh)] * 3
    ]
    ref = mha_core_fl(*args)
    out = _mha_core_fl_2d(*(a[None] for a in args))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o[0]), np.asarray(r), rtol=1e-10)


def test_pallas_kernel_low_precision_jac_mode(monkeypatch):
    """DEEPQMC_TPU_JAC_MATMUL=bf16: the K-scaled jac contractions truncate
    to native bf16 — outputs must stay within bf16 tolerance of full f32."""
    monkeypatch.setenv('DEEPQMC_TPU_JAC_MATMUL', 'bf16')
    rng = np.random.default_rng(5)
    n, heads, dh, k = 5, 2, 8, 12
    prim = [
        jnp.asarray(rng.normal(size=(n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    jacs = [
        jnp.asarray(rng.normal(size=(k, n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    laps = [
        jnp.asarray(rng.normal(size=(n, heads, dh)), jnp.float32)
        for _ in range(3)
    ]
    ref = mha_core_fl(*prim, *jacs, *laps)
    out = _pallas_blocked(*(a[None] for a in (*prim, *jacs, *laps)), interpret=True)
    # primal t: exact (never downcast); jac/lap: bf16-tolerance agreement
    np.testing.assert_allclose(
        np.asarray(out[0][0]), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
    )
    for r, o in zip(ref[1:], out[1:]):
        np.testing.assert_allclose(
            np.asarray(o[0]), np.asarray(r), rtol=0.05, atol=0.05
        )
