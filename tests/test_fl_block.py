"""In-kernel forward-Laplacian block interpreter (ops/fl_block.py).

Pins the whole-block kernel (pallas interpret mode) to a nested-autodiff
oracle on a psiformer-layer-shaped block, checks the supported-scan's
verdicts, and runs the REAL psiformer ansatz end-to-end with the block
dispatch forced on (interpret mode) against the per-primitive path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.nn.modules import _mha_core_flat
from deepqmc_tpu.ops.fl_block import block_fl_call, block_jaxpr_supported

N_TOK, DM, HEADS, KDIR = 5, 16, 2, 7


def _params(seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) / np.sqrt(s[0]), dtype)
    return (
        mk(DM, DM), mk(DM, DM), mk(DM, DM), mk(DM, DM),  # wq wk wv wo
        mk(DM, DM), jnp.asarray(rng.normal(size=DM), dtype),  # w1 b1
        mk(DM, DM), jnp.asarray(rng.normal(size=DM), dtype),  # w2 b2
    )


def _block(h, wq, wk, wv, wo, w1, b1, w2, b2):
    """A psiformer-layer-shaped block: attention + residual + MLP + residual."""
    q2, k2, v2 = h @ wq, h @ wk, h @ wv
    att = _mha_core_flat(q2, k2, v2, HEADS) @ wo
    att = att + h
    y = jnp.tanh(att @ w1 + b1)
    y = jnp.tanh(y @ w2 + b2)
    return y + att


def _h_of_factory(seed=1, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(KDIR, N_TOK, DM)) / KDIR, dtype)
    w2 = jnp.asarray(rng.normal(size=(N_TOK, DM)), dtype)

    def h_of(xv):
        return jnp.tanh(jnp.einsum('K,Knd->nd', xv, w)) + w2 * (xv**2).sum()

    return h_of


def test_block_kernel_matches_nested_autodiff():
    params = _params()
    h_of = _h_of_factory()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(KDIR,)))

    h = h_of(x)
    jac = jnp.moveaxis(jax.jacfwd(h_of)(x), -1, 0)  # [K, n, dm]
    flat = lambda xv: h_of(xv).reshape(-1)
    hess = jax.hessian(flat)(x)
    lap = jnp.trace(hess, axis1=-2, axis2=-1).reshape(h.shape)

    closed = jax.make_jaxpr(_block)(h, *params)
    assert block_jaxpr_supported(closed, [True] + [False] * len(params))

    xo, jo, lo = block_fl_call(
        closed, KDIR, 0, h[None], jac[None], lap[None], list(params),
        interpret=True,
    )

    def composed(xv):
        return _block(h_of(xv), *params)

    np.testing.assert_allclose(
        np.asarray(xo[0]), np.asarray(composed(x)), rtol=1e-10
    )
    jref = jnp.moveaxis(jax.jacfwd(composed)(x), -1, 0)
    np.testing.assert_allclose(np.asarray(jo[0]), np.asarray(jref), rtol=1e-8)
    flat_c = lambda xv: composed(xv).reshape(-1)
    lref = jnp.trace(
        jax.hessian(flat_c)(x), axis1=-2, axis2=-1
    ).reshape(xo[0].shape)
    np.testing.assert_allclose(np.asarray(lo[0]), np.asarray(lref), rtol=1e-7)


def test_supported_scan_rejects_foreign_primitives():
    params = _params()
    h = jnp.zeros((N_TOK, DM))

    def bad_block(h, *ps):
        return jnp.sort(_block(h, *ps), axis=-1)

    closed = jax.make_jaxpr(bad_block)(h, *params)
    assert not block_jaxpr_supported(closed, [True] + [False] * len(params))


@pytest.mark.parametrize('stack', [False, True])
def test_block_dispatch_matches_per_primitive_on_psiformer(helpers, stack):
    """Real psiformer ansatz: eloc gradient/laplacian with the block kernel
    (interpret mode) == the per-primitive interpreter path.  ``stack=True``
    additionally fuses ALL layers into one block (_gnn_stack)."""
    from deepqmc_tpu.fwdlap import forward_laplacian
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import instantiate_ansatz

    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'psiformer',
            n_determinants=2,
            embedding_dim=16,
            n_interactions=2,
            num_heads=2,
        ),
    )
    phys_conf = helpers.phys_conf(hamil=hamil)
    params = ansatz.init(helpers.rng(), phys_conf)

    def log_psi_of_flat_r(r_flat):
        from deepqmc_tpu.types import PhysicalConfiguration

        pc = PhysicalConfiguration(
            phys_conf.R, r_flat.reshape(phys_conf.r.shape), phys_conf.mol_idx
        )
        return ansatz.apply(params, pc).log

    r_flat = phys_conf.r.reshape(-1)
    lap_ref, grad_ref = forward_laplacian(log_psi_of_flat_r)(r_flat)

    os.environ['DEEPQMC_TPU_BLOCK_KERNEL_INTERPRET'] = '1'
    if stack:
        os.environ['DEEPQMC_TPU_GNN_STACK_BLOCK'] = '1'
    try:
        lap_k, grad_k = forward_laplacian(log_psi_of_flat_r)(r_flat)
    finally:
        del os.environ['DEEPQMC_TPU_BLOCK_KERNEL_INTERPRET']
        os.environ.pop('DEEPQMC_TPU_GNN_STACK_BLOCK', None)
    np.testing.assert_allclose(
        np.asarray(grad_k), np.asarray(grad_ref), rtol=1e-9
    )
    np.testing.assert_allclose(float(lap_k), float(lap_ref), rtol=1e-9)
