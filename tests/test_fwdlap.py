import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu.fwdlap import forward_laplacian
from deepqmc_tpu.ops import slogdet
from deepqmc_tpu.physics import loop_laplacian
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.wf import instantiate_ansatz


def check_against_loop(f, x, rtol=1e-8):
    lap_f, grad_f = forward_laplacian(f)(x)
    lap_ref, grad_ref = loop_laplacian(f)(x)
    np.testing.assert_allclose(np.asarray(grad_f), np.asarray(grad_ref), rtol=rtol)
    np.testing.assert_allclose(np.asarray(lap_f), np.asarray(lap_ref), rtol=rtol)


def test_polynomial(helpers):
    f = lambda x: (x**3).sum() + (x[0] * x[1]) ** 2
    check_against_loop(f, jax.random.normal(helpers.rng(0), (6,)))


def test_elementwise_chain(helpers):
    f = lambda x: jnp.tanh(jnp.exp(0.3 * x) + jnp.log1p(x**2)).sum()
    check_against_loop(f, jax.random.normal(helpers.rng(1), (9,)))


def test_division_and_sqrt(helpers):
    f = lambda x: (jnp.sqrt(1 + x[0] ** 2) / (2 + jnp.cos(x[1]))).sum() + (
        x[2:] / (1 + x[:4].sum() ** 2)
    ).sum()
    check_against_loop(f, jax.random.normal(helpers.rng(2), (6,)))


def test_matmul(helpers):
    w1 = jax.random.normal(helpers.rng(3), (6, 8))
    w2 = jax.random.normal(helpers.rng(4), (8, 1))
    f = lambda x: jnp.tanh(jnp.tanh(x @ w1) @ w2).sum()
    check_against_loop(f, jax.random.normal(helpers.rng(5), (6,)))


def test_bilinear_cross_terms(helpers):
    # x-dependent times x-dependent matmul exercises the dot_general cross term
    def f(x):
        a = jnp.sin(x).reshape(2, 3)
        b = jnp.cos(x).reshape(3, 2)
        return (a @ b).sum()

    check_against_loop(f, jax.random.normal(helpers.rng(6), (6,)))


def test_slogdet(helpers):
    def f(x):
        m = x.reshape(3, 3) + 3 * jnp.eye(3)
        sign, logdet = slogdet(m)
        return logdet

    check_against_loop(f, jax.random.normal(helpers.rng(7), (9,)))


def test_slogdet_batched(helpers):
    def f(x):
        m = x.reshape(2, 2, 2) + 4 * jnp.eye(2)
        sign, logdet = slogdet(m)
        return logdet.sum()

    check_against_loop(f, jax.random.normal(helpers.rng(8), (8,)))


def test_slogdet_grad_consistency(helpers):
    """The slogdet primitive must also work under standard reverse-mode AD."""
    m = jax.random.normal(helpers.rng(9), (4, 4)) + 4 * jnp.eye(4)
    g = jax.grad(lambda m: slogdet(m)[1])(m)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jnp.linalg.inv(m).T), rtol=1e-8
    )


def test_attention_like(helpers):
    wq = jax.random.normal(helpers.rng(10), (4, 4))

    def f(x):
        h = x.reshape(3, 4)
        logits = (h @ wq) @ h.T / 2.0
        att = jax.nn.softmax(logits, axis=-1)
        return (att @ h).sum()

    check_against_loop(f, jax.random.normal(helpers.rng(11), (12,)))


def test_structural_primitives(helpers):
    """Closed-form structural rules (pad/rev/split/cumsum/select_n/...)."""

    def f(x):
        a = jnp.pad(x.reshape(2, 3), ((1, 1), (0, 1)))
        b = jnp.flip(a, 0) + jnp.cumsum(a, axis=1)
        lo, hi = jnp.split(b * jnp.tanh(b), 2, axis=0)
        c = jnp.where(lo > hi, lo**2, hi / (1 + lo**2))
        d = jax.lax.dynamic_slice(c, (0, 1), (1, 2))
        e = jax.lax.dynamic_update_slice(c, 2.0 * d, (1, 0))
        return (e.T @ e).sum() + jnp.concatenate([x, -x]).sum()

    check_against_loop(f, jax.random.normal(helpers.rng(20), (6,)), rtol=1e-6)


def test_bf16_jac_storage_close_to_f32(helpers, monkeypatch):
    """DEEPQMC_TPU_JAC_DTYPE=bf16 stores jac intermediates in bfloat16; the
    result must track the f32 chain to bf16 roundoff, with lap/grad dtypes
    unchanged at the boundary."""
    w1 = jax.random.normal(helpers.rng(21), (6, 16))
    w2 = jax.random.normal(helpers.rng(22), (16, 1))

    def f(x):
        h = jnp.tanh(x @ w1)
        m = (h[:8] * h[8:]).reshape(2, 2, 2) + 4 * jnp.eye(2)
        sign, logdet = slogdet(m)
        return logdet.sum() + jnp.tanh(h @ w2).sum()

    x = jax.random.normal(helpers.rng(23), (6,))
    lap32, grad32 = forward_laplacian(f)(x)
    monkeypatch.setenv('DEEPQMC_TPU_JAC_DTYPE', 'bf16')
    lap16, grad16 = forward_laplacian(f)(x)
    assert grad16.dtype == grad32.dtype and lap16.dtype == lap32.dtype
    np.testing.assert_allclose(
        np.asarray(grad16), np.asarray(grad32), rtol=0, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(lap16), np.asarray(lap32), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize('preset', ['default', 'ferminet', 'psiformer'])
@pytest.mark.heavy
def test_full_ansatz_laplacian(helpers, preset):
    """The forward Laplacian of the real ansatz must match nested autodiff."""
    kwargs = {'n_determinants': 2, 'embedding_dim': 32, 'n_interactions': 2}
    if preset == 'psiformer':
        kwargs['num_heads'] = 2
    else:
        kwargs['two_particle_stream_dim'] = 8
    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(hamil, ansatz_preset(preset, **kwargs))
    pc = helpers.phys_conf(hamil)
    params = ansatz.init(helpers.rng(12), pc)

    def log_psi(r_flat):
        return ansatz.apply(params, pc.replace(r=r_flat.reshape(-1, 3))).log

    check_against_loop(log_psi, pc.r.flatten(), rtol=5e-7)


@pytest.mark.heavy
def test_forward_laplacian_under_vmap_and_jit(helpers):
    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default', n_determinants=2, embedding_dim=16, n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    pcs = hamil.init_sample(helpers.rng(13), hamil.mol.coords, 4)
    params = ansatz.init(helpers.rng(14), pcs[0])

    def one(pc):
        def log_psi(r_flat):
            return ansatz.apply(params, pc.replace(r=r_flat.reshape(-1, 3))).log

        return forward_laplacian(log_psi)(pc.r.flatten())

    lap, grad = jax.jit(jax.vmap(one))(pcs)
    assert lap.shape == (4,)
    assert grad.shape == (4, 12)
    lap_ref = jax.vmap(
        lambda pc: loop_laplacian(
            lambda r: ansatz.apply(params, pc.replace(r=r.reshape(-1, 3))).log
        )(pc.r.flatten())[0]
    )(pcs)
    np.testing.assert_allclose(np.asarray(lap), np.asarray(lap_ref), rtol=1e-7)


def test_jac_matmul_bf16_gate(helpers, monkeypatch):
    """DEEPQMC_TPU_JAC_MATMUL=bf16 must keep the Laplacian within bf16
    tolerance of the full-precision result (and leave the primal exact)."""
    w1 = jax.random.normal(helpers.rng(10), (6, 16)).astype(jnp.float32)
    w2 = jax.random.normal(helpers.rng(11), (16, 1)).astype(jnp.float32)
    x = jax.random.normal(helpers.rng(12), (6,)).astype(jnp.float32)
    f32 = lambda y: jnp.tanh(jnp.tanh(y.astype(jnp.float32) @ w1) @ w2).sum()
    lap_ref, grad_ref = forward_laplacian(f32)(x)
    monkeypatch.setenv('DEEPQMC_TPU_JAC_DTYPE', 'bf16')
    monkeypatch.setenv('DEEPQMC_TPU_JAC_MATMUL', 'bf16')
    lap_lo, grad_lo = forward_laplacian(f32)(x)
    assert np.asarray(grad_lo).dtype == np.float32  # upcast on exit
    np.testing.assert_allclose(
        np.asarray(grad_lo), np.asarray(grad_ref), rtol=0.05, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lap_lo), np.asarray(lap_ref), rtol=0.05, atol=1e-2
    )
