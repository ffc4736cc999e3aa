import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu import nn


def test_linear_init_apply():
    model = nn.transform(lambda x: nn.Linear(4, name='lin')(x))
    params = model.init(jax.random.PRNGKey(0), jnp.ones(3))
    assert params['lin']['w'].shape == (3, 4)
    assert params['lin']['b'].shape == (4,)
    out = model.apply(params, jnp.ones(3))
    assert out.shape == (4,)
    assert np.allclose(out, jnp.ones(3) @ params['lin']['w'] + params['lin']['b'])


def test_unique_auto_names():
    def f(x):
        a = nn.Linear(3)(x)
        b = nn.Linear(3)(x)
        return a + b

    params = nn.transform(f).init(jax.random.PRNGKey(0), jnp.ones(3))
    assert set(params) == {'linear', 'linear_1'}


def test_nested_module_paths():
    class Outer(nn.Module):
        def __init__(self, name=None):
            super().__init__(name=name)
            self.inner = nn.Linear(2, name='inner')

        def __call__(self, x):
            return self.inner(x) + nn.Linear(2, name='lazy')(x)

    params = nn.transform(lambda x: Outer()(x)).init(jax.random.PRNGKey(0), jnp.ones(2))
    assert set(params) == {'outer/inner', 'outer/lazy'}


def test_mlp_log_widths():
    mlp_fn = nn.transform(
        lambda x: nn.MLP(
            4,
            hidden_layers=['log', 2],
            bias=True,
            last_linear=False,
            activation=jnp.tanh,
            init='default',
        )(x)
    )
    params = mlp_fn.init(jax.random.PRNGKey(0), jnp.ones(64))
    # log-spaced widths between 64 and 4: sqrt(64*4)=16, then 4
    assert params['mlp/linear_0']['w'].shape == (64, 16)
    assert params['mlp/linear_1']['w'].shape == (16, 4)


def test_mlp_bias_not_last():
    mlp_fn = nn.transform(
        lambda x: nn.MLP(
            4,
            hidden_layers=(8,),
            bias='not_last',
            last_linear=True,
            activation=jnp.tanh,
            init='ferminet',
        )(x)
    )
    params = mlp_fn.init(jax.random.PRNGKey(0), jnp.ones(3))
    assert 'b' in params['mlp/linear_0']
    assert 'b' not in params['mlp/linear_1']


def test_apply_deterministic_and_shared():
    def f(x):
        mlp = nn.MLP(
            3, hidden_layers=(5,), bias=True, last_linear=True,
            activation=jnp.tanh, init='default',
        )
        return mlp(x) + mlp(2 * x)  # second call shares parameters

    model = nn.transform(f)
    params = model.init(jax.random.PRNGKey(1), jnp.ones(3))
    n_layers = len(params)
    assert n_layers == 2  # one MLP, two Linears, shared across both calls
    o1 = model.apply(params, jnp.ones(3))
    o2 = model.apply(params, jnp.ones(3))
    assert np.allclose(o1, o2)


def test_instrumented_captures_and_perturbations():
    def f(x):
        h = nn.Linear(4, name='l1')(x)
        return nn.Linear(2, name='l2')(jnp.tanh(h)).sum()

    model = nn.transform(f)
    x = jnp.ones(3)
    params = model.init(jax.random.PRNGKey(0), x)
    out, captures = model.apply_instrumented(params, None, x)
    assert set(captures) == {'l1', 'l2'}
    (x_in, out_shape), = captures['l1']
    assert x_in.shape == (3,) and out_shape == (4,)

    # gradient wrt zero perturbation == sensitivity dL/d(preactivation)
    perturb = {'l1': [jnp.zeros(4)], 'l2': [jnp.zeros(2)]}
    g = jax.grad(
        lambda p: model.apply_instrumented(params, p, x)[0]
    )(perturb)
    assert np.allclose(g['l2'][0], 1.0)  # output layer sensitivity of a sum


def test_layernorm():
    model = nn.transform(lambda x: nn.LayerNorm()(x))
    x = jnp.array([1.0, 2.0, 3.0, 10.0])
    out = model.apply({}, x)
    assert float(out.mean()) == pytest.approx(0.0, abs=1e-6)
    assert float(out.std()) == pytest.approx(1.0, abs=1e-3)


def test_multi_head_attention_shapes():
    model = nn.transform(
        lambda h: nn.MultiHeadAttention(4, 8, name='attn')(h, h, h)
    )
    h = jnp.ones((6, 32))
    params = model.init(jax.random.PRNGKey(0), h)
    out = model.apply(params, h)
    assert out.shape == (6, 32)
    assert set(params) == {'attn/query', 'attn/key', 'attn/value', 'attn'}
    assert params['attn']['w'].shape == (32, 32)  # output projection


def test_glu():
    model = nn.transform(lambda x, y: nn.GLU(5, name='glu')(x, y))
    x = jnp.ones((2, 7))
    params = model.init(jax.random.PRNGKey(0), x, x)
    assert model.apply(params, x, x).shape == (2, 5)


def test_vmap_and_jit_compatibility():
    def f(x):
        return nn.MLP(
            2, hidden_layers=(4,), bias=True, last_linear=True,
            activation=jnp.tanh, init='default',
        )(x)

    model = nn.transform(f)
    params = model.init(jax.random.PRNGKey(0), jnp.ones(3))
    xs = jnp.ones((10, 3))
    out = jax.jit(jax.vmap(model.apply, (None, 0)))(params, xs)
    assert out.shape == (10, 2)
