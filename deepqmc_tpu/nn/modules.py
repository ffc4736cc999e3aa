"""Neural network building blocks (reference: /root/reference/src/deepqmc/hkext.py).

All dense layers route their output through :func:`~deepqmc_tpu.nn.core.tag_dense`
so the KFAC preconditioner can observe activations/sensitivities without any
graph-pattern matching (the reference needs kfac-jax graph patterns for this,
kfacext.py:141-162).
"""

from collections.abc import Callable, Sequence
from typing import Optional, Union

import jax
import jax.numpy as jnp

from . import core
from .core import Module, get_param, tag_dense, variance_scaling, zeros_init

__all__ = ()


def ssp(x: jax.Array) -> jax.Array:
    """Shifted softplus: softplus(x) + log(1/2)."""
    return jax.nn.softplus(x) + jnp.log(0.5)


_W_INITS = {
    'default': lambda: variance_scaling(1.0, 'fan_in', 'truncated_normal'),
    'ferminet': lambda: variance_scaling(1.0, 'fan_in', 'normal'),
    'deeperwin': lambda: variance_scaling(1.0, 'fan_avg', 'uniform'),
}
_B_INITS = {
    'default': zeros_init,
    'ferminet': lambda: variance_scaling(1.0, 'fan_out', 'normal'),
    'deeperwin': zeros_init,
}


class Linear(Module):
    """Dense layer ``y = x @ w + b`` with KFAC instrumentation."""

    def __init__(
        self,
        out_dim: int,
        *,
        with_bias: bool = True,
        w_init: Optional[Callable] = None,
        b_init: Optional[Callable] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.out_dim = out_dim
        self.with_bias = with_bias
        self.w_init = w_init
        self.b_init = b_init

    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w_init = self.w_init or _W_INITS['default']()
        w = get_param('w', (in_dim, self.out_dim), w_init)
        out = jnp.dot(x, w)
        if self.with_bias:
            b = get_param('b', (self.out_dim,), self.b_init or zeros_init())
            out = out + b
        return tag_dense(x, out)


class MLP(Module):
    """Multilayer perceptron with log-spaced width support.

    Args mirror the reference MLP (hkext.py:22-120): ``hidden_layers`` is
    either ``('log', n)`` for n layers with log-interpolated widths, or a tuple
    of explicit widths; ``bias`` in {True, False, 'not_last'}; ``init`` one of
    'default' | 'ferminet' | 'deeperwin' or a callable.
    """

    def __init__(
        self,
        out_dim: int,
        name: Optional[str] = None,
        *,
        hidden_layers: Sequence[Union[int, str]],
        bias: Union[bool, str],
        last_linear: bool,
        activation: Optional[Callable],
        init: Union[str, Callable],
    ):
        assert bias in (True, False, 'not_last')
        super().__init__(name=name)
        self.out_dim = out_dim
        self.hidden_layers = hidden_layers or []
        self.bias = bias
        self.last_linear = last_linear
        self.activation = activation
        if isinstance(init, str):
            self.w_init, self.b_init = _W_INITS[init](), _B_INITS[init]()
        else:
            self.w_init = self.b_init = init

    def __call__(self, x: jax.Array) -> jax.Array:
        if len(self.hidden_layers) == 2 and self.hidden_layers[0] == 'log':
            n_hidden = self.hidden_layers[1]
            qs = [k / n_hidden for k in range(1, n_hidden + 1)]
            dims = [round(x.shape[-1] ** (1 - q) * self.out_dim**q) for q in qs]
        else:
            dims = [*self.hidden_layers, self.out_dim]
        n_layers = len(dims)
        for idx, dim in enumerate(dims):
            with_bias = self.bias is True or (
                self.bias == 'not_last' and idx < n_layers - 1
            )
            x = Linear(
                dim,
                with_bias=with_bias,
                w_init=self.w_init,
                b_init=self.b_init,
                name=f'linear_{idx}',
            )(x)
            if idx < n_layers - 1 or not self.last_linear:
                x = self.activation(x)
        return x


class LayerNorm(Module):
    """Last-axis layer normalization, optionally with scale/offset."""

    def __init__(
        self,
        *,
        create_scale: bool = False,
        create_offset: bool = False,
        eps: float = 1e-5,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.create_scale = create_scale
        self.create_offset = create_offset
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.create_scale:
            out = out * get_param('scale', (x.shape[-1],), core.ones_init())
        if self.create_offset:
            out = out + get_param('offset', (x.shape[-1],), zeros_init())
        return out


class GLU(Module):
    """Gated linear unit: act(W x) * (V y), with optional pre-layernorm."""

    def __init__(
        self,
        out_dim: int,
        name: Optional[str] = None,
        *,
        bias: bool = True,
        layer_norm_before: bool = True,
        activation: Callable = jax.nn.sigmoid,
        b_init: Optional[Callable] = None,
    ):
        super().__init__(name=name)
        self.out_dim = out_dim
        self.bias = bias
        self.layer_norm_before = layer_norm_before
        self.activation = activation
        self.b_init = b_init

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        if self.layer_norm_before:
            x = LayerNorm()(x)
            y = LayerNorm()(y)
        gate = Linear(self.out_dim, with_bias=self.bias, b_init=self.b_init, name='W')(x)
        value = Linear(self.out_dim, with_bias=self.bias, b_init=self.b_init, name='V')(
            y
        )
        return self.activation(gate) * value


class Embed(Module):
    """Embedding lookup table."""

    def __init__(self, vocab_size: int, embed_dim: int, name: Optional[str] = None):
        super().__init__(name=name)
        self.vocab_size = vocab_size
        self.embed_dim = embed_dim

    def __call__(self, idx: jax.Array) -> jax.Array:
        table = get_param(
            'embeddings',
            (self.vocab_size, self.embed_dim),
            variance_scaling(1.0, 'fan_in', 'truncated_normal'),
        )
        return table[idx]


_MHA_FLAT_CORES: dict = {}


def _mha_core_flat(q2, k2, v2, num_heads):
    """softmax(q k^T / sqrt(dh)) v on head-FLAT [token, H*dh] arrays.

    Jitted per head count with the name ``_mha_core_flat_{H}`` so it appears
    as a named pjit in traced programs; the forward-Laplacian engine
    (fwdlap.py) recognizes the name and swaps in the fused VMEM kernel
    (ops/fl_attention.py) instead of interpreting the body primitive by
    primitive.  Flat in/out keeps the surrounding jaxpr free of minor-dim
    reshapes (which the Mosaic TPU backend cannot lower), so the whole
    attention+MLP block stays eligible for in-kernel interpretation.
    """
    fn = _MHA_FLAT_CORES.get(num_heads)
    if fn is None:

        def core(q2, k2, v2):
            n, dm = q2.shape
            dh = dm // num_heads
            q_h, k_h, v_h = (
                x.reshape(n, num_heads, dh) for x in (q2, k2, v2)
            )
            # [q,h,d] x [k,h,d] -> [h,q,k]  (contract d, batch h)
            logits = jax.lax.dot_general(
                q_h, k_h, (((2,), (2,)), ((1,), (1,)))
            ) / jnp.sqrt(dh).astype(q2.dtype)
            weights = jax.nn.softmax(logits, axis=-1)
            # [h,q,k] x [k,h,d] -> [q,h,d]  (contract k, batch h) -> flat
            att = jax.lax.dot_general(
                weights, v_h, (((2,), (0,)), ((0,), (1,)))
            )
            return jnp.swapaxes(att, 0, 1).reshape(n, dm)

        core.__name__ = f'_mha_core_flat_{num_heads}'
        fn = _MHA_FLAT_CORES[num_heads] = jax.jit(core)
    return fn(q2, k2, v2)


class MultiHeadAttention(Module):
    """Standard multi-head dot-product attention over token axis -2.

    Used by the PsiFormer update feature (reference update_features.py:271-284
    relies on hk.MultiHeadAttention).  Computation is arranged as three fused
    projections + one softmax(QK^T)V contraction, which XLA maps onto the MXU.
    """

    def __init__(
        self,
        num_heads: int,
        key_size: int,
        *,
        with_bias: bool = False,
        w_init: Optional[Callable] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.num_heads = num_heads
        self.key_size = key_size
        self.with_bias = with_bias
        self.w_init = w_init or variance_scaling(1.0, 'fan_in', 'normal')

    def _proj(self, x, label):
        # head-FLAT [token, H*dh]; head splitting happens inside the core
        # (or locally in the masked branch) so the traced program stays free
        # of minor-dim reshapes around the named-jit boundary
        return Linear(
            self.num_heads * self.key_size,
            with_bias=self.with_bias,
            w_init=self.w_init,
            name=label,
        )(x)

    def __call__(self, q, k, v, mask=None) -> jax.Array:
        # implemented with explicit dot_general dimension numbers so NO
        # transposes appear in the lowered program (einsum would canonicalize
        # batch dims with transposes) — every transpose here would also be
        # applied to the 3N-row forward-Laplacian Jacobian channel
        assert q.ndim == 2, 'attention operates per sample (vmap for batches)'
        q2, k2, v2 = self._proj(q, 'query'), self._proj(k, 'key'), self._proj(v, 'value')
        if mask is None:
            # the named-jit boundary lets the forward-Laplacian engine swap
            # in the fused VMEM attention kernel (fwdlap.py + ops/fl_attention)
            attended_flat = _mha_core_flat(q2, k2, v2, self.num_heads)
        else:
            q_h, k_h, v_h = (
                x.reshape(x.shape[0], self.num_heads, self.key_size)
                for x in (q2, k2, v2)
            )
            logits = jax.lax.dot_general(
                q_h, k_h, (((2,), (2,)), ((1,), (1,)))
            ) / jnp.sqrt(self.key_size).astype(q_h.dtype)
            logits = jnp.where(mask, logits, -1e30)
            weights = jax.nn.softmax(logits, axis=-1)
            # [h,q,k] x [k,h,d] -> [q,h,d]  (contract k, batch h) -> flat
            attended = jax.lax.dot_general(
                weights, v_h, (((2,), (0,)), ((0,), (1,)))
            )
            attended_flat = jnp.swapaxes(attended, 0, 1).reshape(q.shape[0], -1)
        # output projection on the head-flattened activation: a regular
        # dense layer, which KFAC's graph patterns treat as such
        w_out = get_param(
            'w', (self.num_heads * self.key_size, q.shape[-1]), self.w_init
        )
        out = jnp.dot(attended_flat, w_out)
        if self.with_bias:
            out = out + get_param('b', (q.shape[-1],), zeros_init())
        return tag_dense(attended_flat, out)


class ResidualConnection:
    """Shape-gated residual: adds only when shapes match; optional /sqrt(2)."""

    def __init__(self, *, normalize: bool):
        self.normalize = normalize

    def __call__(self, inp, update):
        def leaf_residual(x, y):
            if x.shape != y.shape:
                return y
            z = x + y
            return z / jnp.sqrt(2) if self.normalize else z

        return jax.tree_util.tree_map(leaf_residual, inp, update)


class SumPool:
    """Sum over the last axis (determinant mixing for FermiNet-style nets)."""

    def __init__(self, out_dim=1, name=None):
        assert out_dim == 1

    def __call__(self, x):
        return jax.tree_util.tree_map(
            lambda leaf: leaf.sum(axis=-1, keepdims=True), x
        )


class Identity:
    """No-op stand-in for optional subnetworks."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x):
        return x
