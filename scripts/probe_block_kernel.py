"""Minimal real-TPU compile repro for the fl_block whole-block kernel.

The r02 A/B sweep found every DEEPQMC_TPU_BLOCK_KERNEL variant crashes the
remote Mosaic compiler (tpu_compile_helper exit 1) at full H2O PsiFormer
shapes.  This probe compiles the block kernel standalone on a tiny
attention+MLP block, printing the FULL error, and bisects the shape at
which compilation starts failing.

Usage: python scripts/probe_block_kernel.py [--dim 64] [--heads 2]
       [--n-elec 4] [--walkers 8]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('DEEPQMC_TPU_ATTN_COLFORM', '1')

import jax
import jax.numpy as jnp


def make_block(dim, heads, n_elec, key):
    """A PsiFormer-like block: qkv proj -> mha -> out proj -> MLP -> residual."""
    ks = jax.random.split(key, 6)
    dh = dim // heads
    wq, wk, wv = (
        jax.random.normal(k, (dim, dim)) / jnp.sqrt(dim) for k in ks[:3]
    )
    wo = jax.random.normal(ks[3], (dim, dim)) / jnp.sqrt(dim)
    w1 = jax.random.normal(ks[4], (dim, dim)) / jnp.sqrt(dim)
    w2 = jax.random.normal(ks[5], (dim, dim)) / jnp.sqrt(dim)

    def block(h):
        n = h.shape[0]
        q = (h @ wq).reshape(n, heads, dh)
        k = (h @ wk).reshape(n, heads, dh)
        v = (h @ wv).reshape(n, heads, dh)
        z = jnp.einsum('ihd,jhd->hij', q, k) / jnp.sqrt(dh)
        a = jax.nn.softmax(z, axis=-1)
        t = jnp.einsum('hij,jhd->ihd', a, v).reshape(n, dim)
        h = h + t @ wo
        return h + jnp.tanh(h @ w1) @ w2

    return block


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dim', type=int, default=64)
    p.add_argument('--heads', type=int, default=2)
    p.add_argument('--n-elec', type=int, default=4)
    p.add_argument('--walkers', type=int, default=8)
    p.add_argument('--wb', type=int, default=1)
    args = p.parse_args()

    from deepqmc_tpu.ops import fl_block
    from deepqmc_tpu.ops.fl_block import block_fl_call

    fl_block.WALKER_BLOCK = args.wb

    block = make_block(args.dim, args.heads, args.n_elec, jax.random.PRNGKey(0))
    n, dim = args.n_elec, args.dim
    K = 3 * n
    closed = jax.make_jaxpr(block)(jnp.zeros((n, dim)))

    W = args.walkers
    x = jax.random.normal(jax.random.PRNGKey(1), (W, n, dim))
    jac = jax.random.normal(jax.random.PRNGKey(2), (W, K, n, dim)) * 0.1
    lap = jax.random.normal(jax.random.PRNGKey(3), (W, n, dim)) * 0.1

    print(f'block eqns: {[str(e.primitive) for e in closed.jaxpr.eqns]}')
    try:
        xo, jo, lo = jax.jit(
            lambda x, j, l: block_fl_call(closed, K, 0, x, j, l, [])
        )(x, jac, lap)
        jax.block_until_ready(xo)
        print('COMPILED AND RAN OK:', xo.shape, jo.shape, lo.shape)
        print('x out mean', float(xo.mean()))
    except Exception:
        traceback.print_exc()
        print('FAILED at', dict(vars(args)))


if __name__ == '__main__':
    main()
