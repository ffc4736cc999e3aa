"""Probe: does the flat-layout FL slogdet kernel lower on real TPU Mosaic?

Small shapes for a fast compile; compares against the jnp twin.

Usage: python scripts/probe_flat_slogdet.py [--walkers 64] [--ndet 16]
       [--n 10] [--k 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=64)
    p.add_argument('--ndet', type=int, default=16)
    p.add_argument('--n', type=int, default=10)
    p.add_argument('--k', type=int, default=30)
    args = p.parse_args()

    from deepqmc_tpu.ops.fl_slogdet import (
        _pallas_blocked_flat_split,
        slogdet_fl_flat_split,
    )

    rng = np.random.default_rng(0)
    B, D, n, K = args.walkers, args.ndet, args.n, args.k
    nu = n // 2
    a = jnp.asarray(rng.normal(size=(B, n, D * n)), jnp.float32)
    a = a + jnp.tile(3.0 * jnp.eye(n), (1, D))  # well-conditioned
    ju = jnp.asarray(0.1 * rng.normal(size=(B, K, nu, D * n)), jnp.float32)
    jd = jnp.asarray(0.1 * rng.normal(size=(B, K, n - nu, D * n)), jnp.float32)
    la = jnp.asarray(0.1 * rng.normal(size=(B, n, D * n)), jnp.float32)

    t0 = time.perf_counter()
    got = jax.block_until_ready(
        _pallas_blocked_flat_split(a, ju, jd, la, D)
    )
    print(f'kernel compile+run {time.perf_counter() - t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        got = jax.block_until_ready(_pallas_blocked_flat_split(a, ju, jd, la, D))
    print(f'kernel run {(time.perf_counter() - t0) / 5 * 1e3:.2f} ms', flush=True)
    want = jax.block_until_ready(
        jax.vmap(lambda *t: slogdet_fl_flat_split(*t, D))(a, ju, jd, la)
    )
    # the old square-layout kernel on identical (unpacked) inputs — the
    # yardstick for how much f32 deviation the kernel family inherently has
    from deepqmc_tpu.ops.fl_slogdet import _pallas_blocked_split
    from deepqmc_tpu.ops.slogdet import unflatten_dets

    def unpack_j(jf):
        out = jf.reshape(*jf.shape[:-1], D, -1)
        return jnp.moveaxis(out, -2, -3)

    old = jax.block_until_ready(
        _pallas_blocked_split(
            unflatten_dets(a, D), unpack_j(ju), unpack_j(jd),
            unflatten_dets(la, D),
        )
    )
    ok = True
    for name, g, o, w in zip(('sign', 'logdet', 'jout', 'lout'), got, old, want):
        scale = float(jnp.abs(w).max()) or 1.0
        dev_flat = float(jnp.abs(g - w).max()) / scale
        dev_old = float(jnp.abs(o - w).max()) / scale
        print(f'{name}: rel|dev| flat {dev_flat:.3e}  old-kernel {dev_old:.3e}')
        ok = ok and dev_flat < max(10 * dev_old, 1e-5)
    print('FLAT SLOGDET KERNEL OK' if ok else 'FLAT KERNEL DEVIATES')


if __name__ == '__main__':
    main()
