"""Marginal per-call timing of the FL Pallas kernels at bench shapes.

Times K scanned applications with carry->input dependence (axon RPC adds
~40 ms per dispatch, so single-call wall times are useless) and reports
(T(k2)-T(k1))/(k2-k1) — the true device cost of one kernel call.

Usage: python scripts/probe_kernel_marginal.py [slogdet|attention] ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal(fn, args, k1=2, k2=8):
    def scanned(reps):
        @jax.jit
        def run(*a):
            def body(c, _):
                perturbed = [a[0] + c * 1e-30, *a[1:]]
                out = fn(*perturbed)
                tot = sum(
                    jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(out)
                )
                return tot * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return c
        return run

    out = {}
    for reps in (k1, k2):
        r = scanned(reps)
        float(np.asarray(r(*args)))  # compile + full sync (axon needs fetch)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(r(*args)))
            ts.append(time.perf_counter() - t0)
        out[reps] = min(ts)
    return (out[k2] - out[k1]) / (k2 - k1) * 1e3


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else 'slogdet'
    B, K, n, D = 2048, 30, 10, 16
    nu = 5
    rng = np.random.default_rng(0)
    if what == 'slogdet':
        from deepqmc_tpu.ops.fl_slogdet import _pallas_blocked_flat_split

        a_flat = jnp.asarray(
            rng.normal(size=(B, n, D * n)), jnp.float32
        ) + jnp.tile(3 * jnp.eye(n), (1, D))
        ju = jnp.asarray(rng.normal(size=(B, K, nu, D * n)), jnp.float32)
        jd = jnp.asarray(rng.normal(size=(B, K, n - nu, D * n)), jnp.float32)
        la = jnp.asarray(rng.normal(size=(B, n, D * n)), jnp.float32)
        ms = marginal(
            lambda af, ju_, jd_, la_: _pallas_blocked_flat_split(
                af, ju_, jd_, la_, D
            ),
            (a_flat, ju, jd, la),
        )
        print(f'slogdet_fl_flat_split marginal: {ms:.2f} ms/call '
              f'(B={B}, K={K}, n={n}, D={D})', flush=True)
    elif what == 'attention':
        from deepqmc_tpu.ops.fl_attention import _pallas_blocked

        H, dh = 4, 64
        shp = (B, n, H, dh)
        jshp = (B, K, n, H, dh)
        args = [jnp.asarray(rng.normal(size=shp), jnp.float32) for _ in range(3)]
        jargs = [
            jnp.asarray(rng.normal(size=jshp), jnp.float32) for _ in range(3)
        ]
        largs = [
            jnp.asarray(rng.normal(size=shp), jnp.float32) for _ in range(3)
        ]
        ms = marginal(
            lambda q, k, v, jq, jk, jv, lq, lk, lv: _pallas_blocked(
                q, k, v, jq, jk, jv, lq, lk, lv
            ),
            (*args, *jargs, *largs),
        )
        print(f'mha_core_fl marginal: {ms:.2f} ms/call '
              f'(B={B}, K={K}, n={n}, H={H}, dh={dh})', flush=True)


if __name__ == '__main__':
    main()
