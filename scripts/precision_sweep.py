"""Sweep matmul precision for the WF forward and forward-Laplacian kernels.

Times K scanned applications inside ONE dispatch and reports the marginal
per-application time ((T(K)-T(1))/(K-1)), removing host-dispatch latency.

Usage: python scripts/precision_sweep.py [--walkers N] [--mol H2O]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal_time(make_fn, args, k=4, repeats=5):
    def scanned(K):
        f = make_fn()

        def body(c, _):
            out = f(*args)
            # fold output into carry so nothing is dead code
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))
            return c + s, None

        return jax.jit(lambda: jax.lax.scan(body, 0.0, None, length=K)[0])

    f1, fk = scanned(1), scanned(k)
    jax.block_until_ready(f1())
    jax.block_until_ready(fk())
    t0 = time.perf_counter()
    for _ in range(repeats):
        jax.block_until_ready(f1())
    t1 = (time.perf_counter() - t0) / repeats
    t0 = time.perf_counter()
    for _ in range(repeats):
        jax.block_until_ready(fk())
    tk = (time.perf_counter() - t0) / repeats
    return (tk - t1) / (k - 1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--precisions', default='highest,high,default')
    args = p.parse_args()

    import deepqmc_tpu as dq
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    conf = hamil.init_sample(jax.random.PRNGKey(3), hamil.mol.coords, args.walkers)
    params = ansatz.init(jax.random.PRNGKey(1), conf[0])
    rngs = jax.random.split(jax.random.PRNGKey(4), args.walkers)

    for prec in args.precisions.split(','):
        jax.config.update('jax_default_matmul_precision', prec)
        jax.clear_caches()
        fwd_ms = marginal_time(
            lambda: (lambda p_, c: jax.vmap(ansatz.apply, (None, 0))(p_, c).log),
            (params, conf),
        )
        eloc_ms = marginal_time(
            lambda: (
                lambda r, p_, c: jax.vmap(
                    hamil.local_energy(ansatz.apply), (0, None, 0)
                )(r, p_, c)[0]
            ),
            (rngs, params, conf),
        )
        print(
            json.dumps(
                {'precision': prec, 'fwd_ms': round(fwd_ms, 2),
                 'eloc_ms': round(eloc_ms, 2)}
            ),
            flush=True,
        )


if __name__ == '__main__':
    main()
