"""Marginal (dispatch-free) timing of fwd / eloc via carry-dependent scan.

The axon RPC tunnel adds ~40 ms per dispatch and block_until_ready alone
does not synchronize, so single-call timings are useless. This times K
scanned applications with a carry->input dependence (so XLA cannot hoist
the body) and reports (T(K)-T(1))/(K-1).

Usage: python scripts/marginal_eloc.py [--walkers N] [--mol H2O] [--k 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal(fn, args, perturb_idx=0, k=4, reps=3):
    def scanned(K):
        @jax.jit
        def run(*args):
            def body(c, _):
                perturbed = list(args)
                perturbed[perturb_idx] = jax.tree_util.tree_map(
                    lambda x: x + c * 1e-30
                    if jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    perturbed[perturb_idx],
                )
                out = fn(*perturbed)
                total = sum(
                    jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(leaf.dtype, jnp.floating)
                )
                return c + total, None

            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        return run

    f1, fk = scanned(1), scanned(k)
    float(f1(*args))
    float(fk(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f1(*args))
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fk(*args))
    tk = (time.perf_counter() - t0) / reps
    return (tk - t1) / (k - 1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--k', type=int, default=4)
    p.add_argument('--only', default=None)
    args = p.parse_args()
    only = set(args.only.split(',')) if args.only else None

    import deepqmc_tpu as dq
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    conf = hamil.init_sample(jax.random.PRNGKey(3), hamil.mol.coords,
                             args.walkers)
    params = ansatz.init(jax.random.PRNGKey(1), conf[0])
    rngs = jax.random.split(jax.random.PRNGKey(4), args.walkers)

    def run(name):
        return only is None or name in only

    if run('fwd'):
        ms = marginal(
            lambda p_, c: jax.vmap(ansatz.apply, (None, 0))(p_, c).log,
            (params, conf),
            perturb_idx=1,
            k=args.k,
        )
        print(json.dumps({'component': 'fwd', 'marginal_ms': round(ms, 2)}),
              flush=True)
    if run('eloc'):
        ms = marginal(
            lambda r, p_, c: jax.vmap(
                hamil.local_energy(ansatz.apply), (0, None, 0)
            )(r, p_, c)[0],
            (rngs, params, conf),
            perturb_idx=2,
            k=args.k,
        )
        print(json.dumps({'component': 'eloc', 'marginal_ms': round(ms, 2)}),
              flush=True)


if __name__ == '__main__':
    main()
