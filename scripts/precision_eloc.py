"""Accuracy + speed of the forward-Laplacian local energy vs matmul precision.

Compiles the same eloc under jax.default_matmul_precision contexts
('highest'/'high'/'default') and reports per-walker deviations from the
'highest' result plus marginal timing (carry-perturbed scan, dispatch-free).

Usage: python scripts/precision_eloc.py [--walkers N] [--mol H2O]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal_ms(fn, x, k=4, reps=3):
    """(T(k)-T(1))/(k-1) of fn applied to a carry-perturbed input."""

    def scanned(K):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c * 1e-30)
                return jnp.sum(out).astype(jnp.float32), None

            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        return run

    f1, fk = scanned(1), scanned(k)
    jax.block_until_ready(f1(x))
    jax.block_until_ready(fk(x))
    ts = []
    for f, K in ((f1, 1), (fk, k)):
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f(x))
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (k - 1) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=512)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    args = p.parse_args()

    import deepqmc_tpu as dq
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    params = jax.tree_util.tree_map(
        lambda x: x[0], init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    )
    pc = hamil.init_sample(
        jax.random.PRNGKey(2), hamil.mol.coords, args.walkers, 1.0
    )
    le = hamil.local_energy(ansatz.apply)
    rng = jax.random.PRNGKey(3)

    results = {}
    for prec in ('highest', 'high', 'default'):
        with jax.default_matmul_precision(prec):

            @jax.jit
            def eloc_batch(r):
                pc_ = pc.replace(r=r)
                return jax.vmap(partial(le, rng, params))(pc_)[0]

            E = np.asarray(jax.block_until_ready(eloc_batch(pc.r)))
            ms = marginal_ms(lambda r: eloc_batch(r), pc.r)
        results[prec] = (E, ms)
        ref = results['highest'][0]
        dev = np.abs(E - ref)
        print(
            f'{prec:8s}: eloc {ms:7.1f} ms   E mean {E.mean():+.6f}  '
            f'std {E.std():.4f}   |dev| mean {dev.mean():.2e} '
            f'max {dev.max():.2e}',
            flush=True,
        )


if __name__ == '__main__':
    main()
