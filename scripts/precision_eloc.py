"""Accuracy + speed of the forward-Laplacian local energy vs matmul precision.

One precision per process (set DEEPQMC_TPU_MATMUL_PRECISION before import so
the global default applies everywhere, exactly as a real run would see it).
Saves per-walker local energies to --out for cross-precision comparison and
prints the amortized eloc time over --reps dispatches.

Usage:
  DEEPQMC_TPU_MATMUL_PRECISION=highest python scripts/precision_eloc.py --out /tmp/e_highest.npy
  DEEPQMC_TPU_MATMUL_PRECISION=high    python scripts/precision_eloc.py --out /tmp/e_high.npy
  python scripts/precision_eloc.py --compare /tmp/e_highest.npy /tmp/e_high.npy
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(paths):
    import numpy as np

    ref = np.load(paths[0])
    print(f'reference: {paths[0]}  mean {ref.mean():+.6f}  std {ref.std():.4f}')
    for p in paths[1:]:
        e = np.load(p)
        dev = np.abs(e - ref)
        print(
            f'{p}: mean {e.mean():+.6f}  |dev| mean {dev.mean():.2e} '
            f'max {dev.max():.2e}  mean-shift {e.mean() - ref.mean():+.2e}'
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--reps', type=int, default=10)
    p.add_argument('--out', default=None)
    p.add_argument('--compare', nargs='+', default=None)
    p.add_argument('--trace', default=None, help='dir for jax.profiler trace')
    args = p.parse_args()
    if args.compare:
        compare(args.compare)
        return

    import jax
    import numpy as np

    import deepqmc_tpu as dq
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    prec = os.environ.get('DEEPQMC_TPU_MATMUL_PRECISION', 'highest')
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

    @jax.jit
    def eloc_batch(pc):
        return jax.vmap(partial(le, rng, params))(pc)[0]

    E = jax.block_until_ready(eloc_batch(pc))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        E = eloc_batch(pc)
    jax.block_until_ready(E)
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    E = np.asarray(E)
    print(
        f'precision {prec:8s}: eloc {ms:7.1f} ms  '
        f'E mean {E.mean():+.6f} std {E.std():.4f}',
        flush=True,
    )
    if args.out:
        np.save(args.out, E)
    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(eloc_batch(pc))
        print(f'trace written to {args.trace}')


if __name__ == '__main__':
    main()
