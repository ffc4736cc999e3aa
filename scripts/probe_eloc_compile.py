"""Compile-probe the local energy for a molecule on the current backend.

Validates that the fl_slogdet VMEM plan (ops/fl_slogdet.py _flat_split_plan)
produces a Mosaic kernel that actually fits VMEM for large systems (ScO blew
the 128M budget with the unplanned kernel, runs/logs/acc_sco.log) without
paying for a full training launch.

Usage: python scripts/probe_eloc_compile.py ScO [--ecp ccECP] [--walkers 64]
       [--ansatz psiformer] [--run]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('mol')
    p.add_argument('--ecp', default=None)
    p.add_argument('--walkers', type=int, default=64)
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--run', action='store_true', help='also execute one batch')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import deepqmc_tpu as dq
    from deepqmc_tpu.loss.energy import compute_local_energy
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    t0 = time.perf_counter()
    kwargs = {'ecp_type': args.ecp} if args.ecp else {}
    hamil = dq.MolecularHamiltonian(
        mol=dq.Molecule.from_name(args.mol), **kwargs
    )
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    params = init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    pc = hamil.init_sample(
        jax.random.PRNGKey(2), hamil.mol.coords, args.walkers
    )
    pc = jax.tree_util.tree_map(lambda x: x[None, None], pc)
    print(f'[probe] built in {time.perf_counter() - t0:.1f}s', flush=True)

    t0 = time.perf_counter()
    f = jax.jit(
        lambda p, c: compute_local_energy(
            jax.random.PRNGKey(3), hamil, ansatz.apply, p, c
        )[0]
    )
    lowered = f.lower(params, pc)
    compiled = lowered.compile()
    print(
        f'[probe] {args.mol} eloc compiled in {time.perf_counter() - t0:.1f}s',
        flush=True,
    )
    if args.run:
        t0 = time.perf_counter()
        e = compiled(params, pc)
        e = jax.block_until_ready(e)
        print(
            f'[probe] ran in {time.perf_counter() - t0:.1f}s, '
            f'E mean {jnp.mean(e):.4f} finite {bool(jnp.isfinite(e).all())}',
            flush=True,
        )


if __name__ == '__main__':
    main()
