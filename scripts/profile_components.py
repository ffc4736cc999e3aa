"""Attribute the training-step wall time to its components on real hardware.

Times (compile, run) separately for: WF forward, one Metropolis sweep,
decorr-10 sampling, local energy (forward Laplacian), loss value-and-grad,
and the full KFAC step.  Prints one JSON line per component.

Usage: python scripts/profile_components.py [--walkers N] [--mol H2O]
       [--ansatz psiformer] [--only fwd,sample,...]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(label, fn, *args, repeats=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = jax.block_until_ready(fn(*args))
    run_ms = (time.perf_counter() - t0) / repeats * 1e3
    print(
        json.dumps(
            {'component': label, 'run_ms': round(run_ms, 2),
             'compile_s': round(compile_s, 1)}
        ),
        flush=True,
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--decorr', type=int, default=10)
    p.add_argument('--only', default=None, help='comma list of components')
    args = p.parse_args()
    only = set(args.only.split(',')) if args.only else None

    import deepqmc_tpu as dq
    from deepqmc_tpu.kfac import KFAC
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.utils import ConstantSchedule, InverseSchedule
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    mols = [hamil.mol]
    rng = jax.random.PRNGKey(0)
    mol_idx_sampler, sampler = initialize_sampling(
        rng, hamil, ansatz, mols, 1, 1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=args.decorr), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        jax.random.PRNGKey(2), sampler, params, args.walkers, mols
    )
    mol_idxs = jnp.zeros(1, jnp.int32)

    def run(name):
        return only is None or name in only

    # flat walker batch for fwd / E_loc timing
    flat_conf = hamil.init_sample(jax.random.PRNGKey(3), hamil.mol.coords,
                                  args.walkers)
    params0 = jax.tree_util.tree_map(lambda x: x[0], params)

    if run('fwd'):
        fwd = jax.jit(lambda p, c: jax.vmap(ansatz.apply, (None, 0))(p, c).log)
        timed('fwd', fwd, params0, flat_conf)

    if run('eloc'):
        eloc = jax.jit(
            lambda r, p, c: jax.vmap(hamil.local_energy(ansatz.apply),
                                     (0, None, 0))(r, p, c)[0]
        )
        rngs = jax.random.split(jax.random.PRNGKey(4), args.walkers)
        timed('eloc_fwdlap', eloc, rngs, params0, flat_conf)

    if run('sample'):
        from deepqmc_tpu.utils import sampling_precision_ctx

        def _sample(r, s, p):
            with sampling_precision_ctx():
                return sampler.sample(r, s, p, mol_idxs)[0]['elec']['r']

        sample = jax.jit(_sample)
        timed(f'sample_decorr{args.decorr}', sample, jax.random.PRNGKey(5),
              smpl_state, params)

    phys_conf = None
    if run('grad') or run('kfac'):
        _, phys_conf, _ = jax.jit(sampler.sample)(
            jax.random.PRNGKey(6), smpl_state, params, mol_idxs
        )
        weight = jnp.ones(phys_conf.batch_shape)
        data = {'energy_ewm': jnp.zeros((1, 1)), 'std_ewm': jnp.zeros((1, 1))}
        batch = (phys_conf, weight, data)
        loss_fn = create_loss_fn(hamil, ansatz,
                                 clip_mask_fn=median_log_squeeze_and_mask)

    if run('grad'):
        vag = jax.jit(
            lambda p, r, b: loss_fn.value_and_grad(p, r, b)
        )
        from deepqmc_tpu.utils import tree_unstack

        timed('loss_value_and_grad', vag, tree_unstack(params),
              jax.random.PRNGKey(7), batch)

    if run('kfac'):
        from deepqmc_tpu.utils import tree_unstack

        kfac = KFAC(
            loss_fn.value_and_grad,
            learning_rate_schedule=InverseSchedule(0.05, 10000),
            damping_schedule=ConstantSchedule(1e-3),
            norm_constraint=1e-3,
        )
        kfac.bind_ansatz(ansatz)
        params_list = tree_unstack(params)
        opt_state = kfac.init(jax.random.PRNGKey(8), params_list, batch)
        step = jax.jit(
            lambda r, p, s, b: kfac.step(r, p, s, b)[1]
        )
        timed('kfac_step', step, jax.random.PRNGKey(9), params_list,
              opt_state, batch)


if __name__ == '__main__':
    main()
