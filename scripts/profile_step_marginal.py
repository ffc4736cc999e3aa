"""Dispatch-free component attribution of the full training step.

The round-3/4 VERDICTs ask for a trace table that includes the OPTIMIZER
half of the step (sampling / eloc / vjp / KFAC factors+inverses / update).
Single-call timings are meaningless through the ~40 ms axon RPC tunnel
(block_until_ready does not synchronize), so every component here is timed
with the carry-dependent-scan marginal from scripts/marginal_eloc.py:
T(K)-scanned minus T(1)-scanned over K-1.

Components (all at the headline H2O/psiformer/2048 shapes by default):

- sample_decorrN: the full MCMC sweep (N sequential MH forwards)
- fwd:            one plain batched forward (an MH step's wf cost)
- eloc:           forward-Laplacian local energies
- vag:            loss value-and-grad = eloc + clip + log-psi vjp
- vag_taps:       ditto + fused KFAC curvature taps (the production path)
- kfac_inv:       KFAC step WITH inverse refresh (inverse_update_period=1)
- kfac_noinv:     KFAC step withOUT refresh (amortized steps)
- update:         sampler psi-cache refresh

Prints one JSON line per component -> tee into
docs/evidence/step_attribution_r05.jsonl.

Usage: python scripts/profile_step_marginal.py [--walkers 2048] [--mol H2O]
       [--ansatz psiformer] [--only sample,eloc,...]
"""

import argparse
import json
import os
import sys
from functools import partial

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp

from marginal_eloc import marginal  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--decorr', type=int, default=10)
    p.add_argument('--k', type=int, default=4)
    p.add_argument('--only', default=None)
    args = p.parse_args()
    only = set(args.only.split(',')) if args.only else None

    def want(name):
        return only is None or name in only

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
    from deepqmc_tpu.utils import (
        ConstantSchedule,
        InverseSchedule,
        sampling_precision_ctx,
        tree_unstack,
    )
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    mols = [hamil.mol]
    _, sampler = initialize_sampling(
        jax.random.PRNGKey(0),
        hamil,
        ansatz,
        mols,
        1,
        1,
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

    def report(component, ms):
        print(
            json.dumps(
                {
                    'component': component,
                    'ms': round(ms, 1),
                    'walkers': args.walkers,
                    'mol': args.mol,
                    'ansatz': args.ansatz,
                }
            ),
            flush=True,
        )

    flat_conf = hamil.init_sample(
        jax.random.PRNGKey(3), hamil.mol.coords, args.walkers
    )
    params0 = jax.tree_util.tree_map(lambda x: x[0], params)

    if want('sample'):
        def sample_fn(p, rng, state):
            with sampling_precision_ctx():
                out = sampler.sample(rng, state, p, mol_idxs)
            return out[0]['elec']['r']

        ms = marginal(sample_fn, [params, jax.random.PRNGKey(5), smpl_state], k=args.k)
        report(f'sample_decorr{args.decorr}', ms)

    if want('fwd'):
        def fwd_fn(p, c):
            # ctx must be active at TRACE time (inside the marginal's jit)
            with sampling_precision_ctx():
                return jax.vmap(ansatz.apply, (None, 0))(p, c).log

        ms = marginal(fwd_fn, [params0, flat_conf], k=args.k)
        report('fwd', ms)

    if want('eloc'):
        rngs = jax.random.split(jax.random.PRNGKey(4), args.walkers)
        ms = marginal(
            lambda p, r, c: jax.vmap(
                hamil.local_energy(ansatz.apply), (0, None, 0)
            )(r, p, c)[0],
            [params0, rngs, flat_conf],
            k=args.k,
        )
        report('eloc_fwdlap', ms)

    # batched [mol=1, state=1, walker] grid for the loss/optimizer surface
    phys_conf = jax.tree_util.tree_map(lambda x: x[None, None], flat_conf)
    weight = jnp.ones(phys_conf.batch_shape)
    data = {'energy_ewm': jnp.zeros((1, 1)), 'std_ewm': jnp.zeros((1, 1))}
    batch = (phys_conf, weight, data)
    loss_fn = create_loss_fn(
        hamil, ansatz, clip_mask_fn=median_log_squeeze_and_mask
    )

    if want('vag'):
        ms = marginal(
            lambda p, r, b: loss_fn.value_and_grad(tree_unstack(p), r, b)[1],
            [params, jax.random.PRNGKey(7), batch],
            k=args.k,
        )
        report('loss_value_and_grad', ms)

    if want('vag_taps') or want('kfac_inv') or want('kfac_noinv'):
        def make_kfac(period):
            kfac = KFAC(
                loss_fn.value_and_grad,
                learning_rate_schedule=InverseSchedule(0.05, 10000),
                damping_schedule=ConstantSchedule(1e-3),
                norm_constraint=1e-3,
                inverse_update_period=period,
            )
            kfac.bind_ansatz(ansatz)
            return kfac

        params_list = tree_unstack(params)
        kfac1 = make_kfac(1)
        opt_state = kfac1.init(jax.random.PRNGKey(8), params_list, batch)

        if want('vag_taps'):
            metas = kfac1._layer_meta or kfac1._discover_layers(
                params_list[0],
                jax.tree_util.tree_map(
                    lambda x: x.reshape(-1, *x.shape[3:])[0], phys_conf
                ),
            )
            from deepqmc_tpu.kfac.kfac import factor_sums

            taps_spec = {m.path: list(m.out_shapes) for m in metas}
            ms = marginal(
                lambda p, r, b: loss_fn.value_grad_and_taps(
                    tree_unstack(p), r, b, taps_spec, partial(factor_sums, metas)
                )[1],
                [params, jax.random.PRNGKey(7), batch],
                k=args.k,
            )
            report('loss_value_grad_and_taps', ms)

        if want('kfac_inv'):
            ms = marginal(
                lambda p, r, s, b: kfac1.step(r, tree_unstack(p), s, b)[0],
                [params, jax.random.PRNGKey(9), opt_state, batch],
                k=args.k,
            )
            report('kfac_step_with_inverse', ms)

        if want('kfac_noinv'):
            # period 1000 + step counter 1 in the state -> cond skips refresh
            kfacN = make_kfac(1000)
            stateN = dict(opt_state, step=jnp.array(1))
            ms = marginal(
                lambda p, r, s, b: kfacN.step(r, tree_unstack(p), s, b)[0],
                [params, jax.random.PRNGKey(9), stateN, batch],
                k=args.k,
            )
            report('kfac_step_amortized', ms)

    if want('update'):
        ms = marginal(
            lambda p, s: sampler.update(s, p)['elec']['psi'].log,
            [params, smpl_state],
            k=args.k,
        )
        report('sampler_update', ms)


if __name__ == '__main__':
    main()
