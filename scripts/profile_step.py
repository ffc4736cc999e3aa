"""Attribute the headline-bench step time to its components.

Times, individually jitted and blocked: the decorr-N sampling scan, the plain
ansatz forward, the VMC loss value-and-gradient (forward-Laplacian local
energy + log-psi vjp), the KFAC curvature update + preconditioning, and the
sampler psi refresh.  Use this before touching any kernel.

Usage: python scripts/profile_step.py [--walkers N] [--mol H2O] [--ansatz psiformer]
       python scripts/profile_step.py --trace /tmp/jaxtrace   # jax.profiler trace
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(label, fn, *args, n=5, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{label:42s} {dt:9.1f} ms')
    return out, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--decorr', type=int, default=10)
    p.add_argument('--trace', default=None, help='dir for jax.profiler trace')
    args = p.parse_args()

    import deepqmc_tpu as dq
    from deepqmc_tpu.kfac import KFAC
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.optimizer import KFACOptimizer
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
    _, sampler = initialize_sampling(
        jax.random.PRNGKey(0),
        hamil,
        ansatz,
        mols,
        electronic_states=1,
        molecule_batch_size=1,
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
    rng = jax.random.PRNGKey(3)

    # --- sampling: decorr scan of Metropolis steps ---
    sample_j = jax.jit(sampler.sample)
    (_, phys_conf, _), t_sample = timed(
        f'sample (decorr {args.decorr})', sample_j, rng, smpl_state, params, mol_idxs
    )

    # --- plain forward over the batch (one MCMC inner step's wf cost) ---
    params0 = jax.tree_util.tree_map(lambda x: x[0], params)  # state 0
    pc_flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[3:]), phys_conf
    )
    fwd = jax.jit(
        lambda p, pc: jax.vmap(partial(ansatz.apply, p))(pc)
    )
    _, t_fwd = timed('forward psi (full batch)', fwd, params0, pc_flat)

    # --- local energy alone (forward Laplacian + potentials) ---
    le = hamil.local_energy(ansatz.apply)
    le_j = jax.jit(
        lambda rng_, p, pc: jax.vmap(partial(le, rng_, p))(pc)
    )
    _, t_le = timed('local energy (fwdlap)', le_j, rng, params0, pc_flat)

    # --- log-psi vjp alone (the VMC gradient's parameter pullback) ---
    from deepqmc_tpu.loss.loss_function import _batched_log_psi

    def logpsi_vjp(p0, pc, cot):
        _, pullback = jax.vjp(partial(_batched_log_psi, ansatz, pc), p0)
        return pullback(cot)

    vjp_j = jax.jit(logpsi_vjp)
    cot = jnp.ones(pc_flat.r.shape[0])
    _, t_vjp = timed('log-psi vjp (fwd+bwd)', vjp_j, params0, pc_flat, cot)

    # --- loss value and VMC gradient ---
    loss_fn = create_loss_fn(
        hamil, ansatz, clip_mask_fn=median_log_squeeze_and_mask
    )
    lag = getattr(loss_fn, 'value_and_grad', None) or jax.value_and_grad(
        loss_fn, has_aux=True
    )
    weight = jnp.ones(phys_conf.batch_shape)
    data = {
        'energy_ewm': jnp.full((1, 1), jnp.nan),
        'std_ewm': jnp.full((1, 1), jnp.nan),
    }
    from deepqmc_tpu.utils import tree_unstack

    # the loss takes a per-state params LIST (the optimizers unstack the
    # stacked tree before calling it, optimizer.py:48/71/112)
    lag_j = jax.jit(lambda r, p, batch: lag(tree_unstack(p), r, batch))
    _, t_lag = timed(
        'loss value+grad (E_loc + vjp)', lag_j, rng, params, (phys_conf, weight, data)
    )

    # --- full KFAC optimizer step ---
    opt = KFACOptimizer(
        lag,
        kfac=partial(
            KFAC,
            learning_rate_schedule=InverseSchedule(0.05, 10000),
            damping_schedule=ConstantSchedule(1e-3),
            norm_constraint=1e-3,
        ),
    )
    if hasattr(opt, 'bind_ansatz'):
        opt.bind_ansatz(ansatz)
    opt_state = opt.init(rng, params, (phys_conf, weight, data))
    step_j = jax.jit(opt.step)
    _, t_opt = timed(
        'KFAC opt.step (loss+grad+curv+precond)',
        step_j,
        rng,
        params,
        opt_state,
        (phys_conf, weight, data),
    )

    # --- sampler psi refresh ---
    upd_j = jax.jit(sampler.update)
    _, t_upd = timed('sampler.update (psi refresh)', upd_j, smpl_state, params)

    print('-' * 54)
    print(f'{"sum sample+opt.step+update":42s} {t_sample + t_opt + t_upd:9.1f} ms')
    print(f'{"  of which KFAC overhead (opt.step - loss)":42s} {t_opt - t_lag:9.1f} ms')
    print(f'{"  of which grad overhead (loss - E_loc)":42s} {t_lag - t_le:9.1f} ms')

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = step_j(rng, params, opt_state, (phys_conf, weight, data))
            jax.block_until_ready(out)
            out = sample_j(rng, smpl_state, params, mol_idxs)
            jax.block_until_ready(out)
        print(f'trace written to {args.trace}')


if __name__ == '__main__':
    main()
