"""Headline benchmark: walker-steps/sec/chip on H2O PsiFormer.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target (BASELINE.json): 20,000 walker-steps/sec/chip at 2048 walkers,
where one walker-step is one walker advanced through one optimization step.

Usage: python bench.py [--smoke] [--walkers N] [--steps N] [--mol NAME]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import numpy as np  # noqa: E402

BASELINE = 20000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--smoke', action='store_true', help='tiny shapes, quick check')
    p.add_argument('--walkers', type=int, default=None)
    p.add_argument('--steps', type=int, default=None)
    p.add_argument(
        '--full-stats',
        action='store_true',
        help='also print per-block step times to stderr',
    )
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--decorr', type=int, default=10)
    p.add_argument('--block', type=int, default=5, help='steps per jitted block')
    p.add_argument('--optimizer', default='kfac', choices=['kfac', 'adam', 'none'])
    p.add_argument(
        '--platform',
        default=None,
        help="force a jax platform (e.g. 'cpu' to smoke-run off-TPU)",
    )
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    # seed the persistent XLA compile cache from the repo-committed
    # bench_cache BEFORE the first jax compile: a fresh container's
    # ~/.cache is empty, and the init/sampler programs then compile in
    # seconds instead of minutes through the remote-compile tunnel
    seed_src = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'bench_cache', 'jax'
    )
    seed_dst = os.environ.get(
        'DEEPQMC_TPU_COMPILE_CACHE', os.path.expanduser('~/.cache/deepqmc_tpu/jax')
    )
    if os.path.isdir(seed_src):
        import shutil

        os.makedirs(seed_dst, exist_ok=True)
        for name in os.listdir(seed_src):
            dst = os.path.join(seed_dst, name)
            if not os.path.exists(dst):
                shutil.copy2(os.path.join(seed_src, name), dst)

    t_phase = time.perf_counter()

    def phase(name):
        """Startup attribution: phase durations to stderr (docs/PERF.md)."""
        nonlocal t_phase
        now = time.perf_counter()
        print(f'[bench-phase] {name}: {now - t_phase:.1f}s', file=sys.stderr)
        t_phase = now

    import deepqmc_tpu as dq
    from deepqmc_tpu.fit import fit_wf
    from deepqmc_tpu.kfac import KFAC
    from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
    from deepqmc_tpu.observable import default_observable_monitors
    from deepqmc_tpu.optimizer import KFACOptimizer, NoOptimizer, OptaxOptimizer
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.types import TrainState
    from deepqmc_tpu.utils import ConstantSchedule, InverseSchedule
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    walkers = args.walkers or (64 if args.smoke else 2048)
    n_steps = args.steps or (3 if args.smoke else 30)
    mol = 'H2' if args.smoke and args.mol == 'H2O' else args.mol
    preset_kwargs = (
        {'n_determinants': 2, 'embedding_dim': 32, 'n_interactions': 2, 'num_heads': 2}
        if args.smoke
        else {}
    )

    phase('imports')
    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz, **preset_kwargs))
    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        jax.random.PRNGKey(0),
        hamil,
        ansatz,
        mols,
        electronic_states=1,
        molecule_batch_size=1,
        elec_sampler=partial(
            combine_samplers,
            [
                DecorrSampler(length=args.decorr),
                partial(MetropolisSampler, tau=1.0),
            ],
        ),
    )
    phase('build_hamil_ansatz_sampler')
    params = init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    phase('init_params')
    smpl_state = initialize_sampler_state(
        jax.random.PRNGKey(2), sampler, params, walkers, mols
    )
    phase('init_sampler_state')
    if args.optimizer == 'kfac':
        opt_factory = partial(
            KFACOptimizer,
            kfac=partial(
                KFAC,
                learning_rate_schedule=InverseSchedule(0.05, 10000),
                damping_schedule=ConstantSchedule(1e-3),
                norm_constraint=1e-3,
            ),
        )
    elif args.optimizer == 'adam':
        import optax

        opt_factory = partial(OptaxOptimizer, optax_opt=optax.adam(1e-3))
    else:
        opt_factory = NoOptimizer

    # AOT executable cache: a warm start skips the minutes-long trace+compile
    # of the fused block entirely (deepqmc_tpu/aot.py).  bench_cache/ holds a
    # repo-committed artifact so even a fresh container warm-starts.
    from deepqmc_tpu.aot import AotCache

    aot_cache = AotCache(
        'bench_block',
        {
            'mol': mol,
            'coords': np.asarray(hamil.mol.coords).tolist(),
            'ansatz': args.ansatz,
            'preset_kwargs': preset_kwargs,
            'walkers': walkers,
            'decorr': args.decorr,
            'optimizer': args.optimizer,
            'block': args.block,
        },
        extra_dirs=[os.path.join(os.path.dirname(os.path.abspath(__file__)), 'bench_cache')],
    )

    block = max(1, min(args.block, n_steps))
    # skip two blocks before timing: the first compiles, the second typically
    # recompiles once more as output shardings replace the host-built carry
    warmup_steps = 2 * block
    # host wall time is noisy through the RPC tunnel and under CPU
    # contention, so time MANY blocks and report the MEDIAN per-step time
    # plus the spread — a single mean over 10 steps swings ~25% run to run
    block_ends = [time.perf_counter()]
    n_blocks_seen = 0
    for step, *_rest in fit_wf(
        jax.random.PRNGKey(3),
        hamil,
        ansatz,
        opt_factory,
        mol_idx_sampler,
        sampler,
        range(n_steps + warmup_steps),
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [m.finalize(hamil, ansatz.apply) for m in default_observable_monitors()],
        block_size=block,
        aot_cache=aot_cache,
    ):
        if (step + 1) % block == 0 or step == n_steps + warmup_steps - 1:
            block_ends.append(time.perf_counter())
            n_blocks_seen += 1
            if n_blocks_seen <= 2:
                phase(f'block_{n_blocks_seen}' + (
                    '_compile' if n_blocks_seen == 1 else '_recompile'
                ))
    block_ms = 1e3 * np.diff(np.asarray(block_ends))
    # drop compile/recompile blocks when enough timed blocks remain
    if len(block_ms) > 2:
        block_ms = block_ms[2:]
    step_ms = block_ms / block
    med_ms = float(np.median(step_ms))
    lo, hi = (
        (float(step_ms.min()), float(step_ms.max()))
        if len(step_ms)
        else (med_ms, med_ms)
    )
    spread = (hi - lo) / med_ms if med_ms else 0.0
    if args.full_stats:
        print(f'per-block step ms: {np.round(step_ms, 1).tolist()}', file=sys.stderr)
    n_chips = len(jax.devices())
    value = walkers / (med_ms / 1e3) / n_chips
    print(
        json.dumps(
            {
                'metric': 'walker-steps/sec/chip',
                'value': round(value, 1),
                'unit': f'walkers*opt_steps/s/chip ({mol} {args.ansatz}, '
                f'{walkers} walkers, decorr {args.decorr}, {args.optimizer}, '
                f'{n_chips} chip(s), median step {med_ms:.0f} ms over '
                f'{len(step_ms)} blocks x {block} steps, '
                f'spread {100 * spread:.0f}% [{lo:.0f}-{hi:.0f} ms])',
                'vs_baseline': round(value / BASELINE, 4),
            }
        )
    )


if __name__ == '__main__':
    main()
