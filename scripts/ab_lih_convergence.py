"""Short LiH convergence A/B for optimizer/precision knobs on real hardware.

Two knobs the framework defaults differ from the reference in, each of which
needs measured (not asserted) evidence:

- KFAC ``inverse_update_period`` (default 5, reference recomputes every
  step): does amortizing the Cholesky inverses change convergence?
- ``DEEPQMC_TPU_SAMPLING_PRECISION`` (default 'high' 3-pass bf16 for the
  pure-forward MCMC sweeps; local energies stay 'highest'): does it bias
  the sampled distribution?

Runs the CLI path on LiH (progression config 2) for a fixed step budget per
variant and reports the final EWM energy +/- sampling error of an
evaluation phase.  Results land in docs/evidence/ab_lih_convergence.jsonl.

Usage: python scripts/ab_lih_convergence.py [--steps 1500] [--variants a,b]
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: the round-4 default flip made JAC_MATMUL=bf16 / GRAD_PRECISION=high
# the production defaults; every pre-r4 variant pins them OFF explicitly so
# the variant names keep their original semantics.
_PRE_R4 = {'DEEPQMC_TPU_JAC_MATMUL': 'f32', 'DEEPQMC_TPU_GRAD_PRECISION': 'inherit'}
VARIANTS = {
    # TRUE reference semantics: matmul precision 'highest' everywhere,
    # f32 jac storage AND contractions, inverses recomputed every step —
    # the control the five stacked TPU-default levers are validated against
    'baseline': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'highest',
            'DEEPQMC_TPU_JAC_DTYPE': 'f32',
            **_PRE_R4,
        },
        'inv_period': 1,
    },
    'inv5': {
        'env': {'DEEPQMC_TPU_SAMPLING_PRECISION': 'highest', **_PRE_R4},
        'inv_period': 5,
    },
    'inv5_samphigh': {
        'env': {'DEEPQMC_TPU_SAMPLING_PRECISION': 'high', **_PRE_R4},
        'inv_period': 5,
    },
    # production defaults + the bf16 Jacobian storage channel (fwdlap.py
    # DEEPQMC_TPU_JAC_DTYPE) — the convergence gate for that perf lever
    'jac_bf16': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'high',
            'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
            **_PRE_R4,
        },
        'inv_period': 5,
    },
    # round-4 levers, each stacked on the current production defaults:
    # native-bf16 MXU jac contractions (fwdlap.py _jac_matmul_bf16)
    'jacmm_bf16': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'high',
            'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
            'DEEPQMC_TPU_JAC_MATMUL': 'bf16',
        },
        'inv_period': 5,
    },
    # 3-pass-bf16 matmuls in the VMC-gradient vjp (utils.grad_precision_ctx)
    'grad_high': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'high',
            'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
            'DEEPQMC_TPU_GRAD_PRECISION': 'high',
        },
        'inv_period': 5,
    },
    # both round-4 levers together (the promotion candidate)
    'r4_all': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'high',
            'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
            'DEEPQMC_TPU_JAC_MATMUL': 'bf16',
            'DEEPQMC_TPU_GRAD_PRECISION': 'high',
        },
        'inv_period': 5,
    },
    # round-5 candidate: single-pass bf16 matmuls in the pure-forward MCMC
    # sweeps (acceptance log-ratios are O(0.1-1); bf16 rounding is ~1e-3) —
    # stacked on the full production defaults
    'samp_bf16': {
        'env': {
            'DEEPQMC_TPU_SAMPLING_PRECISION': 'default',
            'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
            'DEEPQMC_TPU_JAC_MATMUL': 'bf16',
            'DEEPQMC_TPU_GRAD_PRECISION': 'high',
        },
        'inv_period': 5,
    },
}

REFERENCE = -8.07000  # reference doc/tutorial.rst:153


def run(cmd, env_extra, timeout):
    env = dict(os.environ, **env_extra)
    print('+', ' '.join(cmd), env_extra, flush=True)
    proc = subprocess.run(cmd, env=env, timeout=timeout)
    assert proc.returncode == 0, f'rc={proc.returncode}'


def final_energy(workdir):
    import h5py
    import numpy as np

    with h5py.File(Path(workdir) / 'evaluation' / 'result.h5', 'r') as f:
        e_loc = np.asarray(f['local_energy/samples'])
    samples = e_loc.reshape(len(e_loc), -1)
    step_means = samples.mean(axis=1)
    return float(samples.mean()), float(step_means.std() / len(step_means) ** 0.5)


def robust_energy(workdir):
    """10-MAD-clipped eval mean: a single near-node walker can pull the raw
    mean by tens of mHa on short-budget wavefunctions (seen on the r5
    baseline control: one -890 Ha sample = -20 mHa on the raw mean), so the
    A/B gate rows also carry an outlier-insensitive estimate."""
    import h5py
    import numpy as np

    with h5py.File(Path(workdir) / 'evaluation' / 'result.h5', 'r') as f:
        e = np.asarray(f['local_energy/samples']).reshape(-1)
    med = np.median(e)
    mad = np.median(np.abs(e - med))
    mask = np.abs(e - med) < 10 * mad
    return float(e[mask].mean()), float(e[mask].std() / mask.sum() ** 0.5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=1500)
    p.add_argument('--eval-steps', type=int, default=200)
    p.add_argument('--pretrain-steps', type=int, default=500)
    p.add_argument('--variants', default=None)
    p.add_argument('--workdir', default='runs/ab_lih')
    p.add_argument(
        '--seed',
        type=int,
        default=None,
        help='override task.seed (seed-spread error bars, VERDICT r4 #8); '
        'the workdir and the jsonl row are suffixed with the seed',
    )
    args = p.parse_args()
    names = args.variants.split(',') if args.variants else list(VARIANTS)

    out = Path('docs/evidence/ab_lih_convergence.jsonl')
    out.parent.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = VARIANTS[name]
        wd = Path(args.workdir) / (
            name if args.seed is None else f'{name}_seed{args.seed}'
        )
        seed_overrides = (
            [] if args.seed is None else [f'task.seed={args.seed}']
        )
        t0 = time.time()
        run(
            [
                sys.executable,
                '-m',
                'deepqmc_tpu',
                'hamil/mol=LiH',
                'task.electron_batch_size=1024',
                f'task.steps={args.steps}',
                f'task.pretrain_steps={args.pretrain_steps}',
                '+task.fit_block_size=10',
                f'task.opt.kfac.inverse_update_period={spec["inv_period"]}',
                *seed_overrides,
                f'--workdir={wd}',
            ],
            spec['env'],
            timeout=7200,
        )
        train_s = time.time() - t0
        run(
            [
                sys.executable,
                '-m',
                'deepqmc_tpu',
                'task=evaluate',
                f'task.restdir={wd}/training',
                f'+task.steps={args.eval_steps}',
                '+task.fit_block_size=10',
                f'--workdir={wd}_eval',
            ],
            spec['env'],
            timeout=3600,
        )
        energy, err = final_energy(f'{wd}_eval')
        energy_rob, err_rob = robust_energy(f'{wd}_eval')
        row = {
            'variant': name if args.seed is None else f'{name}_seed{args.seed}',
            'energy': energy,
            'err': err,
            'dev_mha': (energy - REFERENCE) * 1e3,
            'energy_robust': energy_rob,
            'err_robust': err_rob,
            'steps': args.steps,
            'train_seconds': round(train_s),
        }
        with open(out, 'a') as f:
            f.write(json.dumps(row) + '\n')
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
