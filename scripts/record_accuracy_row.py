"""Record one ACCURACY.md row from an existing evaluation workdir.

For runs whose training was intentionally stopped early (shared-chip time
budget): reads the evaluation result.h5, compares against the configured
reference, and merges the row into docs/ACCURACY.md via the accuracy
harness's own table writer — with the actual trained step count recorded
honestly in the description.

Usage: python scripts/record_accuracy_row.py --config h2o \
           --eval-workdir runs/accuracy/h2o_eval --trained-steps 6000
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    'accuracy_runs', os.path.join(os.path.dirname(__file__), 'accuracy_runs.py')
)
acc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(acc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--eval-workdir', required=True)
    p.add_argument('--trained-steps', type=int, required=True)
    p.add_argument(
        '--train-seconds',
        type=float,
        default=None,
        help='cumulative training wall time (sums across resumed segments)',
    )
    args = p.parse_args()
    cfg = acc.CONFIGS[args.config]
    per_state = acc.read_per_state_energies(args.eval_workdir)
    energy, err = per_state[0]
    dev_mha = (energy - cfg['reference']) * 1e3
    row = {
        'config': args.config,
        'description': cfg['description']
        + f' [{args.trained_steps} steps trained]',
        'energy': energy,
        'err': err,
        'reference': cfg['reference'],
        'reference_source': cfg['reference_source'],
        'deviation_mha': dev_mha,
        'within_tol': abs(dev_mha) <= cfg['tol_mha'],
        'train_seconds': round(args.train_seconds) if args.train_seconds else None,
    }
    if len(per_state) > 1:
        row['excited_energies'] = per_state[1:]
        gap_ha = per_state[1][0] - per_state[0][0]
        gap_err = (per_state[0][1] ** 2 + per_state[1][1] ** 2) ** 0.5
        row['gap_ev'] = gap_ha * 27.211386
        row['gap_err_ev'] = gap_err * 27.211386
        osc = acc.read_oscillator_strength(args.eval_workdir)
        if osc:
            row['oscillator_strength_01'], row['oscillator_strength_01_err'] = osc
    print(json.dumps(row))
    acc._write_table([row])
    print('merged into docs/ACCURACY.md')


if __name__ == '__main__':
    main()
