"""ScO dissociation energy — an offset-invariant accuracy axis for config 4.

The packaged Sc ECP table is an in-house LDA refit whose local channel
carries an arbitrary constant offset, so the ScO *total* valence energy is
not comparable to published ccECP numbers (docs/ACCURACY.md, VERDICT r4
item 9).  The dissociation energy

    D_e = E(Sc) + E(O) - E(ScO)

computed with the SAME tables cancels any per-atom constant offset exactly
(each atom's local-channel shift appears once on both sides), so its
deviation from literature is meaningful.

Runs the Sc (2D, spin=1) and O (3P, spin=2) atoms through the identical
CLI path / ansatz / ECP configuration as the ScO progression run, evaluates
both, and combines with the stored ScO row (docs/evidence/accuracy_rows.json)
into docs/evidence/sco_dissociation.json.

Literature anchor: experimental D_0(ScO) = 6.92(10) eV [Merer, Annu. Rev.
Phys. Chem. 40, 407 (1989)]; ccECP-based correlated estimates sit within
~0.1 eV of this.  NOTE a one-sided systematic: at the matched 2000-2500
step budget the 17-valence-electron molecule is farther from its
variational limit than the 11/6-electron atoms, so the VMC D_e is expected
to come out LOW (under-bound); the number is reported with that caveat.

Usage: python scripts/sco_dissociation.py [--steps 2000] [--workdir runs/accuracy]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from accuracy_runs import ROWS_STORE, read_per_state_energies, run_cli  # noqa: E402

EV = 27.211386245988  # Ha -> eV

ATOMS = {
    'sc_atom': {
        'mol': 'Sc',  # 2D, spin=1 (packaged Sc.yaml)
        'steps_scale': 1.0,
    },
    'o_atom': {
        'mol': 'O',  # 3P, spin=2
        'steps_scale': 1.0,
    },
}


def train_and_eval(name, mol, steps, pretrain_steps, eval_steps, workdir):
    wd = Path(workdir) / name
    done_log = wd / 'deepqmc.log'
    if not (
        done_log.exists() and 'training has been completed' in done_log.read_text()
    ):
        run_cli(
            [
                'task=train_psiformer',
                f'hamil/mol={mol}',
                '+hamil.ecp_type=ccECP',
                'task.electron_batch_size=1024',
                f'task.steps={steps}',
                f'task.pretrain_steps={pretrain_steps}',
                '+task.fit_block_size=10',
            ],
            wd,
        )
    eval_wd = Path(workdir) / f'{name}_eval'
    eval_done = eval_wd / 'deepqmc.log'
    if not (
        eval_done.exists() and 'training has been completed' in eval_done.read_text()
    ):
        run_cli(
            [
                'task=evaluate',
                f'task.restdir={wd}/training',
                f'+task.steps={eval_steps}',
                '+task.fit_block_size=10',
            ],
            eval_wd,
        )
    return read_per_state_energies(eval_wd)[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--pretrain-steps', type=int, default=500)
    p.add_argument('--eval-steps', type=int, default=300)
    p.add_argument('--workdir', default='runs/accuracy')
    args = p.parse_args()

    energies = {}
    for name, spec in ATOMS.items():
        t0 = time.time()
        e, err = train_and_eval(
            name,
            spec['mol'],
            args.steps,
            args.pretrain_steps,
            args.eval_steps,
            args.workdir,
        )
        energies[name] = {'energy': e, 'err': err, 'seconds': round(time.time() - t0)}
        print(json.dumps({name: energies[name]}), flush=True)

    rows = {r['config']: r for r in json.loads(ROWS_STORE.read_text())}
    sco = rows['sco']
    de_ha = (
        energies['sc_atom']['energy'] + energies['o_atom']['energy'] - sco['energy']
    )
    de_err_ha = (
        energies['sc_atom']['err'] ** 2
        + energies['o_atom']['err'] ** 2
        + sco['err'] ** 2
    ) ** 0.5
    out = {
        'de_ev': de_ha * EV,
        'de_err_ev': de_err_ha * EV,
        'de_ha': de_ha,
        'de_err_ha': de_err_ha,
        'e_sco': {'energy': sco['energy'], 'err': sco['err']},
        'e_sc_atom': energies['sc_atom'],
        'e_o_atom': energies['o_atom'],
        'literature_d0_ev': 6.92,
        'literature_source': 'expt D0(ScO)=6.92(10) eV, Merer Annu. Rev. Phys. '
        'Chem. 40, 407 (1989)',
        'note': 'same in-house Sc table for molecule and atom: local-channel '
        'constant offsets cancel exactly in D_e; expected one-sided bias LOW '
        '(molecule farther from variational limit than atoms at this budget)',
        'steps': args.steps,
    }
    path = Path('docs/evidence/sco_dissociation.json')
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
