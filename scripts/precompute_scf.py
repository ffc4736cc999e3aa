"""Precompute SCF/CASCI pretraining targets on the host CPU.

The accuracy-run chip session is serialized on one TPU; the SCF baselines
(`compute_scf_solution`) are pure host work and cache per-molecule under
`<workdir>/training/scf_chkpts/mol_0.npz` (train.py pretrain_phase).  Running
them ahead of time on an otherwise idle core removes minutes-to-hours of
host-only work from the chip-session critical path.  The arguments here must
mirror exactly what the CLI run will pass (scripts/accuracy_runs.py CONFIGS +
conf/task/*.yaml scf_kwargs) or the cache-consistency check raises.

Usage: python scripts/precompute_scf.py sco|benzene_excited
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

from deepqmc_tpu.hamil import MolecularHamiltonian  # noqa: E402
from deepqmc_tpu.molecule import Molecule  # noqa: E402
from deepqmc_tpu.pretrain import compute_scf_solution  # noqa: E402

JOBS = {
    # accuracy_runs.py 'sco' + conf/task/train_psiformer.yaml scf_kwargs
    'sco': dict(
        mol='ScO',
        hamil_kwargs={'ecp_type': 'ccECP'},
        n_states=1,
        scf_kwargs={'basis': 'sto-6g'},
        workdir='runs/accuracy/sco/training',
    ),
    # accuracy_runs.py 'benzene_excited' overrides the yaml's aug-cc-pVTZ
    # down to the minimal-basis CASCI target (see its comment); the cache
    # key must match what the CLI run passes
    'benzene_excited': dict(
        mol='benzene',
        hamil_kwargs={},
        n_states=2,
        scf_kwargs={'basis': 'sto-6g', 'cas': (6, 6)},
        workdir='runs/accuracy/benzene_excited/training',
    ),
}


def main():
    import logging

    logging.basicConfig(level=logging.INFO)
    job = JOBS[sys.argv[1]]
    hamil = MolecularHamiltonian(
        mol=Molecule.from_name(job['mol']), **job['hamil_kwargs']
    )
    os.makedirs(job['workdir'], exist_ok=True)
    t0 = time.time()
    dataset = compute_scf_solution(
        hamil.mol, hamil, job['n_states'], workdir=job['workdir'],
        **job['scf_kwargs'],
    )
    print(
        f'{sys.argv[1]}: SCF solution cached in {time.time() - t0:.0f}s; '
        f'keys {sorted(dataset)}'
    )


if __name__ == '__main__':
    main()
