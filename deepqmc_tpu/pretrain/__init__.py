"""SCF pretraining baseline: in-house Hartree-Fock, GTO evaluation, MSE loop.

The reference delegates the baseline to pyscf (pretrain/pyscfext.py); this
package is self-contained: an even-tempered Gaussian basis, McMurchie-
Davidson integrals, and a DIIS-accelerated HF solver.  The dataset layout
matches the reference's ``compute_scf_solution`` output (centers, shells,
mo_coeffs, confs, conf_coeffs) so the pretraining loop and checkpoints stay
structurally compatible; ``confs`` carries its molecule axis first
([n_mols, n_states, n_det, n_el]), fixing the reference's state/molecule
axis swap (pyscfext.py:291).
"""

import logging
import os
import pickle
from collections.abc import Sequence
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ..hamil import MolecularHamiltonian
from ..molecule import Molecule
from .basis import build_basis
from .pretraining import pretrain  # noqa: F401
from .pretraining_target import PretrainTarget  # noqa: F401
from .scf import run_hf

log = logging.getLogger(__name__)

__all__ = ['compute_scf_solution', 'pretrain', 'PretrainTarget']


def compute_scf_solution(
    mols: Union[Molecule, list[Molecule]],
    hamil: MolecularHamiltonian,
    n_states: int,
    *,
    basis: str = 'even-tempered',
    cas: Optional[tuple[int, int]] = None,
    workdir: Optional[str] = None,
    fix_spin: Optional[float] = None,
    state_avg: bool = True,
    **kwargs,
) -> dict:
    """Hartree-Fock solutions for ``mols`` as a pretraining dataset.

    ``cas`` (CASSCF active space) is accepted for config compatibility; the
    in-house solver currently provides HF determinants only, so a CAS request
    falls back to the HF ground-state determinant with a warning (all states
    are then pretrained to the same target, which the reference also warns
    about when no CAS is available, validate_kwargs.py:27-33).
    """
    mols = mols if isinstance(mols, Sequence) else [mols]
    if cas is not None:
        log.warning(
            'CASSCF pretraining targets are not yet available in the in-house'
            ' SCF; falling back to the HF determinant for all states.'
        )
    chkpt_dir = f'{workdir}/scf_chkpts' if workdir else None
    if chkpt_dir:
        os.makedirs(chkpt_dir, exist_ok=True)

    shells = build_basis(hamil.mol.charges, basis)
    mo_coeffs, confs, conf_coeffs = [], [], []
    centers = None
    for i, mol in enumerate(mols):
        chkfile = chkpt_dir and f'{chkpt_dir}/mol_{i}.npz'
        centers = np.asarray(mol.coords)
        if chkfile and os.path.exists(chkfile):
            log.info(f'Restoring SCF solution from {chkfile}')
            with open(chkfile, 'rb') as f:
                saved = pickle.load(f)
            mo = saved['mo_coeff']
        else:
            result = run_hf(
                centers,
                np.asarray(hamil.ns_valence),
                shells,
                hamil.n_up,
                hamil.n_down,
            )
            mo = result.mo_coeff
            if chkfile:
                with open(chkfile, 'wb') as f:
                    pickle.dump({'mo_coeff': mo, 'e_tot': result.e_tot}, f)
        mo_coeffs.append(jnp.asarray(mo))
        ground = list(range(hamil.n_up)) + list(range(hamil.n_down))
        confs.append(jnp.asarray([[ground]] * n_states))  # [n_states, 1, n_el]
        conf_coeffs.append(jnp.ones((n_states, 1)))

    return {
        'centers': jnp.asarray(centers),
        'shells': shells,
        'mo_coeffs': jnp.stack(mo_coeffs),
        # [n_mols, n_states, n_det, n_el]
        'confs': jnp.stack(confs),
        'conf_coeffs': jnp.stack(conf_coeffs),
    }
