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
from .casci import run_casci
from .pretraining import pretrain  # noqa: F401
from .pretraining_target import PretrainTarget  # noqa: F401
from .scf import compute_integrals, run_hf


def _casci_confs(hamil, integrals, mo_coeff, cas, n_states, fix_spin):
    """Per-state (confs, conf_coeffs) in the reference's determinant format."""
    from .casci import _mo_eri

    h_mo = mo_coeff.T @ integrals.Hcore @ mo_coeff
    eri_mo = _mo_eri(integrals.eri, mo_coeff)
    result = run_casci(
        h_mo,
        eri_mo,
        integrals.e_nuc,
        hamil.n_up,
        hamil.n_down,
        tuple(cas),
        n_states=n_states,
        fix_spin=fix_spin,
    )
    log.info(
        'CASCI state energies: '
        + ', '.join(f'{e:.6f}' for e in result.energies)
        + ' Ha (S^2: '
        + ', '.join(f'{s:.2f}' for s in result.s2)
        + ')'
    )
    core = np.arange(result.n_core)
    # [n_det, n_up + n_down]: up (core then active), then down, ascending
    dets = np.concatenate(
        [
            np.tile(core, (len(result.up_occs), 1)),
            result.up_occs + result.n_core,
            np.tile(core, (len(result.down_occs), 1)),
            result.down_occs + result.n_core,
        ],
        axis=-1,
    )
    confs, conf_coeffs = [], []
    for coeffs in result.ci_coeffs:
        order = np.argsort(-(coeffs**2))
        confs.append(dets[order])
        conf_coeffs.append(coeffs[order])
    return np.stack(confs), np.stack(conf_coeffs)

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
    """(CAS)SCF solutions for ``mols`` as a pretraining dataset.

    Without ``cas``, every state's target is the HF ground-state determinant
    (the reference behaves the same without CAS, pyscfext.py:272-280).  With
    ``cas = (ncas, nelecas)``, a complete CI in the active space over the HF
    orbitals (CASCI, :mod:`.casci`) supplies per-state multi-determinant
    targets in the reference's format (confs_from_mc, pyscfext.py:174-209):
    all determinants per root, sorted by descending CI weight, orbital
    indices listed per spin channel as [core..., active...].
    """
    mols = mols if isinstance(mols, Sequence) else [mols]
    if fix_spin is None and cas is not None and n_states > 1:
        # target the Hamiltonian's own spin sector, like the reference's
        # fcisolver.spin default
        s = (hamil.n_up - hamil.n_down) / 2
        fix_spin = s * (s + 1)
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
            if saved.get('cas') != (tuple(cas) if cas else None) or saved.get(
                'n_states', 1
            ) < n_states:
                raise ValueError(
                    f'SCF checkpoint {chkfile} was computed with different'
                    ' cas/n_states settings; remove it to recompute.'
                )
            mo = saved['mo_coeff']
            confs_i, conf_coeffs_i = saved['confs'], saved['conf_coeffs']
            confs_i = confs_i[:n_states]
            conf_coeffs_i = conf_coeffs_i[:n_states]
        else:
            integrals = compute_integrals(
                centers, np.asarray(hamil.ns_valence), shells
            )
            result = run_hf(
                centers,
                np.asarray(hamil.ns_valence),
                shells,
                hamil.n_up,
                hamil.n_down,
                integrals=integrals,
            )
            mo = result.mo_coeff
            if cas is not None:
                confs_i, conf_coeffs_i = _casci_confs(
                    hamil, integrals, mo, cas, n_states, fix_spin
                )
            else:
                ground = list(range(hamil.n_up)) + list(range(hamil.n_down))
                confs_i = np.asarray([[ground]] * n_states)
                conf_coeffs_i = np.ones((n_states, 1))
            if chkfile:
                with open(chkfile, 'wb') as f:
                    pickle.dump(
                        {
                            'mo_coeff': mo,
                            'e_tot': result.e_tot,
                            'cas': tuple(cas) if cas else None,
                            'n_states': n_states,
                            'confs': confs_i,
                            'conf_coeffs': conf_coeffs_i,
                        },
                        f,
                    )
        mo_coeffs.append(jnp.asarray(mo))
        confs.append(jnp.asarray(confs_i))  # [n_states, n_det, n_el]
        conf_coeffs.append(jnp.asarray(conf_coeffs_i))

    return {
        'centers': jnp.asarray(centers),
        'shells': shells,
        'mo_coeffs': jnp.stack(mo_coeffs),
        # [n_mols, n_states, n_det, n_el]
        'confs': jnp.stack(confs),
        'conf_coeffs': jnp.stack(conf_coeffs),
    }
