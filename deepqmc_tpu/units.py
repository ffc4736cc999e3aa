"""Unit conversions (reference: /root/reference/src/deepqmc/units.py:1-64)."""

from scipy import constants

_BOHR_IN_M = constants.value('atomic unit of length')
_HARTREE_IN_J = constants.value('Hartree energy')
_EV_IN_HARTREE = constants.value('electron volt-hartree relationship')
_KCAL_MOL_IN_J = constants.calorie * 1e3 / constants.N_A


def bohr_to_angstrom(x):
    return x * _BOHR_IN_M / constants.angstrom


def angstrom_to_bohr(x):
    return x * constants.angstrom / _BOHR_IN_M


def eV_to_hartree(x):
    return x * _EV_IN_HARTREE


def hartree_to_eV(x):
    return x / _EV_IN_HARTREE


def hartree_to_kcal_mol(x):
    return x * _HARTREE_IN_J / _KCAL_MOL_IN_J


def kcal_mol_to_hartree(x):
    return x * _KCAL_MOL_IN_J / _HARTREE_IN_J


def eV_to_kcal_mol(x):
    return x * constants.eV / _KCAL_MOL_IN_J


def kcal_mol_to_eV(x):
    return x * _KCAL_MOL_IN_J / constants.eV


def null(x):
    """Identity conversion."""
    return x
