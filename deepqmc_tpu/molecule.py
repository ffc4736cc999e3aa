"""Molecule definition and the named-molecule database.

Reference: /root/reference/src/deepqmc/molecule.py:32-152.  The geometry
database (``conf/hamil/mol/*.yaml``) is physical data shared with the
reference.  This implementation drops the Hydra coupling: paths are resolved
relative to the process CWD or absolutely.
"""

import os
import re
from collections import OrderedDict
from dataclasses import dataclass, field
from glob import glob
from importlib import resources
from pathlib import Path
from typing import ClassVar, Optional

import numpy as np
import yaml

from .units import angstrom_to_bohr, null

__all__ = ['Molecule']


def mol_conf_dir() -> Path:
    return Path(str(resources.files('deepqmc_tpu').joinpath('conf/hamil/mol')))


def get_all_names() -> set[str]:
    return {f.replace('.yaml', '') for f in os.listdir(mol_conf_dir())}


@dataclass(frozen=True, init=False)
class Molecule:
    """A molecular geometry with total charge and spin.

    Args:
        coords: nuclear coordinates ``[n_nuc, 3]`` as rows.
        charges: nuclear charges ``[n_nuc]``.
        charge: total molecular charge.
        spin: number of unpaired electrons (2S).
        unit: 'bohr' or 'angstrom' for the input coordinates.
        data: optional extra payload stored with the molecule.
    """

    all_names: ClassVar[set] = None  # populated lazily below

    coords: np.ndarray
    charges: np.ndarray
    charge: int
    spin: int
    data: dict = field(default_factory=dict)
    n_atom_types: int = 0

    def __init__(self, *, coords, charges, charge, spin, unit='bohr', data=None):
        # host-side constants stay numpy: constructing device arrays here
        # costs one dispatch per molecule (a ~40 ms RPC on a tunneled chip)
        # and jnp consumers auto-convert at trace time anyway
        to_bohr = {'bohr': null, 'angstrom': angstrom_to_bohr}[unit]
        object.__setattr__(self, 'coords', to_bohr(np.asarray(coords, dtype=float)))
        object.__setattr__(self, 'charges', np.asarray(charges, dtype=float))
        object.__setattr__(self, 'charge', charge)
        object.__setattr__(self, 'spin', spin)
        object.__setattr__(self, 'data', data or {})
        object.__setattr__(
            self, 'n_atom_types', len(np.unique(np.asarray(charges)))
        )

    def __len__(self):
        return len(self.charges)

    def __iter__(self):
        yield from zip(self.coords, self.charges)

    def __repr__(self):
        return (
            f'Molecule(coords={self.coords.tolist()}, '
            f'charges={self.charges.tolist()}, charge={self.charge}, '
            f'spin={self.spin})'
        )

    @classmethod
    def from_name(cls, name: str) -> 'Molecule':
        """Create one of the named molecules packaged with the framework."""
        if name not in cls.all_names:
            raise ValueError(f'Unknown molecule name: {name}')
        return read_molecule_dataset(mol_conf_dir(), whitelist=f'^{re.escape(name)}$')[
            name
        ]

    @classmethod
    def from_file(cls, file: str) -> 'Molecule':
        """Create a molecule from a user YAML file."""
        with open(file, 'r') as stream:
            return cls(**yaml.safe_load(stream))


Molecule.all_names = get_all_names()


class MoleculeDict(OrderedDict):
    """Ordered mapping of molecule name -> :class:`Molecule`."""

    def __setitem__(self, key: str, value: Molecule):
        super().__setitem__(key, value)
        self.move_to_end(key)


def read_molecule_dataset(
    dataset, whitelist: Optional[str] = None
) -> MoleculeDict:
    """Load all (whitelisted) ``*.yaml`` geometries from a directory."""
    molecules = MoleculeDict()
    for f in sorted(glob(str(Path(dataset) / '*.yaml'))):
        name = Path(f).stem
        if whitelist is not None and not re.search(whitelist, name):
            continue
        with open(f, 'r') as stream:
            molecules[name] = Molecule(**yaml.safe_load(stream))
    return molecules
