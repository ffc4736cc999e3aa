"""Validate candidate ECP parameter tables against the reference goldens.

The reference's committed regression data (tests/test_potential/*.npz)
contains the local ECP potential evaluated at a bitwise-reproducible walker
configuration (hamil.init_sample, PRNGKey(0), f64, pre-partitionable
threefry).  The local potential is a deterministic function of the parameter
table, so a golden match to ~1e-6 validates a candidate table's local
channels (and n_core, which feeds both Z_eff and the walker init heuristic).

Usage: JAX_PLATFORMS=cpu python scripts/validate_ecp_tables.py
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_threefry_partitionable', False)

from deepqmc_tpu.ecp.data import parse_gamess_ecp, register_ecp_params  # noqa: E402
from deepqmc_tpu.hamil import MolecularHamiltonian  # noqa: E402
from deepqmc_tpu.molecule import Molecule  # noqa: E402

REF = '/root/reference/tests/test_potential'

# Candidate GAMESS-format tables (numeric pseudopotential data).
CANDIDATES = {
    'ccECP': {
        'Li': """\
Li-ccECP GEN 2 1
3
1.00000000 1 6.51479055
6.51479055 3 4.50667058
-11.01771083 2 4.38186107
1
14.86086671 2 5.53297711
""",
        'C': """\
C-ccECP GEN 2 1
3
4.00000000 1 14.43502000
57.74008000 3 8.39889000
-25.81955000 2 7.38188000
1
52.13345000 2 7.76079000
""",
        'N': """\
N-ccECP GEN 2 1
3
5.00000000 1 9.23501000
46.17505000 3 7.66830000
-30.18893000 2 7.34486000
1
77.74203000 2 9.78499000
""",
        'O': """\
O-ccECP GEN 2 1
3
6.00000000 1 12.30997000
73.85984000 3 14.76962000
-47.87600000 2 13.71419000
1
85.86406000 2 13.65512000
""",
        'Sc': """\
Sc-ccECP GEN 10 2
3
11.00000000 1 6.87900000
75.66900000 3 7.10600000
-17.99900000 2 7.70200000
2
125.00000000 2 11.50000000
75.00000000 2 10.50000000
""",
    },
    'bfd': {
        'Li': """\
Li-bfd GEN 2 1
3
1.00000000 1 7.90000000
7.90000000 3 3.90000000
-3.00000000 2 3.00000000
1
10.00000000 2 5.00000000
""",
        'C': """\
C-bfd GEN 2 1
3
4.00000000 1 8.35973821
33.44388280 3 4.48361888
-19.17537323 2 3.93831258
1
22.55164191 2 5.02991637
""",
        'O': """\
O-bfd GEN 2 1
3
6.00000000 1 9.29793903
55.78763416 3 8.86492204
-38.81978498 2 8.62925665
1
38.41914135 2 8.71924452
""",
    },
}

Z = {'Li': 3, 'C': 6, 'N': 7, 'O': 8, 'Sc': 21}
MOL_OF = {'Li': 'LiH', 'C': 'C', 'O': None, 'Sc': 'ScO'}  # golden per molecule


def check(mol_name, ecp_type, tag):
    data = np.load(f'{REF}/test_pseudo_potentials_{mol_name}_{ecp_type}_.npz')
    golden = float(data['local_potential'])
    mol = Molecule.from_name(mol_name)
    hamil = MolecularHamiltonian(mol=mol, ecp_type=tag)
    pc = hamil.init_sample(jax.random.PRNGKey(0), mol.coords, 1, 1.0)[0]
    got = float(hamil.potential.local_potential(pc))
    ok = abs(got - golden) < 1e-6 * max(1.0, abs(golden))
    print(
        f'{mol_name:4s} {ecp_type:6s}: golden {golden: 14.8f}  '
        f'got {got: 14.8f}  {"OK" if ok else "MISMATCH"}'
    )
    return ok


def main():
    results = {}
    for ecp_type, tables in CANDIDATES.items():
        tag = f'cand-{ecp_type}'
        for sym, text in tables.items():
            s, n_core, local, nonlocal_ = parse_gamess_ecp(text)
            register_ecp_params(tag, Z[sym], n_core, local, nonlocal_)
        for mol_name in ('LiH', 'C', 'ScO'):
            needed = {'LiH': ['Li'], 'C': ['C'], 'ScO': ['Sc', 'O']}[mol_name]
            if not all(e in tables for e in needed):
                continue
            try:
                results[(mol_name, ecp_type)] = check(mol_name, ecp_type, tag)
            except Exception as e:
                print(f'{mol_name:4s} {ecp_type:6s}: ERROR {e}')
                results[(mol_name, ecp_type)] = False
    print(results)


if __name__ == '__main__':
    main()
