"""Regenerate tests/test_reference_parity/selfgoldens.npz.

The self-goldens pin (in f64, on CPU) the local (pseudo)potential values and
molecular graph edges at the STREAM-INDEPENDENT walker configurations of
tests/parity_utils.py.  They protect against regressions in the potential /
ECP-table / edge-builder code across jax upgrades, which the reference's
committed goldens cannot (their walker inputs were never stored — see
tests/test_reference_parity.py).

Run only when intentionally re-pinning behavior:
    JAX_PLATFORMS=cpu python scripts/make_parity_selfgoldens.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests')
)

import jax

jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402

from parity_utils import pinned_phys_conf  # noqa: E402

from deepqmc_tpu.hamil import MolecularHamiltonian  # noqa: E402
from deepqmc_tpu.molecule import Molecule  # noqa: E402

COMBOS = [
    ('LiH', None),
    ('LiH', 'bfd'),
    ('LiH', 'ccECP'),
    ('C', None),
    ('C', 'bfd'),
    ('C', 'ccECP'),
]


def main():
    out = {}
    for name, ecp in COMBOS:
        h = MolecularHamiltonian(mol=Molecule.from_name(name), ecp_type=ecp)
        pc = pinned_phys_conf(h, name, ecp)
        v = jax.vmap(h.potential.local_potential)(pc)
        out[f'local_potential_{name}_{ecp}'] = np.asarray(v)
        print(f'local_potential {name} {ecp}: {np.asarray(v)}')

    from deepqmc_tpu.gnn.graph import MolecularGraphEdgeBuilder

    h = MolecularHamiltonian(mol=Molecule.from_name('LiH'))
    pc = pinned_phys_conf(h, 'LiH', None)[0]
    edges = MolecularGraphEdgeBuilder(
        h.n_nuc, h.n_up, h.n_down, ('ne', 'same', 'anti'), self_interaction=False
    )(pc)
    for key in ('ne', 'same', 'anti'):
        out[f'edges_{key}'] = np.asarray(edges[key].single_array)
        print(f'edges_{key}: shape {out[f"edges_{key}"].shape}')

    dest = Path(__file__).parent.parent / 'tests' / 'test_reference_parity'
    dest.mkdir(exist_ok=True)
    np.savez(dest / 'selfgoldens.npz', **out)
    print(f'wrote {dest / "selfgoldens.npz"}')


if __name__ == '__main__':
    main()
