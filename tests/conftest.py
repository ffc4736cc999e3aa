"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Mirrors the reference test strategy (tests/conftest.py there forces x64) and
adds what the reference lacks (SURVEY.md §4): a virtual multi-device mesh so
the sharded code path is exercised on CPU.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax may already be imported by the interpreter's sitecustomize with a
# different platform; the config route works either way.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


class Helpers:
    @staticmethod
    def rng(seed=42):
        return jax.random.PRNGKey(seed)

    @staticmethod
    def mol(name='LiH'):
        from deepqmc_tpu.molecule import Molecule

        return Molecule.from_name(name)

    @staticmethod
    def hamil(mol=None, **kwargs):
        from deepqmc_tpu.hamil import MolecularHamiltonian

        return MolecularHamiltonian(mol=mol or Helpers.mol(), **kwargs)

    @staticmethod
    def phys_conf(hamil=None, n=None, seed=42, elec_std=1.0):
        hamil = hamil or Helpers.hamil()
        rng = Helpers.rng(seed)
        if n is None:
            return hamil.init_sample(rng, hamil.mol.coords, 1, elec_std)[0]
        return hamil.init_sample(rng, hamil.mol.coords, n, elec_std)

    @staticmethod
    def flatten_pytree(tree):
        return jnp.concatenate(
            [leaf.reshape(-1) for leaf in jax.tree_util.tree_leaves(tree)]
        )

    @staticmethod
    def pytree_allclose(t1, t2, **kwargs):
        import numpy as np

        leaves1 = jax.tree_util.tree_leaves(t1)
        leaves2 = jax.tree_util.tree_leaves(t2)
        assert len(leaves1) == len(leaves2)
        return all(
            np.allclose(a, b, **kwargs) for a, b in zip(leaves1, leaves2)
        )


@pytest.fixture(scope='session')
def helpers():
    return Helpers
