"""Stream-independent inputs for the reference-parity and table tests.

Why this exists: the reference's committed goldens (pytest-regressions
``.npz`` under /root/reference/tests) record OUTPUTS only — their walker
inputs were drawn from ``jax.random`` under the jax version the reference
pinned when the goldens were committed.  jax does not guarantee PRNG stream
stability across versions, and the jax-0.9 stream differs: the reference's
own ``AtomCenteredElectronInitializer(ShellBasedDistribution())`` no longer
reproduces its own ``test_init_sample_*.npz`` goldens here (verified
directly; see tests/test_reference_parity.py module docstring).  Bitwise
golden replay therefore only works on environments whose jax still emits
the legacy stream.

This module provides walker configurations that are pinned INDEPENDENTLY of
any jax stream, so value-level regression tests survive jax upgrades:

- LiH: the reference's own committed golden walker positions
  (test_hamil/test_init_sample_{Molecular_,Molecular_PP_}.npz ``rs``) —
  actual data from the reference repo, so the positions exercised are
  exactly reference-realistic;
- C: positions drawn once from numpy's MT19937 (``RandomState``), whose
  stream numpy guarantees stable forever.
"""

from pathlib import Path

import numpy as np

REF_TESTS = Path('/root/reference/tests')


def pinned_walkers(name: str, ecp_type) -> np.ndarray:
    """Electron positions ``[n_walker, n_elec, 3]`` for (molecule, ecp)."""
    if name == 'LiH':
        # bfd and ccECP Li both have n_core=2 -> the PP walker shape fits both
        tag = 'Molecular_PP_' if ecp_type else 'Molecular_'
        return np.asarray(
            np.load(REF_TESTS / f'test_hamil/test_init_sample_{tag}.npz')['rs']
        )
    if name == 'C':
        n_elec = 6 if ecp_type is None else 4  # bfd/ccECP C: n_core=2
        rs = np.random.RandomState(20260821).standard_normal((4, 12, 3))
        return 0.7 * rs[:, :n_elec]
    raise KeyError(name)


_LEGACY = None


def legacy_stream_reproduces() -> bool:
    """True iff this jax replays the stream behind the reference goldens.

    Probed by regenerating the LiH ``init_sample`` golden under
    non-partitionable threefry keys and comparing bitwise.  NOTE this
    deliberately conflates "the jax stream changed" with "our walker-init
    changed": on False, the replay tests SKIP, and regression protection of
    the walker-dependent values falls to the pinned self-goldens
    (tests/test_reference_parity/selfgoldens.npz), which do not depend on
    any jax stream.
    """
    global _LEGACY
    if _LEGACY is None:
        import jax

        from deepqmc_tpu.hamil import MolecularHamiltonian
        from deepqmc_tpu.molecule import Molecule

        data = np.load(REF_TESTS / 'test_hamil/test_init_sample_Molecular_.npz')
        h = MolecularHamiltonian(mol=Molecule.from_name('LiH'))
        old = jax.config.jax_threefry_partitionable
        jax.config.update('jax_threefry_partitionable', False)
        try:
            rs = h.init_sample(jax.random.PRNGKey(0), h.mol.coords, 5, 1.0).r
        finally:
            jax.config.update('jax_threefry_partitionable', old)
        _LEGACY = bool(
            np.allclose(np.asarray(rs), data['rs'], rtol=1e-6, atol=1e-8)
        )
    return _LEGACY


def pinned_phys_conf(hamil, name: str, ecp_type):
    """Batched PhysicalConfiguration of the pinned walkers for ``hamil``."""
    import jax.numpy as jnp

    from deepqmc_tpu.types import PhysicalConfiguration

    rs = jnp.asarray(pinned_walkers(name, ecp_type))
    assert rs.shape[1] == hamil.n_up + hamil.n_down, (
        f'pinned walkers for {name}/{ecp_type} have {rs.shape[1]} electrons, '
        f'hamil expects {hamil.n_up + hamil.n_down}'
    )
    n = len(rs)
    R = jnp.tile(jnp.asarray(hamil.mol.coords)[None], (n, 1, 1))
    return PhysicalConfiguration(R, rs, jnp.zeros(n, dtype=jnp.int32))
