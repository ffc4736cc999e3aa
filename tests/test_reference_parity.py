"""Numerical parity against the reference's committed golden data.

The reference ships pytest-regressions ``.npz`` goldens (SURVEY.md §4;
/root/reference/tests/test_*/...).  Two tiers of tests pin against them:

1. **Input-pinned value tests** (always run): molecule database entries,
   Hamiltonian electron bookkeeping, and graph-edge/potential values at
   STREAM-INDEPENDENT walker configurations (tests/parity_utils.py: the
   reference's own committed LiH walker positions, numpy-MT19937 walkers
   for C) against self-goldens committed in f64
   (tests/test_reference_parity/selfgoldens.npz, regenerated only
   deliberately via scripts/make_parity_selfgoldens.py).

2. **Legacy-stream replay tests** (skip when irreproducible): the
   reference goldens record outputs only — their walker inputs were drawn
   from ``jax.random`` under the jax version pinned when the goldens were
   committed, and jax does NOT guarantee stream stability across versions.
   Under jax 0.9 the reference's own initializer no longer reproduces its
   own ``test_init_sample_*.npz`` goldens (verified by running the
   reference's ``AtomCenteredElectronInitializer(ShellBasedDistribution())``
   directly against them), so bitwise replay is only possible on
   environments whose jax still emits the legacy stream.  These tests
   replay the stream when available and SKIP otherwise — value-level
   regression protection is tier 1's job.

Goldens whose inputs pass through haiku parameter init (psi/local-energy/GNN
-embedding regressions) cannot be replayed against a different parameter
structure; accuracy parity for those is covered by physics-level convergence
tests instead (tests/test_accuracy.py).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from parity_utils import (
    REF_TESTS,
    legacy_stream_reproduces,
    pinned_phys_conf,
)

pytestmark = pytest.mark.skipif(
    not REF_TESTS.exists(), reason='reference goldens not available'
)

SELFGOLDENS = Path(__file__).parent / 'test_reference_parity' / 'selfgoldens.npz'


@pytest.fixture()
def legacy_stream():
    """Replay the legacy (pre-partitionable threefry) stream, or skip."""
    if not legacy_stream_reproduces():
        pytest.skip(
            'this jax version does not reproduce the PRNG stream the '
            'reference goldens were generated with (the reference\'s own '
            'initializer fails its own goldens here); value-level coverage '
            'is provided by the pinned self-golden tests'
        )
    old = jax.config.jax_threefry_partitionable
    jax.config.update('jax_threefry_partitionable', False)
    yield
    jax.config.update('jax_threefry_partitionable', old)


def golden(relpath):
    return np.load(REF_TESTS / relpath)


def selfgolden(key):
    return np.load(SELFGOLDENS)[key]


def reference_phys_conf(hamil, n=1, seed=0):
    """helpers.phys_conf as the reference conftest builds it (tests/conftest.py:67)."""
    phys_conf = hamil.init_sample(
        jax.random.PRNGKey(seed), hamil.mol.coords, n, 1.0
    )
    return phys_conf[0] if n == 1 else phys_conf


@pytest.mark.parametrize(
    'name', ['C', 'H10', 'H2O', 'LiH', 'NH3', 'ScO', 'bicyclobutane']
)
def test_molecule_database(helpers, name):
    data = golden(f'test_molecule/test_from_name_{name}_.npz')
    mol = helpers.mol(name)
    np.testing.assert_array_equal(np.asarray(mol.charges), data['charges'])
    np.testing.assert_allclose(
        np.asarray(mol.coords), data['coords'], rtol=1e-6, atol=1e-8
    )  # goldens carry f32-level rounding
    assert mol.charge == data['charge']
    assert mol.spin == data['spin']


@pytest.fixture()
def lih_ccecp_registered():
    """Register a Li ccECP entry for the bookkeeping tests.

    Only ``n_core`` feeds the quantities under test (ns_valence and the
    walker-init heuristics); the Gaussian terms are inert placeholders, NOT
    physical ccECP data (real tables load from GAMESS files, ecp/data.py).
    """
    from deepqmc_tpu.ecp.data import _REGISTRY, register_ecp_params

    key = ('ccecp', 3)
    if key not in _REGISTRY:
        register_ecp_params(
            'ccECP', 3, 2, [[(1.0, 0.0)], [], []], [[(1.0, 0.0)]]
        )
        yield
        _REGISTRY.pop(key, None)
    else:
        yield


@pytest.mark.parametrize('ecp_type', [None, 'ccECP'])
def test_hamil_bookkeeping(helpers, ecp_type, lih_ccecp_registered):
    tag = 'Molecular_PP_' if ecp_type else 'Molecular_'
    data = golden(f'test_hamil/test_init_{tag}.npz')
    hamil = helpers.hamil(helpers.mol('LiH'), ecp_type=ecp_type)
    assert hamil.n_up == data['n_up']
    assert hamil.n_down == data['n_down']
    np.testing.assert_array_equal(np.asarray(hamil.ns_valence), data['ns_valence'])
    np.testing.assert_array_equal(np.asarray(hamil.ecp_mask), data['pp_mask'])


@pytest.mark.parametrize('ecp_type', [None, 'ccECP'])
def test_init_sample_reference_replay(
    helpers, ecp_type, legacy_stream, lih_ccecp_registered
):
    tag = 'Molecular_PP_' if ecp_type else 'Molecular_'
    data = golden(f'test_hamil/test_init_sample_{tag}.npz')
    hamil = helpers.hamil(helpers.mol('LiH'), ecp_type=ecp_type)
    phys_conf = reference_phys_conf(hamil, n=5)
    np.testing.assert_allclose(
        np.asarray(phys_conf.r), data['rs'], rtol=1e-6, atol=1e-8
    )


def test_init_sample_distribution(helpers):
    """Stream-independent sanity of the walker-init heuristic.

    Checks the physics the heuristic must deliver regardless of which jax
    stream backs it: every electron sits in a cloud around SOME nucleus with
    spread bounded by the elec_std scaling, per-walker electron counts are
    exact, and the average per-nucleus occupation tracks the valence count
    (Li:H should seat near 3:1 for all-electron LiH).
    """
    hamil = helpers.hamil(helpers.mol('LiH'))
    n = 512
    pc = hamil.init_sample(jax.random.PRNGKey(7), hamil.mol.coords, n, 1.0)
    r = np.asarray(pc.r)  # [n, 4, 3]
    assert r.shape == (n, 4, 3) and np.isfinite(r).all()
    # distance of each electron to its NEAREST nucleus: bounded by a few
    # sigma of the widest cloud (std = elec_std * sqrt(Z_Li) ~ 1.73)
    R = np.asarray(hamil.mol.coords)  # [2, 3]
    d_nuc = np.linalg.norm(r[:, :, None] - R[None, None], axis=-1).min(-1)
    assert d_nuc.mean() < 3.0, f'mean nearest-nucleus distance {d_nuc.mean()}'
    assert (d_nuc < 10.0).all()
    # average seats per nucleus ~ valence (3 on Li, 1 on H), tolerance wide
    # enough for the heuristic's charge/spin adjustments
    nearest = np.linalg.norm(r[:, :, None] - R[None, None], axis=-1).argmin(-1)
    li_share = (nearest == 0).sum(axis=1).mean()
    assert 2.0 < li_share < 4.0, f'mean electrons on Li = {li_share}'


@pytest.mark.parametrize('mask_self', [True, False])
def test_graph_edge_builder(mask_self):
    from deepqmc_tpu.gnn.graph import GraphEdgeBuilder

    data = golden(
        f'test_gnn/test_graph_edge_builder_mask_self_{mask_self}_.npz'
    )
    nodes = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 0.0, 6.0]])
    edges = GraphEdgeBuilder(mask_self)(nodes, nodes)
    np.testing.assert_allclose(np.asarray(edges), data['graph_edges'], rtol=1e-6, atol=1e-8)


def test_molecular_graph_edge_builder_reference_replay(helpers, legacy_stream):
    from deepqmc_tpu.gnn.graph import MolecularGraphEdgeBuilder

    data = golden('test_gnn/test_molecular_graph_edge_builder.npz')
    hamil = helpers.hamil(helpers.mol('LiH'))
    phys_conf = reference_phys_conf(hamil)
    graph_edges = MolecularGraphEdgeBuilder(
        hamil.n_nuc,
        hamil.n_up,
        hamil.n_down,
        ('ne', 'same', 'anti'),
        self_interaction=False,
    )(phys_conf)
    for key in ('ne', 'same', 'anti'):
        np.testing.assert_allclose(
            np.asarray(graph_edges[key].single_array),
            data[key],
            rtol=1e-6,
            atol=1e-8,
            err_msg=key,
        )


def test_molecular_graph_edge_builder_pinned(helpers):
    """Edge builder values at the pinned reference walker (self-golden)."""
    from deepqmc_tpu.gnn.graph import MolecularGraphEdgeBuilder

    hamil = helpers.hamil(helpers.mol('LiH'))
    phys_conf = pinned_phys_conf(hamil, 'LiH', None)[0]
    graph_edges = MolecularGraphEdgeBuilder(
        hamil.n_nuc,
        hamil.n_up,
        hamil.n_down,
        ('ne', 'same', 'anti'),
        self_interaction=False,
    )(phys_conf)
    for key in ('ne', 'same', 'anti'):
        np.testing.assert_allclose(
            np.asarray(graph_edges[key].single_array),
            selfgolden(f'edges_{key}'),
            rtol=1e-10,
            atol=1e-12,
            err_msg=key,
        )


PARAM_COMBOS = [
    ('LiH', None),
    ('LiH', 'bfd'),
    ('LiH', 'ccECP'),
    ('C', None),
    ('C', 'bfd'),
    ('C', 'ccECP'),
    # NOT ScO: tests/test_potential/*ScO*.npz are orphaned goldens — the
    # reference's current test only parametrizes LiH and C
    # (test_potential.py:4-5), and the ScO files reproduce under neither
    # its current walker-init heuristic nor ours (checked: the all-
    # electron ScO case already mismatches, so it is not an ECP issue).
]


@pytest.mark.parametrize('name,ecp_type', PARAM_COMBOS)
def test_local_potential_reference_replay(helpers, name, ecp_type, legacy_stream):
    """Local (pseudo)potential vs the reference's committed goldens.

    The golden's inputs (reference tests/test_potential.py:7-18) are the
    walker positions from ``helpers.phys_conf`` — bitwise-reproduced when
    the legacy stream is available — and the ECP parameter tables, so this
    directly validates the vendored GAMESS tables (incl. the provisional Sc
    entry's local channel) against pyscf's database as snapshot by the
    reference goldens.  The nonlocal golden additionally depends on the
    reference's haiku-initialized test ansatz and is not replayable (see
    module docstring).
    """
    data = golden(
        f'test_potential/test_pseudo_potentials_{name}_{ecp_type}_.npz'
    )
    hamil = helpers.hamil(helpers.mol(name), ecp_type=ecp_type)
    phys_conf = reference_phys_conf(hamil)
    v_loc = hamil.potential.local_potential(phys_conf)
    np.testing.assert_allclose(
        np.asarray(v_loc), data['local_potential'], rtol=2e-6
    )


@pytest.mark.parametrize('name,ecp_type', PARAM_COMBOS)
def test_local_potential_pinned(helpers, name, ecp_type):
    """Local (pseudo)potential values at pinned walkers (self-golden).

    Stream-independent regression protection for the potential evaluation
    AND the vendored GAMESS parameter tables: any change to either moves
    these f64 values.  The cross-validation against pyscf's database rides
    on the replay test above (when the legacy stream is available) plus the
    radial-oracle evidence in docs/evidence/ecp_*.json.
    """
    hamil = helpers.hamil(helpers.mol(name), ecp_type=ecp_type)
    pc = pinned_phys_conf(hamil, name, ecp_type)
    v_loc = jax.vmap(hamil.potential.local_potential)(pc)
    np.testing.assert_allclose(
        np.asarray(v_loc),
        selfgolden(f'local_potential_{name}_{ecp_type}'),
        rtol=1e-10,
    )
