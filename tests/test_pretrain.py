from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepqmc_tpu.pretrain import compute_scf_solution, pretrain
from deepqmc_tpu.pretrain.basis import build_basis
from deepqmc_tpu.pretrain.gto import GTOBasis
from deepqmc_tpu.pretrain.integrals import IntegralEngine
from deepqmc_tpu.pretrain.scf import run_hf
from deepqmc_tpu import nn


def test_integrals_hydrogen_like():
    """Single 1s Gaussian: analytic overlap/kinetic/nuclear values."""
    zeta = 0.8
    shells = [(0, (0, [1.0], [zeta]))]
    eng = IntegralEngine(np.zeros((1, 3)), shells)
    S = eng.overlap()
    assert S[0, 0] == pytest.approx(1.0, rel=1e-12)  # normalized primitive
    T = eng.kinetic()
    # <T> of normalized s Gaussian = 3 zeta / 2
    assert T[0, 0] == pytest.approx(1.5 * zeta, rel=1e-12)
    V = eng.nuclear(np.zeros((1, 3)), [1.0])
    # <V> = -Z sqrt(8 zeta / pi)
    assert V[0, 0] == pytest.approx(-np.sqrt(8 * zeta / np.pi), rel=1e-12)


def test_eri_s_quartet():
    """(ss|ss) for one normalized s Gaussian: 2 sqrt(2 zeta / pi)... analytic
    value sqrt(2 p / pi) with p = zeta for the self-repulsion integral."""
    zeta = 1.3
    shells = [(0, (0, [1.0], [zeta]))]
    eng = IntegralEngine(np.zeros((1, 3)), shells)
    eri = eng.eri()
    # (aa|aa) = sqrt(2 * zeta / pi) * 2 / sqrt(2)  == sqrt(4 zeta / pi) / ... :
    # analytic: for normalized s with exponent z: (aa|aa) = sqrt(2 z / pi) * 2/sqrt(2)
    expected = np.sqrt(4 * zeta / (2 * np.pi))  # = sqrt(2 zeta/pi)
    assert eri[0, 0, 0, 0] == pytest.approx(2 * expected / np.sqrt(2), rel=1e-10)


def test_hf_helium():
    res = run_hf(np.zeros((1, 3)), [2.0], build_basis([2.0]), 1, 1)
    assert res.converged
    assert res.e_tot == pytest.approx(-2.8617, abs=2e-3)


def test_hf_lih(helpers):
    mol = helpers.mol('LiH')
    res = run_hf(
        np.asarray(mol.coords), np.asarray(mol.charges),
        build_basis(mol.charges), 2, 2,
    )
    assert res.converged
    assert res.e_tot == pytest.approx(-7.987, abs=2e-2)


def test_mo_normalization_consistency(helpers):
    """MO values from GTOBasis x mo_coeff must be orthonormal under the
    numerically integrated overlap (convention consistency check)."""
    mol = helpers.mol('LiH')
    shells = build_basis(mol.charges)
    eng = IntegralEngine(np.asarray(mol.coords), shells)
    S = eng.overlap()
    res = run_hf(
        np.asarray(mol.coords), np.asarray(mol.charges), shells, 2, 2
    )
    # orthonormality in the analytic metric
    ortho = res.mo_coeff.T @ S @ res.mo_coeff
    np.testing.assert_allclose(ortho, np.eye(ortho.shape[0]), atol=1e-7)
    # JAX-side AO evaluation agrees with a brute-force numerical overlap
    basis = nn.transform(lambda d: GTOBasis(np.asarray(mol.coords), shells)(d))
    params = basis.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4)))
    rng = np.random.default_rng(0)
    # monte carlo overlap of AO 0 with itself over a wide gaussian
    pts = rng.standard_normal((200000, 3)) * 3.0
    w = (2 * np.pi * 9.0) ** 1.5 * np.exp((pts**2).sum(-1) / (2 * 9.0))
    diffs = jnp.asarray(pts)[:, None, :] - jnp.asarray(mol.coords)[None, :, :]
    diffs = jnp.concatenate([diffs, (diffs**2).sum(-1, keepdims=True)], -1)
    aos = basis.apply(params, diffs)
    s00 = np.mean(np.asarray(aos[:, 0]) ** 2 * w)
    assert s00 == pytest.approx(S[0, 0], rel=0.05)


@pytest.mark.heavy
def test_pretrain_h2_improves_orbitals(helpers):
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default', n_determinants=2, embedding_dim=16, n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    mols = [hamil.mol]
    dataset = compute_scf_solution(mols, hamil, 1)
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0), hamil, ansatz, mols, 1, 1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=2), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(helpers.rng(2), sampler, params, 64, mols)
    losses = []
    for step, params, per_sample_losses, mol_idxs in pretrain(
        helpers.rng(3), hamil, ansatz, params, optax.adam(3e-3),
        mol_idx_sampler, sampler, smpl_state, dataset, steps=range(60),
    ):
        losses.append(float(np.asarray(per_sample_losses).mean()))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:5])


def test_pretrain_chunked_update_matches_whole_batch(helpers, monkeypatch):
    """DEEPQMC_TPU_GRAD_WALKER_CHUNK chunks the orbital-MSE gradient (the
    benzene-scale pretrain OOM site) without changing the update: equal-size
    walker chunks average to the exact whole-batch gradient."""
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default', n_determinants=2, embedding_dim=16, n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    mols = [hamil.mol]
    dataset = compute_scf_solution(mols, hamil, 1)
    mol_idx_sampler, sampler = initialize_sampling(
        helpers.rng(0), hamil, ansatz, mols, 1, 1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=1), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(helpers.rng(2), sampler, params, 16, mols)

    def run_steps():
        out = []
        for _, p, psl, _ in pretrain(
            helpers.rng(3), hamil, ansatz, params, optax.sgd(1e-2),
            mol_idx_sampler, sampler, smpl_state, dataset, steps=range(3),
        ):
            out.append((p, np.asarray(psl)))
        return out

    whole = run_steps()
    monkeypatch.setenv('DEEPQMC_TPU_GRAD_WALKER_CHUNK', '5')  # 16 -> chunks of 4
    chunked = run_steps()
    for (p_w, psl_w), (p_c, psl_c) in zip(whole, chunked):
        np.testing.assert_allclose(psl_c, psl_w, rtol=1e-9, atol=1e-12)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-11
            ),
            p_w,
            p_c,
        )


def test_minimal_contracted_basis():
    """Atomic-HF-contracted minimal basis: exact for the atom, STO-6G-class
    for molecules, tiny AO counts (reference default is minimal STO-6G,
    conf/task/train.yaml)."""
    from deepqmc_tpu.pretrain.basis import (
        even_tempered_shells,
        minimal_contracted_shells,
        occupied_shells_per_l,
    )
    from deepqmc_tpu.pretrain.scf import run_hf

    assert occupied_shells_per_l(6) == {0: 2, 1: 1, 2: 0}  # C: 1s 2s | 2p
    assert occupied_shells_per_l(21) == {0: 4, 1: 2, 2: 1}  # Sc: +3d

    z = 6
    big = [(0, s) for s in even_tempered_shells(z)]
    small = [(0, s) for s in minimal_contracted_shells(z)]
    n_ao = sum({0: 1, 1: 3, 2: 6}[s[1][0]] for s in small)
    assert n_ao == 5  # 1s, 2s, 2p x3
    center = np.zeros((1, 3))
    charge = np.array([float(z)])
    e_big = run_hf(center, charge, big, 3, 3).e_tot
    e_small = run_hf(center, charge, small, 3, 3).e_tot
    # the contraction spans the atomic occupied space near-exactly
    assert abs(e_small - e_big) < 1e-4, (e_small, e_big)


def test_eri_schwarz_screening_lossless():
    """Screened vs unscreened ERIs agree to the screening tolerance."""
    from deepqmc_tpu.pretrain.basis import build_basis
    from deepqmc_tpu.pretrain.integrals import IntegralEngine
    from deepqmc_tpu.molecule import Molecule

    mol = Molecule.from_name('LiH')
    eng = IntegralEngine(
        np.asarray(mol.coords), build_basis(np.asarray(mol.charges), 'sto-6g')
    )
    eri_screened = eng.eri()
    eri_full = eng.eri(screen_tol=0.0)
    np.testing.assert_allclose(eri_screened, eri_full, atol=1e-9)


def test_big_basis_fallback_for_large_systems():
    """Foreign basis names on big systems fall back to the minimal set."""
    from deepqmc_tpu.molecule import Molecule
    from deepqmc_tpu.pretrain.basis import build_basis

    charges = np.asarray(Molecule.from_name('benzene').charges)
    shells = build_basis(charges, 'aug-cc-pVTZ')
    n_ao = sum({0: 1, 1: 3, 2: 6}[s[0]] for _i, s in shells)
    assert n_ao == 36  # 6 C x 5 + 6 H x 1, not the 282-AO big set
