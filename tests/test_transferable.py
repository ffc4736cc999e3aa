"""Components for transferable wave functions: nuclei embeddings,
nucleus-dependent envelopes, nuclear GNN head, combined attention."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqmc_tpu import nn
from deepqmc_tpu.gnn import ElectronGNN, ElectronGNNLayer
from deepqmc_tpu.gnn.electron_gnn import (
    ElectronEmbedding,
    NucleiEmbedding,
    PermutationInvariantEmbedding,
)
from deepqmc_tpu.gnn.update_features import CombinedNodeAttentionUpdateFeature
from deepqmc_tpu.presets import _dist_diff_features, _mlp
from deepqmc_tpu.wf import instantiate_ansatz
from deepqmc_tpu.wf.env import SimplifiedNucleusDependentEnvelopes
from deepqmc_tpu.wf.nn_wave_function import BackflowOp, NeuralNetworkWaveFunction
from deepqmc_tpu.wf.omni import Backflow, NuclearGNNHead, OmniNet


def transferable_ansatz(hamil):
    """An ansatz whose envelope parameters come from a nuclear GNN head."""
    n_env = 4
    gnn_factory = partial(
        ElectronGNN,
        n_interactions=2,
        nuclei_embedding=partial(
            NucleiEmbedding,
            embedding_dim=16,
            atom_type_embedding=True,
            subnet_type='mlp',
            edge_features=None,
        ),
        electron_embedding=partial(
            ElectronEmbedding,
            positional_embeddings={'ne': _dist_diff_features()},
            use_spin=True,
            project_to_embedding_dim=True,
        ),
        two_particle_stream_dim=8,
        self_interaction=True,
        edge_features=None,
        layer_factory=partial(
            ElectronGNNLayer,
            subnet_factory=lambda *a, **kw: nn.Identity(),
            electron_residual=False,
            nucleus_residual=False,
            two_particle_residual=False,
            deep_features=False,
            update_rule='concatenate',
            update_features=[
                partial(
                    CombinedNodeAttentionUpdateFeature,
                    num_heads=2,
                    mlp_factory=_mlp(['log', 1], True, False, jnp.tanh, 'ferminet'),
                    attention_residual=nn.ResidualConnection(normalize=False),
                    mlp_residual=nn.ResidualConnection(normalize=False),
                    elec_to_nuc=True,
                )
            ],
        ),
    )
    n_orb = hamil.n_up + hamil.n_down
    omni_factory = partial(
        OmniNet,
        embedding_dim=16,
        jastrow_factory=None,
        backflow_factory=partial(
            Backflow, subnet_factory=_mlp(['log', 1], False, True, None, 'ferminet')
        ),
        nuclear_gnn_head=partial(
            NuclearGNNHead,
            one_particle_parameters={
                'zetas': (n_orb * 2 * n_env,),
                'pis': (n_orb * 2 * n_env,),
            },
        ),
        gnn_factory=gnn_factory,
    )
    return NeuralNetworkWaveFunction(
        hamil,
        omni_factory=omni_factory,
        envelope=partial(
            SimplifiedNucleusDependentEnvelopes,
            n_envelope_per_nucleus=n_env,
            per_orbital_exponent=True,
            fixed_pi=False,
        ),
        backflow_op=partial(BackflowOp, mult_act=lambda x: x),
        n_determinants=2,
        full_determinant=True,
        cusp_electrons=None,
        cusp_nuclei=None,
        backflow_transform='mult',
        conf_coeff=nn.SumPool,
    )


def test_transferable_ansatz_forward_and_antisymmetry(helpers):
    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(hamil, transferable_ansatz)
    pc = helpers.phys_conf(hamil)
    params = ansatz.init(helpers.rng(0), pc)
    psi = ansatz.apply(params, pc)
    assert np.isfinite(float(psi.log))
    perm = jnp.arange(4).at[0].set(1).at[1].set(0)
    psi_swapped = ansatz.apply(params, pc.replace(r=pc.r[perm]))
    assert float(psi_swapped.log) == pytest.approx(float(psi.log), rel=1e-8)
    assert float(psi_swapped.sign) == -float(psi.sign)
    # the nuclear head produces envelope parameters: check they exist
    assert any('nuclear_gnnhead' in k for k in params)


def test_nuclei_embedding_variants(helpers):
    hamil = helpers.hamil()
    pc = helpers.phys_conf(hamil)
    for subnet_type in ('mlp', 'embed'):
        model = nn.transform(
            lambda pc: NucleiEmbedding(
                hamil.n_up,
                hamil.n_down,
                hamil.mol.charges,
                hamil.mol.n_atom_types,
                embedding_dim=8,
                atom_type_embedding=True,
                subnet_type=subnet_type,
                edge_features=None,
            )(pc)
        )
        params = model.init(helpers.rng(1), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 8)
        assert np.isfinite(np.asarray(out)).all()
    # with nn-edge features
    model = nn.transform(
        lambda pc: NucleiEmbedding(
            hamil.n_up,
            hamil.n_down,
            hamil.mol.charges,
            hamil.mol.n_atom_types,
            embedding_dim=8,
            atom_type_embedding=True,
            subnet_type='mlp',
            edge_features=_dist_diff_features(),
        )(pc)
    )
    params = model.init(helpers.rng(2), pc)
    out = model.apply(params, pc)
    assert out.shape == (2, 8)


def test_permutation_invariant_embedding(helpers):
    hamil = helpers.hamil(mol=helpers.mol('H2'))  # two identical nuclei
    pc = helpers.phys_conf(hamil)

    def build(pc):
        emb = PermutationInvariantEmbedding(
            hamil.n_nuc,
            hamil.n_up,
            hamil.n_down,
            8,
            1,
            jnp.zeros(2, dtype=jnp.int32),
            hamil.mol.charges,
            edge_dim=8,
            edge_features=_dist_diff_features(),
            nuclear_charge_dependence='concatenate',
            use_spin=True,
        )
        return emb(pc, None)

    model = nn.transform(build)
    params = model.init(helpers.rng(3), pc)
    out = model.apply(params, pc)
    # swapping the two identical nuclei must leave the embeddings unchanged
    pc_swapped = pc.replace(R=pc.R[jnp.array([1, 0])])
    out_swapped = model.apply(params, pc_swapped)
    assert np.allclose(np.asarray(out), np.asarray(out_swapped), atol=1e-10)
