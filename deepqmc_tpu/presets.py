"""Programmatic ansatz presets: default (PauliNet-like), FermiNet, PsiFormer.

These mirror the reference's packaged Hydra configs
(/root/reference/src/deepqmc/conf/ansatz/{default,ferminet,psiformer}.yaml)
as plain Python factories.  The YAML config layer resolves to the same
constructors, so both routes build identical networks.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import nn
from .gnn import ElectronGNN, ElectronGNNLayer
from .gnn.edge_features import (
    CombinedEdgeFeature,
    DifferenceEdgeFeature,
    DistancePowerEdgeFeature,
)
from .gnn.electron_gnn import ElectronEmbedding, NucleiEmbedding
from .gnn.update_features import (
    ConvolutionElectronUpdateFeature,
    EdgeSumElectronUpdateFeature,
    NodeAttentionElectronUpdateFeature,
    NodeSumElectronUpdateFeature,
    ResidualElectronUpdateFeature,
)
from .wf.cusp import DeepQMCCusp, ElectronicCuspAsymptotic, PsiformerCusp
from .wf.env import ExponentialEnvelopes
from .wf.nn_wave_function import BackflowOp, NeuralNetworkWaveFunction
from .wf.omni import Backflow, Jastrow, OmniNet

__all__ = ['ansatz_preset']


def _dist_diff_features(log_rescale=False):
    return CombinedEdgeFeature(
        features=[
            DistancePowerEdgeFeature(powers=[1], log_rescale=log_rescale),
            DifferenceEdgeFeature(log_rescale=log_rescale),
        ]
    )


def _mlp(hidden_layers, bias, last_linear, activation, init):
    return partial(
        nn.MLP,
        hidden_layers=hidden_layers,
        bias=bias,
        last_linear=last_linear,
        activation=activation,
        init=init,
    )


def _envelope():
    return partial(
        ExponentialEnvelopes,
        isotropic=True,
        per_shell=False,
        per_orbital_exponent=True,
        spin_restricted=False,
        init_to_ones=True,
        softplus_zeta=False,
    )


def _ones_linear(out_dim, name=None):
    return nn.Linear(out_dim, with_bias=False, w_init=nn.ones_init(), name=name)


def default_ansatz(
    hamil,
    *,
    n_determinants=16,
    full_determinant=True,
    embedding_dim=128,
    n_interactions=3,
    two_particle_stream_dim=32,
):
    """The reference's `default` ansatz (PauliNet-flavoured GNN)."""
    subnet = _mlp(['log', 2], True, False, jnp.tanh, 'default')
    gnn_factory = partial(
        ElectronGNN,
        n_interactions=n_interactions,
        nuclei_embedding=None,
        electron_embedding=partial(
            ElectronEmbedding,
            positional_embeddings={'ne': _dist_diff_features()},
            use_spin=False,
            project_to_embedding_dim=False,
        ),
        two_particle_stream_dim=two_particle_stream_dim,
        self_interaction=False,
        edge_features={
            'same': _dist_diff_features(),
            'anti': _dist_diff_features(),
        },
        layer_factory=partial(
            ElectronGNNLayer,
            subnet_factory=subnet,
            subnet_factory_by_lbl={
                'g': _mlp(['log', 1], False, False, jnp.tanh, 'default')
            },
            electron_residual=nn.ResidualConnection(normalize=True),
            nucleus_residual=None,
            two_particle_residual=nn.ResidualConnection(normalize=True),
            deep_features='shared',
            update_rule='concatenate',
            update_features=[
                partial(ResidualElectronUpdateFeature),
                partial(
                    NodeSumElectronUpdateFeature,
                    node_types=['up', 'down'],
                    normalize=True,
                ),
                partial(
                    ConvolutionElectronUpdateFeature,
                    edge_types=['same', 'anti'],
                    normalize=False,
                    w_factory=subnet,
                    h_factory=subnet,
                ),
            ],
        ),
    )
    omni_factory = partial(
        OmniNet,
        embedding_dim=embedding_dim,
        jastrow_factory=partial(
            Jastrow,
            sum_first=True,
            subnet_factory=_mlp(['log', 1], False, True, None, 'default'),
        ),
        backflow_factory=partial(
            Backflow, subnet_factory=_mlp(['log', 1], False, True, None, 'default')
        ),
        gnn_factory=gnn_factory,
    )
    return NeuralNetworkWaveFunction(
        hamil,
        omni_factory=omni_factory,
        envelope=_envelope(),
        backflow_op=partial(BackflowOp, mult_act=lambda x: x),
        n_determinants=n_determinants,
        full_determinant=full_determinant,
        cusp_electrons=partial(
            ElectronicCuspAsymptotic,
            same_scale=0.25,
            anti_scale=0.5,
            alpha=10.0,
            trainable_alpha=False,
            cusp_function=DeepQMCCusp(),
        ),
        cusp_nuclei=None,
        backflow_transform='mult',
        conf_coeff=_ones_linear,
    )


def ferminet_ansatz(
    hamil,
    *,
    n_determinants=16,
    full_determinant=True,
    embedding_dim=256,
    n_interactions=4,
    two_particle_stream_dim=32,
):
    """The reference's `ferminet` ansatz configuration."""
    subnet = _mlp(['log', 1], True, False, jnp.tanh, 'ferminet')
    gnn_factory = partial(
        ElectronGNN,
        n_interactions=n_interactions,
        nuclei_embedding=None,
        electron_embedding=partial(
            ElectronEmbedding,
            positional_embeddings={'ne': _dist_diff_features()},
            use_spin=False,
            project_to_embedding_dim=False,
        ),
        two_particle_stream_dim=two_particle_stream_dim,
        self_interaction=True,
        edge_features={
            'up': _dist_diff_features(),
            'down': _dist_diff_features(),
        },
        layer_factory=partial(
            ElectronGNNLayer,
            subnet_factory=subnet,
            electron_residual=nn.ResidualConnection(normalize=True),
            nucleus_residual=False,
            two_particle_residual=nn.ResidualConnection(normalize=True),
            deep_features='shared',
            update_rule='concatenate',
            update_features=[
                partial(ResidualElectronUpdateFeature),
                partial(
                    NodeSumElectronUpdateFeature,
                    node_types=['up', 'down'],
                    normalize=True,
                ),
                partial(
                    EdgeSumElectronUpdateFeature,
                    edge_types=['up', 'down'],
                    normalize=True,
                ),
            ],
        ),
    )
    omni_factory = partial(
        OmniNet,
        embedding_dim=embedding_dim,
        jastrow_factory=None,
        backflow_factory=partial(
            Backflow, subnet_factory=_mlp(['log', 1], False, True, None, 'ferminet')
        ),
        nuclear_gnn_head=None,
        gnn_factory=gnn_factory,
    )
    return NeuralNetworkWaveFunction(
        hamil,
        omni_factory=omni_factory,
        envelope=_envelope(),
        backflow_op=partial(BackflowOp, mult_act=lambda x: x),
        n_determinants=n_determinants,
        full_determinant=full_determinant,
        cusp_electrons=None,
        cusp_nuclei=None,
        backflow_transform='mult',
        conf_coeff=nn.SumPool,
    )


def psiformer_ansatz(
    hamil,
    *,
    n_determinants=16,
    full_determinant=True,
    embedding_dim=256,
    n_interactions=4,
    num_heads=4,
):
    """The reference's `psiformer` ansatz configuration."""
    gnn_factory = partial(
        ElectronGNN,
        n_interactions=n_interactions,
        nuclei_embedding=None,
        electron_embedding=partial(
            ElectronEmbedding,
            positional_embeddings={'ne': _dist_diff_features(log_rescale=True)},
            use_spin=True,
            project_to_embedding_dim=True,
        ),
        two_particle_stream_dim=32,
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
                    NodeAttentionElectronUpdateFeature,
                    num_heads=num_heads,
                    mlp_factory=_mlp(['log', 2], True, False, jnp.tanh, 'ferminet'),
                    attention_residual=nn.ResidualConnection(normalize=False),
                    mlp_residual=nn.ResidualConnection(normalize=False),
                )
            ],
        ),
    )
    omni_factory = partial(
        OmniNet,
        embedding_dim=embedding_dim,
        jastrow_factory=None,
        backflow_factory=partial(
            Backflow, subnet_factory=_mlp(['log', 1], False, True, None, 'ferminet')
        ),
        nuclear_gnn_head=None,
        gnn_factory=gnn_factory,
    )
    return NeuralNetworkWaveFunction(
        hamil,
        omni_factory=omni_factory,
        envelope=_envelope(),
        backflow_op=partial(BackflowOp, mult_act=lambda x: x),
        n_determinants=n_determinants,
        full_determinant=full_determinant,
        cusp_electrons=partial(
            ElectronicCuspAsymptotic,
            same_scale=0.25,
            anti_scale=0.5,
            alpha=1.0,
            trainable_alpha=True,
            cusp_function=PsiformerCusp(),
        ),
        cusp_nuclei=None,
        backflow_transform='mult',
        conf_coeff=nn.SumPool,
    )


def deeperwin_ansatz(
    hamil,
    *,
    n_determinants=32,
    full_determinant=True,
    embedding_dim=256,
    n_interactions=4,
    two_particle_stream_dim=32,
):
    """The reference's `deeperwin` ansatz configuration."""
    subnet = _mlp(['log', 1], True, False, jnp.tanh, 'deeperwin')
    gnn_factory = partial(
        ElectronGNN,
        n_interactions=n_interactions,
        nuclei_embedding=partial(
            NucleiEmbedding,
            embedding_dim=32,
            atom_type_embedding=True,
            subnet_type='embed',
            edge_features=None,
        ),
        electron_embedding=partial(
            ElectronEmbedding,
            positional_embeddings={'ne': _dist_diff_features()},
            use_spin=False,
            project_to_embedding_dim=False,
        ),
        two_particle_stream_dim=two_particle_stream_dim,
        self_interaction=True,
        edge_features={
            'ne': _dist_diff_features(),
            'same': DistancePowerEdgeFeature(powers=[1]),
            'anti': DistancePowerEdgeFeature(powers=[1]),
        },
        layer_factory=partial(
            ElectronGNNLayer,
            subnet_factory=subnet,
            electron_residual=False,
            nucleus_residual=False,
            two_particle_residual=nn.ResidualConnection(normalize=True),
            deep_features='separate',
            update_rule='concatenate',
            update_features=[
                partial(ResidualElectronUpdateFeature),
                partial(
                    NodeSumElectronUpdateFeature,
                    node_types=['up', 'down'],
                    normalize=True,
                ),
                partial(
                    ConvolutionElectronUpdateFeature,
                    edge_types=['ee', 'ne'],
                    normalize=False,
                    w_factory=subnet,
                    h_factory=subnet,
                    w_for_ne=False,
                ),
            ],
        ),
    )
    omni_factory = partial(
        OmniNet,
        embedding_dim=embedding_dim,
        jastrow_factory=None,
        backflow_factory=partial(
            Backflow,
            subnet_factory=_mlp(['log', 1], False, True, nn.ssp, 'deeperwin'),
        ),
        nuclear_gnn_head=None,
        gnn_factory=gnn_factory,
    )
    return NeuralNetworkWaveFunction(
        hamil,
        omni_factory=omni_factory,
        envelope=partial(
            ExponentialEnvelopes,
            isotropic=True,
            per_shell=False,
            per_orbital_exponent=True,
            spin_restricted=False,
            init_to_ones=True,
            softplus_zeta=True,
        ),
        backflow_op=partial(BackflowOp, mult_act=lambda x: x),
        n_determinants=n_determinants,
        full_determinant=full_determinant,
        cusp_electrons=None,
        cusp_nuclei=None,
        backflow_transform='mult',
        conf_coeff=nn.SumPool,
    )


_PRESETS = {
    'default': default_ansatz,
    'ferminet': ferminet_ansatz,
    'psiformer': psiformer_ansatz,
    'deeperwin': deeperwin_ansatz,
}


def ansatz_preset(name: str, **overrides):
    """Return an ansatz factory ``hamil -> module`` for a named preset."""
    return partial(_PRESETS[name], **overrides)
