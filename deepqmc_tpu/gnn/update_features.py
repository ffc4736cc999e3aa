"""Update-feature modules: the dial that turns the generic GNN into
FermiNet / PauliNet / DeepErwin / PsiFormer.

Reference: /root/reference/src/deepqmc/gnn/update_features.py.  The attention
variants use our :class:`~deepqmc_tpu.nn.modules.MultiHeadAttention`, whose
QK^T/V contractions map straight onto the MXU.
"""

from collections.abc import Mapping, Sequence
from typing import Optional

import jax.numpy as jnp

from .. import nn
from .graph import GraphNodes
from .utils import NodeEdgeMapping

__all__ = ()


class UpdateFeature(nn.Module):
    """Base class: maps (nodes, edges) -> list of per-node update features."""

    def __init__(
        self,
        n_up: int,
        n_down: int,
        two_particle_stream_dim: int,
        node_edge_mapping: NodeEdgeMapping,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.n_up = n_up
        self.n_down = n_down
        self.node_edge_mapping = node_edge_mapping
        self.two_particle_stream_dim = two_particle_stream_dim

    @property
    def names(self) -> list[str]:
        raise NotImplementedError

    def __call__(self, nodes: GraphNodes, edges: Mapping) -> Sequence[GraphNodes]:
        raise NotImplementedError


class ResidualElectronUpdateFeature(UpdateFeature):
    """Pass the previous electron embeddings through unchanged."""

    @property
    def names(self):
        return ['residual']

    def __call__(self, nodes, edges):
        return [GraphNodes(None, nodes.electrons)]


class NodeSumElectronUpdateFeature(UpdateFeature):
    """(Normalized) per-spin sums of the electron embeddings."""

    def __init__(self, *args, node_types, normalize, name=None):
        assert all(t in {'up', 'down'} for t in node_types)
        super().__init__(*args, name=name)
        self.node_types = node_types
        self.normalize = normalize

    @property
    def names(self):
        return [f'node_{t}' for t in self.node_types]

    def __call__(self, nodes, edges):
        slices = {'up': slice(None, self.n_up), 'down': slice(self.n_up, None)}
        reduce_fn = jnp.mean if self.normalize else jnp.sum
        n_el = self.n_up + self.n_down
        return [
            GraphNodes(
                None,
                jnp.tile(
                    reduce_fn(nodes.electrons[slices[t]], axis=0, keepdims=True),
                    (n_el, 1),
                ),
            )
            for t in self.node_types
        ]


class EdgeSumElectronUpdateFeature(UpdateFeature):
    """(Normalized) sums of edge embeddings per edge type."""

    def __init__(self, *args, edge_types, normalize, name=None):
        assert all(t in {'up', 'down', 'same', 'anti', 'ee', 'ne'} for t in edge_types)
        super().__init__(*args, name=name)
        self.edge_types = edge_types
        self.normalize = normalize

    @property
    def names(self):
        return [f'edge_{t}' for t in self.edge_types]

    def __call__(self, nodes, edges):
        updates = []
        for t in self.edge_types:
            if t == 'ee':
                factor = self.n_up + self.n_down if self.normalize else 1.0
                summed = (
                    edges['same'].sum_senders(False) + edges['anti'].sum_senders(False)
                ) / factor
            else:
                summed = edges[t].sum_senders(self.normalize)
            updates.append(GraphNodes(None, summed))
        return updates


class ConvolutionElectronUpdateFeature(UpdateFeature):
    """PauliNet/DeepErwin style w(edge) * h(sender-node) convolution."""

    def __init__(
        self,
        *args,
        edge_types,
        normalize,
        w_factory,
        h_factory,
        w_for_ne=True,
        name=None,
    ):
        assert all(t in {'up', 'down', 'same', 'anti', 'ee', 'ne'} for t in edge_types)
        super().__init__(*args, name=name)
        self.edge_types = edge_types
        self.normalize = normalize
        self.w_factory = w_factory
        self.h_factory = h_factory
        self.w_for_ne = w_for_ne

    @property
    def names(self):
        return [f'conv_{t}' for t in self.edge_types]

    def _convolve_type(self, nodes, edges, edge_type, normalize):
        if self.w_for_ne or edge_type != 'ne':
            w = self.w_factory(self.two_particle_stream_dim, name=f'w_{edge_type}')
        else:
            w = nn.Identity()
        we = w(edges[edge_type].single_array)
        h = self.h_factory(we.shape[-1], name=f'h_{edge_type}')
        hx = h(self.node_edge_mapping.sender_data_of(edge_type, nodes))
        if edges[edge_type].single_array.size == 0:
            # parameters applied to size-zero arrays breed NaN gradients
            return jnp.zeros((hx.shape[0], self.two_particle_stream_dim))
        return edges[edge_type].update_from_single_array(we).convolve(hx, normalize)

    def __call__(self, nodes, edges):
        updates = []
        for t in self.edge_types:
            if t == 'ee':
                ee = sum(
                    self._convolve_type(nodes, edges, st, False)
                    for st in ['same', 'anti']
                )
                factor = self.n_up + self.n_down if self.normalize else 1.0
                updates.append(GraphNodes(None, ee / factor))
            else:
                updates.append(
                    GraphNodes(None, self._convolve_type(nodes, edges, t, self.normalize))
                )
        return updates


class NodeAttentionElectronUpdateFeature(UpdateFeature):
    """PsiFormer self-attention over electron embeddings."""

    def __init__(
        self, *args, num_heads, mlp_factory, attention_residual, mlp_residual, name=None
    ):
        super().__init__(*args, name=name)
        self.num_heads = num_heads
        self.mlp_factory = mlp_factory
        self.attention_residual = attention_residual
        self.mlp_residual = mlp_residual

    @property
    def names(self):
        return ['attention']

    def __call__(self, nodes, edges):
        h = nodes.electrons
        head_dim, rem = divmod(h.shape[-1], self.num_heads)
        assert rem == 0, 'embedding_dim must be divisible by num_heads'

        def block(h):
            attended = nn.MultiHeadAttention(
                self.num_heads,
                head_dim,
                with_bias=False,
                w_init=nn.variance_scaling(1.0, 'fan_in', 'normal'),
                name='attention',
            )(h, h, h)
            if self.attention_residual:
                attended = self.attention_residual(h, attended)
            mlp_out = self.mlp_factory(h.shape[-1], name='mlp')(attended)
            if self.mlp_residual:
                mlp_out = self.mlp_residual(attended, mlp_out)
            return mlp_out

        # one named-jit unit per layer: the forward-Laplacian engine fuses
        # the whole attention+MLP block into a single VMEM-resident kernel
        mlp_out = nn.named_jit_block('_psiformer_block', block, h)
        return [GraphNodes(None, mlp_out)]


class CombinedNodeAttentionUpdateFeature(UpdateFeature):
    """Attention over the union of nuclei and electron nodes."""

    def __init__(
        self,
        *args,
        num_heads,
        mlp_factory,
        attention_residual,
        mlp_residual,
        elec_to_nuc,
        name=None,
    ):
        super().__init__(*args, name=name)
        self.num_heads = num_heads
        self.mlp_factory = mlp_factory
        self.attention_residual = attention_residual
        self.mlp_residual = mlp_residual
        self.elec_to_nuc = elec_to_nuc

    @property
    def names(self):
        return ['combined_attention']

    def __call__(self, nodes, edges):
        n_nuc = len(nodes.nuclei)
        n_el = len(nodes.electrons)
        h = jnp.concatenate([nodes.nuclei, nodes.electrons], axis=0)
        if self.elec_to_nuc:
            mask = None
        else:
            # nuclei attend only to nuclei
            mask = (
                jnp.ones((1, n_nuc + n_el, n_nuc + n_el), dtype=bool)
                .at[:, :n_nuc, n_nuc:]
                .set(False)
            )
        head_dim, rem = divmod(h.shape[-1], self.num_heads)
        assert rem == 0, 'embedding_dim must be divisible by num_heads'
        attended = nn.MultiHeadAttention(
            self.num_heads,
            head_dim,
            with_bias=False,
            w_init=nn.variance_scaling(1.0, 'fan_in', 'normal'),
            name='attention',
        )(h, h, h, mask)
        if self.attention_residual:
            attended = self.attention_residual(h, attended)
        mlp_out = self.mlp_factory(h.shape[-1], name='mlp')(attended)
        if self.mlp_residual:
            mlp_out = self.mlp_residual(attended, mlp_out)
        nuclei_out, electrons_out = jnp.split(mlp_out, [n_nuc], axis=0)
        return [GraphNodes(nuclei_out, electrons_out)]
