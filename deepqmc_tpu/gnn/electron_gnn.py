"""The generic electron(+nuclei) graph neural network.

Reference: /root/reference/src/deepqmc/gnn/electron_gnn.py.  One architecture,
configured into FermiNet / PauliNet / DeepErwin / PsiFormer via the update
features and subnetwork factories.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from .graph import Graph, GraphNodes, MolecularGraphEdgeBuilder
from .utils import NodeEdgeMapping

__all__ = ()

# How a node family folds its list of per-channel messages into one update.
# Each entry takes (nets, messages): ``nets`` is one network for the fused
# rules or an ordered list of per-channel networks for 'featurewise'.  The
# fused rules ('concatenate', 'sum', 'featurewise_shared') are preferred on
# TPU: they feed the MXU one large matmul instead of several small ones.
_NODE_UPDATE_RULES = {
    'concatenate': lambda nets, msgs: nets(jnp.concatenate(msgs, axis=-1)),
    'sum': lambda nets, msgs: nets(_elementwise_sum(msgs)),
    'featurewise_shared': lambda nets, msgs: nets(jnp.stack(msgs)).sum(axis=0),
    'featurewise': lambda nets, msgs: _elementwise_sum(
        [net(m) for net, m in zip(nets, msgs)]
    ),
}

#: update rules whose messages must already live in the embedding dimension
_WIDTH_PRESERVING_RULES = frozenset({'sum', 'featurewise_shared'})


def _elementwise_sum(arrays):
    total = arrays[0]
    for a in arrays[1:]:
        total = total + a
    return total


class ElectronGNNLayer(nn.Module):
    """One message-passing interaction of the :class:`ElectronGNN`.

    The kwargs surface is pinned by Hydra config compatibility with the
    reference layer (electron_gnn.py:14-271): ``deep_features`` in
    {False, 'shared', 'separate'} controls the two-particle stream update;
    ``update_rule`` (a key of ``_NODE_UPDATE_RULES``) controls how the
    per-channel messages fold into the one-particle stream.  Internally the
    layer is organized around that rule table plus two streams:
    ``_one_particle_update`` (electrons, and nuclei when present) and
    ``_two_particle_update`` (edge refresh for the next interaction).
    """

    def __init__(
        self,
        n_interactions,
        ilayer,
        n_nuc,
        n_up,
        n_down,
        embedding_dim,
        edge_types,
        self_interaction,
        node_data,
        two_particle_stream_dim,
        *,
        electron_residual,
        nucleus_residual,
        two_particle_residual,
        deep_features,
        update_features,
        update_rule,
        subnet_factory=None,
        subnet_factory_by_lbl=None,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.n_nuc, self.n_up, self.n_down = n_nuc, n_up, n_down
        self.last_layer = ilayer == n_interactions - 1
        # the final interaction only needs electron embeddings, so edges
        # that feed nucleus updates are dropped from it
        self.edge_types = tuple(
            typ for typ in edge_types if not self.last_layer or typ not in {'nn', 'en'}
        )
        self.mapping = NodeEdgeMapping(self.edge_types, node_data=node_data)
        if update_rule not in _NODE_UPDATE_RULES:
            raise ValueError(f'unknown update_rule: {update_rule!r}')
        if (
            update_rule in _WIDTH_PRESERVING_RULES
            and embedding_dim != two_particle_stream_dim
        ):
            raise ValueError(
                f'update_rule {update_rule!r} needs embedding_dim =='
                ' two_particle_stream_dim'
            )
        if deep_features not in (False, 'shared', 'separate'):
            raise ValueError(f'unknown deep_features: {deep_features!r}')
        self.deep_features = deep_features
        self.update_rule = update_rule
        factories = {
            lbl: (subnet_factory_by_lbl or {}).get(lbl) or subnet_factory
            for lbl in ('g', 'u')
        }
        # construction order (u nets -> message channels -> g nets) fixes the
        # rng draw order at init and therefore the parameter values; names
        # ('u', 'u{typ}', 'g', 'g_{channel}') fix the parameter paths
        if deep_features:
            self.u = (
                factories['u'](two_particle_stream_dim, name='u')
                if deep_features == 'shared'
                else {
                    typ: factories['u'](two_particle_stream_dim, name=f'u{typ}')
                    for typ in self.edge_types
                }
            )
        self.update_features = [
            uf(n_up, n_down, two_particle_stream_dim, self.mapping)
            for uf in update_features
        ]
        self.channel_names = [
            name_ for uf in self.update_features for name_ in uf.names
        ]
        self.g_factory = factories['g']
        self.g = self._one_particle_nets(embedding_dim, 'g', self.channel_names)
        self.electron_residual = electron_residual
        self.nucleus_residual = nucleus_residual
        self.two_particle_residual = two_particle_residual
        self.self_interaction = self_interaction

    def _one_particle_nets(self, dim, tag, channel_names):
        """Networks backing one update rule: one net, or one per channel."""
        if self.update_rule == 'featurewise':
            return [
                self.g_factory(dim, name=f'{tag}_{name_}') for name_ in channel_names
            ]
        return self.g_factory(dim, name=tag)

    def _one_particle_update(self, old, nets, messages, residual):
        new = _NODE_UPDATE_RULES[self.update_rule](nets, messages)
        return residual(old, new) if residual else new

    def _two_particle_update(self, edges):
        if self.deep_features == 'shared':
            # every edge of every type goes through ONE shared-MLP matmul
            # (MXU-large and KFAC-friendly), then the result is sliced back
            # into the per-type containers
            order = list(edges)
            arrays = {typ: edges[typ].single_array for typ in order}
            fused = self.u(jnp.concatenate([arrays[typ] for typ in order]))
            new, offset = {}, 0
            for typ in order:
                n = arrays[typ].shape[0]
                new[typ] = edges[typ].update_from_single_array(
                    fused[offset : offset + n]
                )
                offset += n
        else:  # separate per-type networks
            new = {
                typ: edge.update_from_single_array(self.u[typ](edge.single_array))
                for typ, edge in edges.items()
            }
        if self.two_particle_residual:
            new = self.two_particle_residual(edges, new)
        return new

    def _collect_messages(self, nodes, edges):
        """Evaluate every update-feature channel against the incoming graph."""
        per_channel = [msg for uf in self.update_features for msg in uf(nodes, edges)]
        return (
            [m.nuclei for m in per_channel if m.nuclei is not None],
            [m.electrons for m in per_channel if m.electrons is not None],
        )

    def __call__(self, graph):
        # messages are computed against the INCOMING edges; the edge refresh
        # below only feeds the next interaction
        nuc_messages, elec_messages = self._collect_messages(graph.nodes, graph.edges)
        electrons = self._one_particle_update(
            graph.nodes.electrons, self.g, elec_messages, self.electron_residual
        )
        nuclei = graph.nodes.nuclei
        if nuclei is not None and nuc_messages:
            # built lazily: the nucleus stream width is only known at call time
            g_nuc = self._one_particle_nets(
                nuclei.shape[-1], 'g_nuc', self.channel_names
            )
            nuclei = self._one_particle_update(
                nuclei, g_nuc, nuc_messages, self.nucleus_residual
            )
        edges = graph.edges
        if self.deep_features and not self.last_layer:
            edges = self._two_particle_update(edges)
        return Graph(GraphNodes(nuclei, electrons), edges)


def _spin_node_types(n_up, n_down):
    """Electron node-type metadata: one type, or up/down when asymmetric."""
    distinct = n_up != n_down
    return {
        'n_node_types': {'electrons': 2 if distinct else 1},
        'node_types': {
            'electrons': jnp.array(n_up * [0] + n_down * [1 if distinct else 0])
        },
    }


class ElectronGNN(nn.Module):
    """GNN over electrons and nuclei producing electron embeddings.

    Kwargs surface matches the reference factory (electron_gnn.py:273-428)
    for Hydra config compatibility.  ``ghost_coords`` appends chargeless
    nuclei useful for breaking spatial symmetries.  On TPU, edge-free
    electron-only stacks (PsiFormer) run as one fused named-jit unit so the
    forward-Laplacian Jacobian channel stays on-chip across layers.
    """

    def __init__(
        self,
        hamil,
        embedding_dim,
        *,
        n_interactions,
        edge_features,
        self_interaction,
        two_particle_stream_dim,
        nuclei_embedding,
        electron_embedding,
        layer_factory,
        ghost_coords=None,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        n_up, n_down = hamil.n_up, hamil.n_down
        # ghost atoms enter the graph as extra zero-charge nuclei
        if ghost_coords is None:
            self.ghost_coords = None
            charges, n_nuc = jnp.asarray(hamil.mol.charges), hamil.n_nuc
            n_atom_types = hamil.mol.n_atom_types
        else:
            self.ghost_coords = jnp.asarray(ghost_coords)
            charges = jnp.concatenate(
                [hamil.mol.charges, jnp.zeros(len(self.ghost_coords))]
            )
            n_nuc = hamil.n_nuc + len(self.ghost_coords)
            n_atom_types = hamil.mol.n_atom_types + 1
        self.n_nuc, self.n_up, self.n_down = n_nuc, n_up, n_down
        self.embedding_dim = embedding_dim
        self.node_data = {
            'n_nodes': {'nuclei': n_nuc, 'electrons': n_up + n_down},
            **_spin_node_types(n_up, n_down),
        }
        self.edge_features = edge_features or {}
        self.edge_types = tuple(self.edge_features)
        layer_args = (
            n_nuc,
            n_up,
            n_down,
            embedding_dim,
            self.edge_types,
            self_interaction,
            self.node_data,
            two_particle_stream_dim,
        )
        self.layers = [
            layer_factory(n_interactions, ilayer, *layer_args)
            for ilayer in range(n_interactions)
        ]
        self.nuclei_embedding = (
            nuclei_embedding(n_up, n_down, charges, n_atom_types)
            if nuclei_embedding
            else None
        )
        self.electron_embedding = electron_embedding(
            n_nuc,
            n_up,
            n_down,
            embedding_dim,
            self.node_data['n_node_types']['electrons'],
            self.node_data['node_types']['electrons'],
        )
        self.self_interaction = self_interaction

    def edge_factory(self, phys_conf):
        """Build and featurize the typed all-pairs edge containers."""
        build = MolecularGraphEdgeBuilder(
            self.n_nuc,
            self.n_up,
            self.n_down,
            self.edge_types,
            self_interaction=self.self_interaction,
        )
        raw = build(phys_conf)
        return {
            typ: raw[typ].update_from_single_array(featurize(raw[typ].single_array))
            for typ, featurize in self.edge_features.items()
        }

    def node_factory(self, phys_conf):
        """Initial embeddings: nuclei (optional) feed the electron stream."""
        nuclei = self.nuclei_embedding(phys_conf) if self.nuclei_embedding else None
        return GraphNodes(nuclei, self.electron_embedding(phys_conf, nuclei))

    def __call__(self, phys_conf):
        if self.ghost_coords is not None:
            phys_conf = phys_conf.replace(
                R=jnp.concatenate([phys_conf.R, self.ghost_coords], axis=-2)
            )
        graph = Graph(self.node_factory(phys_conf), self.edge_factory(phys_conf))
        if (
            os.environ.get('DEEPQMC_TPU_GNN_STACK_BLOCK')
            and not self.edge_types
            and graph.nodes.nuclei is None
        ):
            # edge-free electron-only stacks (PsiFormer) are one h -> h
            # function; a single named-jit unit lets the forward-Laplacian
            # engine fuse ALL layers into one kernel, so the [walker, 3N,
            # elec, dim] Jacobian channel crosses HBM twice per network
            # instead of twice per layer
            def stack(h):
                g = Graph(GraphNodes(None, h), {})
                for layer in self.layers:
                    g = layer(g)
                return g.nodes.electrons

            electrons = nn.named_jit_block(
                '_gnn_stack', stack, graph.nodes.electrons
            )
            return GraphNodes(None, electrons)
        for layer in self.layers:
            graph = layer(graph)
        return graph.nodes


def _atom_type_ids(charges):
    """Integer id per nucleus, identical charges sharing an id."""
    return jnp.unique(charges, size=len(charges), return_inverse=True)[-1]


def _spin_column(n_up, n_down):
    """A +1/-1 per-electron spin feature column."""
    return jnp.concatenate([jnp.ones(n_up), -jnp.ones(n_down)])[:, None]


def _silu_mlp(width, name, hidden):
    """The two-layer silu MLP shape shared by the embedding modules."""
    return nn.MLP(
        width,
        name=name,
        hidden_layers=(hidden,),
        bias=True,
        last_linear=True,
        activation=jax.nn.silu,
        init='ferminet',
    )


class NucleiEmbedding(nn.Module):
    """Initial nuclear embeddings (reference electron_gnn.py:431-545).

    Two modes: a geometry-aware one (``edge_features`` set) that pools
    learned nn-edge messages per nucleus, and a geometry-free one that maps
    a per-nucleus identity token (index, charge, or atom-type id) through
    ``subnet_type`` ('mlp' or 'embed').
    """

    def __init__(
        self,
        n_up,
        n_down,
        charges,
        n_atom_types,
        *,
        embedding_dim,
        atom_type_embedding,
        subnet_type,
        edge_features,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        if subnet_type not in ('mlp', 'embed'):
            raise ValueError(f'unknown subnet_type: {subnet_type!r}')
        n_nuc = len(charges)
        self.edge_features = edge_features
        if edge_features:
            self.edge_factory = MolecularGraphEdgeBuilder(
                n_nuc, n_up, n_down, ['nn'], self_interaction=True
            )
            self.edge_mlp = _silu_mlp(32, 'edge_mlp', 32)
            self.embed_mlp = _silu_mlp(embedding_dim, 'embed_mlp', embedding_dim)
        self.charge_embedding = jnp.tile(
            jax.nn.one_hot(_atom_type_ids(charges), n_nuc)[:, None], (1, n_nuc, 1)
        )
        if subnet_type == 'mlp':
            self.subnet = nn.MLP(
                embedding_dim,
                hidden_layers=['log', 1],
                bias=True,
                last_linear=False,
                activation=jnp.tanh,
                init='deeperwin',
            )
            token = charges if atom_type_embedding else jnp.arange(n_nuc)
            self.input = token[:, None]
        else:
            self.subnet = nn.Embed(
                n_atom_types if atom_type_embedding else n_nuc, embedding_dim
            )
            self.input = (
                _atom_type_ids(charges) if atom_type_embedding else jnp.arange(n_nuc)
            )

    def __call__(self, phys_conf):
        if not self.edge_features:
            return self.subnet(self.input)
        feats = self.edge_features(self.edge_factory(phys_conf)['nn'].single_array)
        messages = self.edge_mlp(
            jnp.concatenate([feats, self.charge_embedding], axis=-1)
        )
        return self.embed_mlp(messages.sum(axis=0))


class ElectronEmbedding(nn.Module):
    """Initial electron embeddings (reference electron_gnn.py:548-650)."""

    def __init__(
        self,
        n_nuc,
        n_up,
        n_down,
        embedding_dim,
        n_elec_types,
        elec_types,
        *,
        positional_embeddings,
        use_spin,
        project_to_embedding_dim,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.n_nuc = n_nuc
        self.n_up = n_up
        self.n_down = n_down
        self.embedding_dim = embedding_dim
        self.n_elec_types = n_elec_types
        self.elec_types = elec_types
        self.positional_embeddings = positional_embeddings
        self.use_spin = use_spin
        self.project_to_embedding_dim = project_to_embedding_dim

    def __call__(self, phys_conf, nucleus_embedding):
        if not self.positional_embeddings:
            return nn.Embed(
                self.n_elec_types, self.embedding_dim, name='electronic_embedding'
            )(self.elec_types)
        n_el = self.n_up + self.n_down
        edges = MolecularGraphEdgeBuilder(
            self.n_nuc,
            self.n_up,
            self.n_down,
            list(self.positional_embeddings),
            self_interaction=False,
        )(phys_conf)
        # one flattened per-receiver feature row per edge type, plus spin
        columns = [
            featurize(edges[typ].single_array).swapaxes(0, 1).reshape(n_el, -1)
            for typ, featurize in self.positional_embeddings.items()
        ]
        if self.use_spin:
            columns.append(_spin_column(self.n_up, self.n_down))
        x = jnp.concatenate(columns, axis=1)
        if self.project_to_embedding_dim:
            x = nn.Linear(self.embedding_dim, with_bias=False)(x)
        return x


class PermutationInvariantEmbedding(nn.Module):
    """Electron embeddings invariant to exchanges of identical nuclei
    (reference electron_gnn.py:653-713)."""

    def __init__(
        self,
        n_nuc,
        n_up,
        n_down,
        embedding_dim,
        n_elec_types,
        elec_types,
        charges,
        *,
        edge_dim,
        edge_features,
        nuclear_charge_dependence,
        use_spin,
        name: Optional[str] = None,
    ):
        assert nuclear_charge_dependence in {'concatenate', 'elementwise-product'}
        super().__init__(name=name)
        self.n_up = n_up
        self.n_down = n_down
        self.embedding_dim = embedding_dim
        self.edge_factory = MolecularGraphEdgeBuilder(
            n_nuc, n_up, n_down, ['ne'], self_interaction=False
        )
        self.edge_features = edge_features
        self.nuclear_charge_dependence = nuclear_charge_dependence
        self.charge_embedding = jax.nn.one_hot(
            jnp.unique(charges, size=len(charges), return_inverse=True)[-1],
            len(charges),
        )
        self.use_spin = use_spin
        if nuclear_charge_dependence == 'elementwise-product':
            self.charge_linear = nn.Linear(edge_dim, name='edge_linear', with_bias=True)
            self.edge_linear = nn.Linear(edge_dim, with_bias=True)
        else:
            self.charge_embedding = jnp.tile(
                self.charge_embedding[:, None], (1, n_up + n_down, 1)
            )
            self.edge_mlp = _silu_mlp(edge_dim, 'edge_mlp', edge_dim)
        self.embed_mlp = _silu_mlp(embedding_dim, 'embed_mlp', embedding_dim)

    def _ne_messages(self, ne_features, nucleus_embedding):
        """Per (nucleus, electron) messages carrying nuclear identity."""
        if self.nuclear_charge_dependence == 'elementwise-product':
            gate = jax.nn.sigmoid(self.edge_linear(ne_features))
            return gate * self.charge_linear(self.charge_embedding)[..., None, :]
        nuc = (
            self.charge_embedding
            if nucleus_embedding is None
            else jnp.tile(
                nucleus_embedding[:, None, :], (1, self.n_up + self.n_down, 1)
            )
        )
        return self.edge_mlp(jnp.concatenate([ne_features, nuc], axis=-1))

    def __call__(self, phys_conf, nucleus_embedding):
        ne_features = self.edge_features(
            self.edge_factory(phys_conf)['ne'].single_array
        )
        pooled = self._ne_messages(ne_features, nucleus_embedding).sum(axis=0)
        if self.use_spin:
            pooled = jnp.concatenate(
                [pooled, _spin_column(self.n_up, self.n_down)], axis=1
            )
        return self.embed_mlp(pooled)
