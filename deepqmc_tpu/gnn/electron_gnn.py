"""The generic electron(+nuclei) graph neural network.

Reference: /root/reference/src/deepqmc/gnn/electron_gnn.py.  One architecture,
configured into FermiNet / PauliNet / DeepErwin / PsiFormer via the update
features and subnetwork factories.
"""

import os
from itertools import accumulate
from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from .graph import Graph, GraphNodes, GraphUpdate, MolecularGraphEdgeBuilder
from .utils import NodeEdgeMapping

__all__ = ()


class ElectronGNNLayer(nn.Module):
    """One message-passing interaction of the :class:`ElectronGNN`.

    Args mirror the reference layer (electron_gnn.py:14-271): ``deep_features``
    in {False, 'shared', 'separate'} controls the two-particle stream update;
    ``update_rule`` in {'concatenate', 'featurewise', 'featurewise_shared',
    'sum'} controls how update features combine into the one-particle stream.
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
        self.edge_types = tuple(
            typ for typ in edge_types if not self.last_layer or typ not in {'nn', 'en'}
        )
        self.mapping = NodeEdgeMapping(self.edge_types, node_data=node_data)
        assert update_rule in (
            'concatenate',
            'featurewise',
            'featurewise_shared',
            'sum',
        )
        assert (
            update_rule not in ('sum', 'featurewise_shared')
            or embedding_dim == two_particle_stream_dim
        )
        assert deep_features in (False, 'shared', 'separate')
        self.deep_features = deep_features
        self.update_rule = update_rule
        subnet_factory_by_lbl = dict(subnet_factory_by_lbl or {})
        for lbl in ('g', 'u'):
            subnet_factory_by_lbl.setdefault(lbl, subnet_factory)
        if deep_features:
            u_factory = subnet_factory_by_lbl['u']
            self.u = (
                u_factory(two_particle_stream_dim, name='u')
                if deep_features == 'shared'
                else {
                    typ: u_factory(two_particle_stream_dim, name=f'u{typ}')
                    for typ in self.edge_types
                }
            )
        self.update_features = [
            uf(n_up, n_down, two_particle_stream_dim, self.mapping)
            for uf in update_features
        ]
        self.g_factory = subnet_factory_by_lbl['g']
        self.g = (
            self.g_factory(embedding_dim, name='g')
            if update_rule != 'featurewise'
            else {
                name_: self.g_factory(embedding_dim, name=f'g_{name_}')
                for uf in self.update_features
                for name_ in uf.names
            }
        )
        self.electron_residual = electron_residual
        self.nucleus_residual = nucleus_residual
        self.two_particle_residual = two_particle_residual
        self.self_interaction = self_interaction

    def _update_edges(self, edges):
        if not self.deep_features:
            return edges
        if self.deep_features == 'shared':
            # concatenate all edge types along the edge axis so one shared MLP
            # processes them in a single (KFAC-friendly, MXU-large) matmul
            keys, edge_objects = zip(*edges.items())
            feats = [e.single_array for e in edge_objects]
            split_idxs = list(accumulate(len(f) for f in feats))
            updated = jnp.split(self.u(jnp.concatenate(feats)), split_idxs)
            updated_edges = {
                k: e.update_from_single_array(f)
                for k, e, f in zip(keys, edge_objects, updated)
            }
        else:  # separate
            updated_edges = {
                typ: edge.update_from_single_array(self.u[typ](edge.single_array))
                for typ, edge in edges.items()
            }
        if self.two_particle_residual:
            updated_edges = self.two_particle_residual(edges, updated_edges)
        return updated_edges

    def _aggregate(self, nodes, edges):
        fs: list = sum((uf(nodes, edges) for uf in self.update_features), start=[])
        return GraphNodes(
            [f.nuclei for f in fs if f.nuclei is not None],
            [f.electrons for f in fs if f.electrons is not None],
        )

    def _apply_update_rule(self, nodes, update_network, update_features, residual):
        if self.update_rule == 'concatenate':
            updated = update_network(jnp.concatenate(update_features, axis=-1))
        elif self.update_rule == 'featurewise':
            updated = sum(
                update_network[name_](f)
                for f, name_ in zip(update_features, update_network.keys())
            )
        elif self.update_rule == 'sum':
            updated = update_network(sum(update_features))
        else:  # featurewise_shared
            updated = jnp.sum(update_network(jnp.stack(update_features)), axis=0)
        if residual:
            updated = residual(nodes, updated)
        return updated

    def _update_nodes(self, nodes, update_features: GraphNodes):
        updated_electrons = self._apply_update_rule(
            nodes.electrons, self.g, update_features.electrons, self.electron_residual
        )
        if nodes.nuclei is not None and update_features.nuclei:
            g_nuc = (
                self.g_factory(nodes.nuclei.shape[-1], name='g_nuc')
                if self.update_rule != 'featurewise'
                else {
                    name_: self.g_factory(nodes.nuclei.shape[-1], name=f'g_nuc_{name_}')
                    for uf in update_features.nuclei
                    for name_ in uf.names
                }
            )
            updated_nuclei = self._apply_update_rule(
                nodes.nuclei, g_nuc, update_features.nuclei, self.nucleus_residual
            )
        else:
            updated_nuclei = nodes.nuclei
        return GraphNodes(updated_nuclei, updated_electrons)

    def __call__(self, graph):
        update_graph = GraphUpdate(
            aggregate_edges_for_nodes_fn=self._aggregate,
            update_nodes_fn=self._update_nodes,
            update_edges_fn=None if self.last_layer else self._update_edges,
        )
        return update_graph(graph)


class ElectronGNN(nn.Module):
    """GNN over electrons and nuclei producing electron embeddings.

    Reference: electron_gnn.py:273-428.  ``ghost_coords`` appends chargeless
    nuclei useful for breaking spatial symmetries.
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
        n_nuc, n_up, n_down = hamil.n_nuc, hamil.n_up, hamil.n_down
        n_atom_types = hamil.mol.n_atom_types
        charges = hamil.mol.charges
        self.ghost_coords = None
        if ghost_coords is not None:
            charges = jnp.concatenate([charges, jnp.zeros(len(ghost_coords))])
            n_nuc += len(ghost_coords)
            n_atom_types += 1
            self.ghost_coords = jnp.asarray(ghost_coords)
        self.n_nuc, self.n_up, self.n_down = n_nuc, n_up, n_down
        self.embedding_dim = embedding_dim
        self.node_data = {
            'n_nodes': {'nuclei': n_nuc, 'electrons': n_up + n_down},
            'n_node_types': {'electrons': 1 if n_up == n_down else 2},
            'node_types': {
                'electrons': jnp.array(n_up * [0] + n_down * [int(n_up != n_down)])
            },
        }
        self.edge_types = tuple((edge_features or {}).keys())
        self.layers = [
            layer_factory(
                n_interactions,
                ilayer,
                n_nuc,
                n_up,
                n_down,
                embedding_dim,
                self.edge_types,
                self_interaction,
                self.node_data,
                two_particle_stream_dim,
            )
            for ilayer in range(n_interactions)
        ]
        self.edge_features = edge_features
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
        build = MolecularGraphEdgeBuilder(
            self.n_nuc,
            self.n_up,
            self.n_down,
            self.edge_types,
            self_interaction=self.self_interaction,
        )
        edges = build(phys_conf)
        return {
            typ: edges[typ].update_from_single_array(
                self.edge_features[typ](edges[typ].single_array)
            )
            for typ in self.edge_types
        }

    def node_factory(self, phys_conf):
        nucleus_embedding = (
            self.nuclei_embedding(phys_conf) if self.nuclei_embedding else None
        )
        electron_embedding = self.electron_embedding(phys_conf, nucleus_embedding)
        return GraphNodes(nucleus_embedding, electron_embedding)

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


class NucleiEmbedding(nn.Module):
    """Initial nuclear embeddings (reference electron_gnn.py:431-545)."""

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
        assert subnet_type in ('mlp', 'embed')
        self.edge_features = edge_features
        if edge_features:
            self.edge_factory = MolecularGraphEdgeBuilder(
                len(charges), n_up, n_down, ['nn'], self_interaction=True
            )
            self.edge_mlp = nn.MLP(
                32,
                name='edge_mlp',
                hidden_layers=(32,),
                bias=True,
                last_linear=True,
                activation=jax.nn.silu,
                init='ferminet',
            )
            self.embed_mlp = nn.MLP(
                embedding_dim,
                name='embed_mlp',
                hidden_layers=(embedding_dim,),
                bias=True,
                last_linear=True,
                activation=jax.nn.silu,
                init='ferminet',
            )
        self.charge_embedding = jnp.tile(
            jax.nn.one_hot(
                jnp.unique(charges, size=len(charges), return_inverse=True)[-1],
                len(charges),
            )[:, None],
            (1, len(charges), 1),
        )
        n_nuc_types = n_atom_types if atom_type_embedding else len(charges)
        if subnet_type == 'mlp':
            self.subnet = nn.MLP(
                embedding_dim,
                hidden_layers=['log', 1],
                bias=True,
                last_linear=False,
                activation=jnp.tanh,
                init='deeperwin',
            )
        else:
            self.subnet = nn.Embed(n_nuc_types, embedding_dim)
        if not atom_type_embedding:
            self.input = jnp.arange(len(charges))
        elif subnet_type == 'mlp':
            self.input = charges
        else:
            self.input = jnp.unique(charges, size=len(charges), return_inverse=True)[-1]
        if subnet_type == 'mlp':
            self.input = self.input[:, None]

    def __call__(self, phys_conf):
        if self.edge_features:
            nn_feats = self.edge_features(
                self.edge_factory(phys_conf)['nn'].single_array
            )
            nn_feats = jnp.concatenate([nn_feats, self.charge_embedding], axis=-1)
            nn_edges = self.edge_mlp(nn_feats)
            return self.embed_mlp(nn_edges.sum(axis=0))
        return self.subnet(self.input)


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
        n_el = self.n_up + self.n_down
        if self.positional_embeddings:
            edge_factory = MolecularGraphEdgeBuilder(
                self.n_nuc,
                self.n_up,
                self.n_down,
                list(self.positional_embeddings.keys()),
                self_interaction=False,
            )
            edges = edge_factory(phys_conf)
            feats = [
                feature(edges[typ].single_array).swapaxes(0, 1).reshape(n_el, -1)
                for typ, feature in self.positional_embeddings.items()
            ]
            x = jnp.concatenate(feats, axis=1)
            if self.use_spin:
                spins = jnp.concatenate(
                    [jnp.ones(self.n_up), -jnp.ones(self.n_down)]
                )[:, None]
                x = jnp.concatenate([x, spins], axis=1)
            if self.project_to_embedding_dim:
                x = nn.Linear(self.embedding_dim, with_bias=False)(x)
        else:
            x = nn.Embed(
                self.n_elec_types, self.embedding_dim, name='electronic_embedding'
            )(self.elec_types)
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
            self.edge_mlp = nn.MLP(
                edge_dim,
                name='edge_mlp',
                hidden_layers=(edge_dim,),
                bias=True,
                last_linear=True,
                activation=jax.nn.silu,
                init='ferminet',
            )
        self.embed_mlp = nn.MLP(
            embedding_dim,
            name='embed_mlp',
            hidden_layers=(embedding_dim,),
            bias=True,
            last_linear=True,
            activation=jax.nn.silu,
            init='ferminet',
        )

    def __call__(self, phys_conf, nucleus_embedding):
        ne_features = self.edge_features(
            self.edge_factory(phys_conf)['ne'].single_array
        )
        if self.nuclear_charge_dependence == 'elementwise-product':
            ne_edges = (
                jax.nn.sigmoid(self.edge_linear(ne_features))
                * self.charge_linear(self.charge_embedding)[..., None, :]
            )
        else:
            if nucleus_embedding is None:
                nuc = self.charge_embedding
            else:
                nuc = jnp.tile(
                    nucleus_embedding[:, None, :], (1, self.n_up + self.n_down, 1)
                )
            ne_edges = self.edge_mlp(jnp.concatenate([ne_features, nuc], axis=-1))
        electron_features = ne_edges.sum(axis=0)
        if self.use_spin:
            spins = jnp.concatenate([jnp.ones(self.n_up), -jnp.ones(self.n_down)])[
                :, None
            ]
            electron_features = jnp.concatenate([electron_features, spins], axis=1)
        return self.embed_mlp(electron_features)
