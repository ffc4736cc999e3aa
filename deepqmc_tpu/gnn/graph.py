"""Graph containers and dense all-pairs edge builders.

Reference: /root/reference/src/deepqmc/gnn/graph.py.  Edges are dense
``[n_sender(, -1), n_receiver, feat]`` arrays — there is no sparsity/cutoff in
molecular-scale GNNs, and dense layouts are exactly what the TPU wants (static
shapes, contiguous tiles).  Self-edges are removed *structurally* (the sender
axis has length n-1, indexed via :func:`offdiagonal_sender_idx`) rather than
masked, so no wasted compute or NaN-breeding divisions by zero distance.
"""

import dataclasses
from collections import namedtuple

import jax
import jax.numpy as jnp

GraphNodes = namedtuple('GraphNodes', 'nuclei electrons')
Graph = namedtuple('Graph', 'nodes edges')

__all__ = [
    'GraphEdgeBuilder',
    'MolecularGraphEdgeBuilder',
    'GraphUpdate',
]


def offdiagonal_sender_idx(n_node: int) -> jax.Array:
    """[n-1, n] sender indices such that column r contains all nodes != r."""
    return (
        jnp.arange(n_node)[None, :] <= jnp.arange(n_node - 1)[:, None]
    ) + jnp.arange(n_node - 1)[:, None]


def compute_edges(pos_sender, pos_receiver, filter_diagonal: bool) -> jax.Array:
    diffs = pos_receiver[..., None, :, :] - pos_sender[..., None, :]
    if filter_diagonal:
        assert pos_sender.shape[-2] == pos_receiver.shape[-2]
        n_node = pos_sender.shape[-2]
        receiver_idx = jnp.broadcast_to(jnp.arange(n_node)[None], (n_node - 1, n_node))
        diffs = diffs[..., offdiagonal_sender_idx(n_node), receiver_idx, :]
    return diffs


def GraphEdgeBuilder(mask_self: bool):
    """Create a function computing dense difference-vector edges."""

    def build(pos_sender, pos_receiver):
        assert pos_sender.shape[-1] == 3 and pos_receiver.shape[-1] == 3
        assert pos_sender.ndim == 2
        assert not mask_self or pos_sender.shape[0] == pos_receiver.shape[0]
        return compute_edges(pos_sender, pos_receiver, mask_self)

    return build


class GraphEdges:
    """Interface of typed edge containers."""

    @property
    def single_array(self):
        """All edges flattened to one [n_edges, feat] array (KFAC-friendly)."""
        raise NotImplementedError

    def update_from_single_array(self, array):
        raise NotImplementedError

    def sum_senders(self, normalize=False):
        """Aggregate over the sender axis -> per-receiver features."""
        raise NotImplementedError

    def convolve(self, nodes, normalize=False):
        """Sender-node-weighted aggregation (PauliNet w*h convolution)."""
        raise NotImplementedError


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimpleGraphEdges(GraphEdges):
    edges: jax.Array

    @property
    def single_array(self):
        return self.edges

    def update_from_single_array(self, array):
        return self.__class__(array)

    def sum_senders(self, normalize=False):
        reducer = jnp.mean if normalize else jnp.sum
        return reducer(self.edges, axis=-3)

    def convolve(self, nodes, normalize=False):
        return self.__class__(self.edges * nodes[:, None]).sum_senders(normalize)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UpGraphEdges(SimpleGraphEdges):
    def convolve(self, nodes, normalize=False):
        n_up = self.edges.shape[-3]
        return self.__class__(self.edges * nodes[:n_up, None]).sum_senders(normalize)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DownGraphEdges(SimpleGraphEdges):
    def convolve(self, nodes, normalize=False):
        n_down = self.edges.shape[-3]
        return self.__class__(self.edges * nodes[-n_down:, None]).sum_senders(
            normalize
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SameGraphEdges(GraphEdges):
    """uu and dd edge blocks of same-spin electron pairs."""

    uu: jax.Array
    dd: jax.Array

    @property
    def single_array(self):
        batch = self.uu.shape[:-3]
        flat = lambda x: x.reshape(*batch, -1, x.shape[-1])
        return jnp.concatenate([flat(self.uu), flat(self.dd)], axis=-2)

    def update_from_single_array(self, array):
        n_up, n_down = self.uu.shape[-2], self.dd.shape[-2]
        s_up, s_down = self.uu.shape[-3], self.dd.shape[-3]
        uu, dd = jnp.split(array, (n_up * s_up,), axis=-2)
        uu = uu.reshape(*uu.shape[:-2], s_up, n_up, uu.shape[-1])
        dd = dd.reshape(*dd.shape[:-2], s_down, n_down, dd.shape[-1])
        return self.__class__(uu, dd)

    def sum_senders(self, normalize=False):
        div = lambda x: max(x.shape[-3], 1) if normalize else 1
        up = self.uu.sum(axis=-3) / div(self.uu)
        down = self.dd.sum(axis=-3) / div(self.dd)
        return jnp.concatenate([up, down], axis=-2)

    def convolve(self, nodes, normalize=False):
        n_up = self.uu.shape[-2]
        self_interaction = self.uu.shape[-3] == n_up
        if self_interaction:
            up_idx = (slice(None, n_up), None)
            down_idx = (slice(n_up, None), None)
        else:
            up_idx = offdiagonal_sender_idx(n_up)
            down_idx = n_up + offdiagonal_sender_idx(self.dd.shape[-2])
        uu = self.uu * nodes[up_idx]
        dd = self.dd * nodes[down_idx]
        return self.__class__(uu, dd).sum_senders(normalize)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AntiGraphEdges(GraphEdges):
    """du (down->up) and ud (up->down) opposite-spin edge blocks."""

    du: jax.Array
    ud: jax.Array

    @property
    def single_array(self):
        batch = self.du.shape[:-3]
        flat = lambda x: x.reshape(*batch, -1, x.shape[-1])
        return jnp.concatenate([flat(self.du), flat(self.ud)], axis=-2)

    def update_from_single_array(self, array):
        n_up, n_down = self.du.shape[-2], self.ud.shape[-2]
        du, ud = jnp.split(array, (n_up * n_down,), axis=-2)
        du = du.reshape(*du.shape[:-2], n_down, n_up, du.shape[-1])
        ud = ud.reshape(*ud.shape[:-2], n_up, n_down, ud.shape[-1])
        return self.__class__(du, ud)

    def sum_senders(self, normalize=False):
        div = lambda x: max(x.shape[-3], 1) if normalize else 1
        up = self.du.sum(axis=-3) / div(self.du)
        down = self.ud.sum(axis=-3) / div(self.ud)
        return jnp.concatenate([up, down], axis=-2)

    def convolve(self, nodes, normalize=False):
        n_up = self.du.shape[-2]
        du = self.du * nodes[n_up:, None]
        ud = self.ud * nodes[:n_up, None]
        return self.__class__(du, ud).sum_senders(normalize)


def MolecularGraphEdgeBuilder(n_nuc, n_up, n_down, edge_types, *, self_interaction):
    """Build the requested typed edges of the electrons+nuclei graph.

    Edge types: 'nn', 'ne', 'en', 'same', 'anti', 'up', 'down'
    (reference graph.py:68-160).
    """
    mask_self_of = {
        'nn': not self_interaction,
        'uu': not self_interaction,
        'dd': not self_interaction,
        'ne': False,
        'en': False,
        'ud': False,
        'du': False,
        'up': False,
        'down': False,
    }

    def edges(kind, pos_s, pos_r):
        return GraphEdgeBuilder(mask_self_of[kind])(pos_s, pos_r)

    build_rules = {
        'nn': lambda pc: SimpleGraphEdges(edges('nn', pc.R, pc.R)),
        'ne': lambda pc: SimpleGraphEdges(edges('ne', pc.R, pc.r)),
        'en': lambda pc: SimpleGraphEdges(edges('en', pc.r, pc.R)),
        'same': lambda pc: SameGraphEdges(
            edges('uu', pc.r[:n_up], pc.r[:n_up]),
            edges('dd', pc.r[n_up:], pc.r[n_up:]),
        ),
        'anti': lambda pc: AntiGraphEdges(
            edges('du', pc.r[n_up:], pc.r[:n_up]),
            edges('ud', pc.r[:n_up], pc.r[n_up:]),
        ),
        'up': lambda pc: UpGraphEdges(edges('up', pc.r[:n_up], pc.r)),
        'down': lambda pc: DownGraphEdges(edges('down', pc.r[n_up:], pc.r)),
    }

    def build(phys_conf):
        assert phys_conf.r.shape[0] == n_up + n_down
        return {typ: build_rules[typ](phys_conf) for typ in edge_types}

    return build


def GraphUpdate(
    aggregate_edges_for_nodes_fn, update_nodes_fn=None, update_edges_fn=None
):
    """One message-passing step: aggregate -> update nodes -> update edges."""

    def update_graph(graph):
        nodes, edges = graph
        if update_nodes_fn:
            aggregated = aggregate_edges_for_nodes_fn(nodes, edges)
            nodes = update_nodes_fn(nodes, aggregated)
        if update_edges_fn:
            edges = update_edges_fn(edges)
        return Graph(nodes, edges)

    return update_graph
