"""OmniNet: GNN + Jastrow + Backflow (+ nuclear parameter head).

Reference: /root/reference/src/deepqmc/wf/omni.py.
"""

import math
from typing import Optional

import jax.numpy as jnp

from .. import nn
from ..utils import unflatten

__all__ = ()


class Jastrow(nn.Module):
    """Deep Jastrow factor from electron embeddings.

    ``sum_first`` pools embeddings before the MLP (one network evaluation);
    otherwise the MLP output is summed per electron (mean-field-like).
    """

    def __init__(self, *, sum_first, subnet_factory, name: Optional[str] = 'Jastrow'):
        super().__init__(name=name)
        self.net = subnet_factory(1)
        self.sum_first = sum_first

    def __call__(self, xs):
        if self.sum_first:
            out = self.net(xs.sum(axis=-2))
        else:
            out = self.net(xs).sum(axis=-2)
        return out.squeeze(axis=-1)


class Backflow(nn.Module):
    """Per-orbital x determinant backflow factors from electron embeddings."""

    def __init__(
        self,
        n_orbitals,
        n_determinants,
        n_backflows,
        spin,
        multi_head=True,
        *,
        subnet_factory,
        name: Optional[str] = 'Backflow',
    ):
        super().__init__(name=name)
        self.multi_head = multi_head
        self.n_orbitals = n_orbitals
        self.n_determinants = n_determinants
        self.spin = spin
        if multi_head:
            self.nets = [
                subnet_factory(n_orbitals * n_determinants) for _ in range(n_backflows)
            ]
        else:
            self.net = subnet_factory(n_backflows * n_orbitals * n_determinants)

    def __call__(self, xs):
        """[n_backflow, n_elec, n_det * n_orbitals] backflow factors.

        The determinant axis stays flattened into the (det-major) column
        axis — the layout the whole determinant channel runs in (see
        ops/slogdet.py ``slogdet_flat``); the subnet's output columns are
        already ordered that way.
        """
        if self.multi_head:
            return jnp.stack([net(xs) for net in self.nets], axis=-3)
        xs = self.net(xs)
        xs = unflatten(xs, -1, (-1, self.n_orbitals * self.n_determinants))
        return xs.swapaxes(-2, -3)


class NuclearGNNHead(nn.Module):
    """Predicts per-nucleus envelope parameters from nucleus embeddings
    via GLU readouts (reference omni.py:170-200)."""

    def __init__(self, *, one_particle_parameters, name: Optional[str] = None):
        super().__init__(name=name)
        self.one_particle_parameters = one_particle_parameters

    def _readout(self, key, spin, per_nucleus_shape, embedding):
        glu_out = nn.GLU(math.prod(per_nucleus_shape), name=f'{key}_readout_glu')(
            embedding, embedding
        ).reshape(-1, *per_nucleus_shape)
        bias = nn.get_param(
            f'{key}_bias_{spin}', glu_out.shape, nn.constant_init(2.0)
        )
        return glu_out + bias

    def __call__(self, nucleus_embeddings):
        return {
            f'{k}_{spin}': self._readout(k, spin, shape, nucleus_embeddings)
            for k, shape in self.one_particle_parameters.items()
            for spin in ('up', 'down')
        }


class OmniNet(nn.Module):
    """Runs the GNN once and feeds its embeddings to Jastrow/Backflow heads.

    Reference: omni.py:92-167.  ``n_orb_up``/``n_orb_down`` equal the spin
    electron counts, or the total electron count for full determinants.
    """

    def __init__(
        self,
        hamil,
        n_orb_up,
        n_orb_down,
        n_determinants,
        n_backflows,
        *,
        embedding_dim,
        gnn_factory,
        jastrow_factory,
        backflow_factory,
        nuclear_gnn_head=None,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.n_up = hamil.n_up
        self.gnn = gnn_factory(hamil, embedding_dim) if gnn_factory else None
        self.jastrow = jastrow_factory() if jastrow_factory else None
        self.backflow = (
            {
                spin: backflow_factory(n_orb, n_determinants, n_backflows, spin)
                for spin, n_orb in zip(('up', 'down'), (n_orb_up, n_orb_down))
            }
            if backflow_factory
            else None
        )
        self.nuclear_gnn_head = nuclear_gnn_head() if nuclear_gnn_head else None

    def __call__(self, phys_conf):
        if not self.gnn:
            return None, None, None
        graph_nodes = self.gnn(phys_conf)
        embeddings = graph_nodes.electrons
        nuc_params = (
            self.nuclear_gnn_head(graph_nodes.nuclei)
            if self.nuclear_gnn_head
            else None
        )
        jastrow = self.jastrow(embeddings) if self.jastrow else None
        backflow = (
            (
                self.backflow['up'](embeddings[: self.n_up]),
                self.backflow['down'](embeddings[self.n_up :]),
            )
            if self.backflow
            else None
        )
        return jastrow, backflow, nuc_params
