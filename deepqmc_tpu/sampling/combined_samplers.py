"""Samplers combining electronic states, molecular geometries, and datasets.

Covers the roles of the reference's combined samplers
(/root/reference/src/deepqmc/sampling/combined_samplers.py) with a different
construction: both the electronic-state axis and the molecule-batch axis are
added by one generic :class:`AxisLiftedSampler` vmap combinator — the state
axis maps the per-state parameter stack while sharing the geometry, the
molecule axis maps geometries while sharing parameters.  Nuclear-geometry
moves (electron warp + re-equilibration) and the molecule-minibatch
scatter/gather live in :class:`MultiNuclearGeometrySampler` on top.
"""

import logging
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..types import KeyArray, Params, PhysicalConfiguration, SamplerState, Stats
from ..utils import better_where

log = logging.getLogger(__name__)


class IdleNucleiSampler:
    """The fixed-geometry nuclei "sampler": every move is zero.

    The one geometry strategy that ships (like the reference); anything
    implementing ``init(nuc_coords) -> state`` and ``sample(rng, state) ->
    (state, dR, stats)`` plugs into :class:`MultiNuclearGeometrySampler`.
    """

    def __init__(self, charges):
        del charges  # geometry moves would need them; staying put does not

    def init(self, nuc_coords: jax.Array, *args, **kwargs) -> SamplerState:
        return {'R': nuc_coords}

    def sample(self, rng: KeyArray, state: SamplerState):
        return state, jnp.zeros_like(state['R']), {}


def no_elec_warp(rng, R, dR, smpl_state: SamplerState) -> SamplerState:
    """Identity electron warp (electrons do not follow nuclear moves)."""
    return smpl_state


class MoleculeIdxSampler:
    """Host-side minibatching of molecule indices.

    Yields ``batch_size`` indices per :meth:`sample`, cycling through a
    permutation that is fixed (``shuffle=False``), drawn once
    (``shuffle='once'``) or redrawn every epoch (``shuffle='always'``).
    """

    def __init__(
        self,
        rng: KeyArray,
        n_mols: int,
        batch_size: int,
        shuffle: Union[bool, str] = False,
    ):
        assert shuffle in (False, 'once', 'always')
        self.n_mols = n_mols
        self.batch_size = batch_size
        self._rng = rng
        self._shuffle = shuffle
        self._queue: list[int] = []

    def _next_epoch(self) -> list[int]:
        order = np.arange(self.n_mols)
        if self._shuffle:
            rng_epoch = self._rng
            if self._shuffle == 'always':
                self._rng, rng_epoch = jax.random.split(self._rng)
            order = np.asarray(jax.random.permutation(rng_epoch, self.n_mols))
        return list(order)

    def sample(self) -> jax.Array:
        while len(self._queue) < self.batch_size:
            self._queue.extend(self._next_epoch())
        batch, self._queue = (
            self._queue[: self.batch_size],
            self._queue[self.batch_size :],
        )
        return jnp.asarray(batch)


class AxisLiftedSampler:
    """Lift an electron sampler over one leading batch axis with ``vmap``.

    ``mapped`` selects which of the sampler's inputs carry the new axis:
    ``'params'`` for the electronic-state axis (per-state parameter stacks,
    shared geometry), ``'R'`` for the molecule axis (per-geometry nuclear
    coordinates, shared parameters).  The per-slice RNG is always split.
    """

    def __init__(self, sampler, n_axis: int, mapped: str):
        assert mapped in ('params', 'R')
        self.sampler = sampler
        self.n_axis = n_axis
        self._axes = {
            'params': 0 if mapped == 'params' else None,
            'R': 0 if mapped == 'R' else None,
        }

    def init(
        self, rng: KeyArray, params: Params, electron_batch_size: int, R: jax.Array
    ) -> SamplerState:
        lifted = jax.vmap(
            self.sampler.init, (0, self._axes['params'], None, self._axes['R'])
        )
        return lifted(
            jax.random.split(rng, self.n_axis), params, electron_batch_size, R
        )

    def sample(self, rng: KeyArray, state: SamplerState, params: Params, R):
        lifted = jax.vmap(
            self.sampler.sample, (0, 0, self._axes['params'], self._axes['R'])
        )
        return lifted(jax.random.split(rng, self.n_axis), state, params, R)

    def update(self, state: SamplerState, params: Params, R):
        lifted = jax.vmap(
            self.sampler.update, (0, self._axes['params'], self._axes['R'])
        )
        return lifted(state, params, R)


class MultiElectronicStateSampler(AxisLiftedSampler):
    """Electronic-state axis: one walker population per state."""

    def __init__(self, sampler, n_state: int):
        super().__init__(sampler, n_state, mapped='params')


class MultiNuclearGeometrySampler:
    """Molecule-batch axis plus optional nuclear-geometry moves.

    State layout: ``{'nuc': ..., 'elec': ..., 'update_nuc_counter': ...}``
    with every leaf carrying the full molecule-dataset axis in front; each
    :meth:`sample` operates on (and scatters back) the ``mol_idxs`` slice.
    When ``update_nuc_period`` is set, the nuclei advance every period-th
    visit, the electrons are warped along and optionally re-equilibrated
    (reference combined_samplers.py:93-214).
    """

    def __init__(
        self,
        elec_sampler: MultiElectronicStateSampler,
        nuc_sampler,
        warp_elec_fn,
        update_nuc_period: Optional[int],
        elec_equilibration_steps: Optional[int],
    ):
        self.elec = AxisLiftedSampler(elec_sampler, 0, mapped='R')
        self.nuc_sampler = nuc_sampler
        self.warp_elec_fn = warp_elec_fn
        self.update_nuc_period = update_nuc_period
        self.elec_equilibration_steps = elec_equilibration_steps

    def init(self, rng, params, electron_batch_size, R):
        self.elec.n_axis = len(R)
        return {
            'nuc': jax.vmap(self.nuc_sampler.init)(R),
            'elec': self.elec.init(rng, params, electron_batch_size, R),
            'update_nuc_counter': jnp.zeros(len(R)),
        }

    # -- nuclear moves --------------------------------------------------------

    def _advance_nuclei(self, rng, slice_state, params):
        """One nuclear step on a minibatch slice: move, warp, re-equilibrate."""
        rng_nuc, rng_warp, rng_eq = jax.random.split(rng, 3)
        nuc, dR, stats = self.nuc_sampler.sample(rng_nuc, slice_state['nuc'])
        elec = self.warp_elec_fn(rng_warp, nuc['R'], dR, slice_state['elec'])
        elec = self.elec.sampler.update(elec, params, nuc['R'])
        if self.elec_equilibration_steps is not None:

            def eq_step(i, elec):
                rng_i = jax.random.fold_in(rng_eq, i)
                return self.elec.sampler.sample(rng_i, elec, params, nuc['R'])[0]

            elec = jax.lax.fori_loop(
                0, self.elec_equilibration_steps, eq_step, elec
            )
        return {**slice_state, 'nuc': nuc, 'elec': elec}, stats

    def _maybe_move_nuclei(
        self, rngs, full_state, slice_state, params, counter, mol_idxs
    ):
        """Advance nuclei on slice entries whose visit counter expired."""
        due = counter[mol_idxs] == self.update_nuc_period - 1
        moved = jax.lax.cond(
            jnp.any(due),
            jax.vmap(lambda r, s: self._advance_nuclei(r, s, params)[0]),
            lambda r, s: s,
            rngs,
            slice_state,
        )
        slice_state = jax.tree_util.tree_map(
            lambda new, old: better_where(due, new, old[mol_idxs]),
            moved,
            full_state,
        )
        counter = counter.at[mol_idxs].set(
            jnp.where(due, 0, counter[mol_idxs] + 1)
        )
        return slice_state, counter

    # -- sampler protocol ------------------------------------------------------

    def sample(
        self,
        rng: KeyArray,
        smpl_state: SamplerState,
        params: Params,
        mol_idxs: jax.Array,
    ) -> tuple[SamplerState, PhysicalConfiguration, Stats]:
        self.elec.n_axis = len(mol_idxs)
        rng_elec, rngs_nuc = jax.random.split(rng)
        smpl_state = dict(smpl_state)
        counter = smpl_state.pop('update_nuc_counter')
        slice_state = jax.tree_util.tree_map(lambda x: x[mol_idxs], smpl_state)
        if self.update_nuc_period is not None:
            slice_state, counter = self._maybe_move_nuclei(
                jax.random.split(rngs_nuc, len(mol_idxs)),
                smpl_state,
                slice_state,
                params,
                counter,
                mol_idxs,
            )
            smpl_state = jax.tree_util.tree_map(
                lambda full, part: full.at[mol_idxs].set(part),
                smpl_state,
                slice_state,
            )
        elec, phys_conf, stats = self.elec.sample(
            rng_elec, slice_state['elec'], params, slice_state['nuc']['R']
        )
        smpl_state = jax.tree_util.tree_map(
            lambda full, part: full.at[mol_idxs].set(part),
            smpl_state,
            {**slice_state, 'elec': elec},
        )
        smpl_state['update_nuc_counter'] = counter
        # stamp each walker with the dataset index of its geometry
        mol_idx_grid = jnp.broadcast_to(
            mol_idxs.reshape(-1, *(1,) * (len(phys_conf.batch_shape) - 1)),
            phys_conf.batch_shape,
        )
        return smpl_state, phys_conf.replace(mol_idx=mol_idx_grid), stats

    def update(self, smpl_state: SamplerState, params: Params) -> SamplerState:
        self.elec.n_axis = len(smpl_state['nuc']['R'])
        return {
            **smpl_state,
            'elec': self.elec.update(
                smpl_state['elec'], params, smpl_state['nuc']['R']
            ),
        }
