"""Molecular Hamiltonian: system bookkeeping and the local-energy factory.

Reference: /root/reference/src/deepqmc/hamil.py:32-315.  The local-energy
closure mirrors the reference decomposition E_loc = E_kin + V_loc + V_nl +
V_el + E_nuc with E_kin = -1/2 (lap log|psi| + |grad log|psi||^2), but the
Laplacian operator is pluggable (``laplacian_factory``) and defaults to the
TPU forward-Laplacian engine at higher layers.
"""

from collections.abc import Callable
from functools import partial
from itertools import count
from typing import Any, Optional, Protocol

import jax
import jax.numpy as jnp

from .molecule import Molecule
from .physics import (
    NuclearCoulombPotential,
    electronic_potential,
    loop_laplacian,
    nuclear_energy,
    pairwise_distance,
)
from .types import (
    Energy,
    KeyArray,
    ParametrizedWaveFunction,
    Params,
    PhysicalConfiguration,
    Stats,
)
from .utils import argmax_random_choice

__all__ = ['MolecularHamiltonian', 'LaplacianFactory']


class LaplacianFactory(Protocol):
    """f -> (x -> (lap f(x), grad f(x))) factory (reference hamil.py:32-41)."""

    def __call__(
        self, f: Callable[[jax.Array], jax.Array]
    ) -> Callable[[jax.Array], tuple[jax.Array, jax.Array]]: ...


def get_shell(z) -> int:
    """Number of (at least partially) occupied shells for ``z`` electrons."""
    max_elec = 0
    for n in count():
        if z <= max_elec:
            return n
        max_elec += 2 * (1 + n) ** 2


class MolecularHamiltonian:
    """Hamiltonian of a non-relativistic molecular system.

    Args:
        mol: the molecule.
        ecp_type: if set ('bfd' or 'ccECP'), use effective core potentials.
        ecp_mask: per-nucleus booleans selecting ECP treatment; defaults to
            all nuclei with Z > 2 when ``ecp_type`` is given.
        elec_std: scaling of the initial electron spread around nuclei.
        laplacian_factory: operator used for the kinetic energy.
    """

    def __init__(
        self,
        *,
        mol: Molecule,
        ecp_type: Optional[str] = None,
        ecp_mask: Optional[list[bool]] = None,
        elec_std: float = 1.0,
        laplacian_factory: Optional[LaplacianFactory] = None,
    ):
        if laplacian_factory is None:
            # TPU-first default: the single-pass forward Laplacian (the
            # reference defaults to 3N nested-autodiff passes, physics.py:104)
            from .fwdlap import forward_laplacian

            laplacian_factory = forward_laplacian
        self.mol = mol
        self.elec_std = elec_std
        self.ecp_type = ecp_type

        if ecp_type is None:
            ecp_mask = [False] * len(mol.charges)
        elif ecp_mask is None:
            ecp_mask = [bool(z) for z in (mol.charges > 2)]
        assert len(ecp_mask) == len(mol.charges), 'Incompatible shape of ecp_mask'
        self.ecp_mask = jnp.asarray(ecp_mask)

        self.laplacian = laplacian_factory
        if self.ecp_mask.any():
            from .ecp.gaussian_type_ecp import GaussianTypeECP

            self.potential = GaussianTypeECP(mol.charges, ecp_type, self.ecp_mask)
        else:
            self.potential = NuclearCoulombPotential(mol.charges)

        n_elec = int(sum(self.potential.ns_valence) - mol.charge)
        assert not (n_elec + mol.spin) % 2, 'n_elec and spin have different parity'
        assert n_elec > 1, 'The system must contain at least two active electrons.'

        self.n_nuc = len(mol.charges)
        self.n_up = (n_elec + mol.spin) // 2
        self.n_down = (n_elec - mol.spin) // 2
        self.ns_valence = self.potential.ns_valence
        self.mol_shells = [get_shell(z) for z in self.mol.charges]
        self.mol_ecp_shells = [
            get_shell(z + 1) - 1 for z in self.mol.charges - self.ns_valence
        ]

    # --- walker initialization ---------------------------------------------

    def init_sample(
        self, rng: KeyArray, R: jax.Array, n: int, elec_std: Optional[float] = None
    ) -> PhysicalConfiguration:
        """Heuristic initial electron positions for ``n`` walkers.

        Electrons are placed in normal clouds around nuclei, with integer
        electron counts per nucleus resolved by charge and spin heuristics
        (reference hamil.py:152-262).
        """
        assert R.ndim == 2
        Rs = jnp.tile(R[None], (n, 1, 1))
        return jax.vmap(self.init_single_sample, (0, 0, None))(
            jax.random.split(rng, n), Rs, elec_std
        )

    def init_single_sample(
        self, rng: KeyArray, R: jax.Array, elec_std: Optional[float]
    ) -> PhysicalConfiguration:
        """One walker: nucleus-seat assignment, then Gaussian clouds.

        The statistical behavior (seat counts, spin alternation, RNG draw
        order) reproduces the reference heuristic (hamil.py:182-262) — pinned
        bitwise by tests/test_reference_parity.py — but is organized as three
        closed steps: integer seats per nucleus, per-atom spin split, and the
        seat -> electron scatter via searchsorted.
        """
        rng_seat, rng_cloud, rng_spin = jax.random.split(rng, 3)
        seats = self._seat_electrons(rng_seat)
        up, down = self.distribute_spins(rng_spin, R, seats)
        # seat counts -> per-electron nucleus index: electron i of a spin
        # channel sits at the first nucleus whose cumulative seat count
        # exceeds i (searchsorted-right over the cumsum staircase)
        nuc_idx = jnp.concatenate(
            [
                jnp.searchsorted(
                    jnp.cumsum(counts), jnp.arange(n), side='right'
                )
                for counts, n in ((up, self.n_up), (down, self.n_down))
            ]
        )
        width = (elec_std or self.elec_std) * jnp.sqrt(self.mol.charges)[nuc_idx]
        r = R[nuc_idx] + width[:, None] * jax.random.normal(
            rng_cloud, (len(nuc_idx), 3)
        )
        return PhysicalConfiguration(R, r, jnp.array(0))

    def _seat_electrons(self, rng: KeyArray) -> jax.Array:
        """Integer electron count per nucleus.

        Start from the floor of the charge-adjusted valence and hand out the
        fractional remainder one electron at a time, sampled toward the atoms
        with the largest deficit (categorical over valence - count logits).
        """
        valence = self.ns_valence - self.mol.charge / self.n_nuc
        n_elec = self.n_up + self.n_down

        def hand_out_one(carry):
            rng, counts = carry
            rng, rng_draw = jax.random.split(rng)
            atom = jax.random.categorical(rng_draw, valence - counts, shape=())
            return rng, counts.at[atom].add(1)

        _, seats = jax.lax.while_loop(
            lambda c: c[1].sum() < n_elec,
            hand_out_one,
            (rng, jnp.floor(valence).astype(jnp.int32)),
        )
        return seats

    def distribute_spins(
        self, rng: KeyArray, R: jax.Array, elec_of_atom: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Per-atom (up, down) seat counts from total seats per atom.

        Two phases, both expressed as fixed-length masked scans (statically
        bounded by the electron count, so they stay shape-stable under jit):

        1. *pairing* — seat whole up/down pairs level by level (level i
           pairs every atom holding >= 2(i+1) electrons), skipping levels
           that would overshoot the global down-spin budget;
        2. *bond walk* — seat the leftover unpaired electrons one at a time
           with alternating spin, hopping from the current atom to its
           nearest neighbor that still has open seats, which clusters
           opposite spins on bonded atom pairs.
        """
        n_elec = self.n_up + self.n_down

        # phase 1: level i exists iff some atom still has a 2(i+1)-th seat;
        # a level is skipped when seating it would exceed the down budget
        levels = 2 * (1 + jnp.arange(n_elec // 2 + 1))
        level_masks = elec_of_atom[None, :] >= levels[:, None]

        def seat_level(n_down_so_far, mask):
            fits = mask.sum() + n_down_so_far <= self.n_down
            inc = jnp.where(mask & fits, 1, 0)
            return n_down_so_far + inc.sum(), inc

        _, incs = jax.lax.scan(seat_level, jnp.array(0), level_masks)
        pairs = incs.sum(axis=0)
        up = down = pairs

        # phase 2: walk the nearest-neighbor graph placing leftovers
        dists = pairwise_distance(R, R).at[jnp.diag_indices(len(R))].set(jnp.inf)
        neighbor_order = jnp.argsort(dists)
        start = argmax_random_choice(rng, elec_of_atom - up - down)

        def place_leftover(carry, parity):
            site, up, down = carry
            open_seats = elec_of_atom - up - down
            active = (open_seats > 0).any()
            spin_down = parity & (down.sum() < self.n_down) & active
            up = up.at[site].add(jnp.where(active, 1 - spin_down, 0))
            down = down.at[site].add(jnp.where(active, spin_down, 0))
            by_proximity = neighbor_order[site]
            still_open = (elec_of_atom - up - down)[by_proximity] > 0
            site = jnp.where(
                active, by_proximity[jnp.argmax(still_open)], site
            )
            return (site, up, down), None

        (_, up, down), _ = jax.lax.scan(
            place_leftover, (start, up, down), jnp.arange(n_elec) % 2
        )
        return up, down

    # --- local energy -------------------------------------------------------

    def local_energy(self, ansatz: ParametrizedWaveFunction) -> Callable[
        [Optional[KeyArray], Params, PhysicalConfiguration],
        tuple[Energy, Stats],
    ]:
        def loc_ene(
            rng: Optional[KeyArray], params: Params, phys_conf: PhysicalConfiguration
        ) -> tuple[Energy, Stats]:
            wf = partial(ansatz, params)

            def log_psi_of_flat_r(r_flat: jax.Array) -> jax.Array:
                return wf(phys_conf.replace(r=r_flat.reshape(-1, 3))).log

            lap_log_psi, grad_log_psi = self.laplacian(log_psi_of_flat_r)(
                phys_conf.r.flatten()
            )
            quantum_force_sq = (grad_log_psi**2).sum(axis=-1)
            E_kin = -0.5 * (lap_log_psi + quantum_force_sq)
            E_nuc = nuclear_energy(phys_conf, self.ns_valence)
            V_el = electronic_potential(phys_conf)
            V_loc = self.potential.local_potential(phys_conf)
            V_nl = self.potential.nonloc_potential(rng, phys_conf, wf)
            E_loc = E_kin + V_loc + V_nl + V_el + E_nuc
            stats = {
                'hamil/V_el': V_el,
                'hamil/E_kin': E_kin,
                'hamil/V_loc': V_loc,
                'hamil/V_nl': V_nl,
                'hamil/lap': lap_log_psi,
                'hamil/quantum_force': quantum_force_sq,
            }
            return E_loc, stats

        return loc_ene

    def as_pyscf(self, *, coords: Optional[jax.Array] = None) -> dict[str, Any]:
        """System description in pyscf's ``gto.M`` keyword format."""
        coords = coords if coords is not None else self.mol.coords
        return {
            'atom': [(int(c), r.tolist()) for c, r in zip(self.mol.charges, coords)],
            'charge': self.mol.charge,
            'spin': self.mol.spin,
            'ecp': {int(c): self.ecp_type for c in self.mol.charges[self.ecp_mask]},
            'unit': 'bohr',
        }
