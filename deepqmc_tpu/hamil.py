"""Molecular Hamiltonian: system bookkeeping and the local-energy factory.

Reference: /root/reference/src/deepqmc/hamil.py:32-315.  The local-energy
closure mirrors the reference decomposition E_loc = E_kin + V_loc + V_nl +
V_el + E_nuc with E_kin = -1/2 (lap log|psi| + |grad log|psi||^2), but the
Laplacian operator is pluggable (``laplacian_factory``) and defaults to the
TPU forward-Laplacian engine at higher layers.
"""

import typing as t
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import physics, types
from .molecule import Molecule
from .physics import electronic_potential, nuclear_energy, pairwise_distance
from .types import KeyArray, Params, PhysicalConfiguration
from .utils import argmax_random_choice

__all__ = ['MolecularHamiltonian', 'LaplacianFactory']

_LapPair = tuple[jax.Array, jax.Array]


class LaplacianFactory(t.Protocol):
    """f -> (x -> (lap f(x), grad f(x))) factory (reference hamil.py:32-41)."""

    def __call__(
        self, f: t.Callable[[jax.Array], jax.Array]
    ) -> t.Callable[[jax.Array], _LapPair]: ...


def get_shell(z) -> int:
    """Number of (at least partially) occupied shells for ``z`` electrons.

    The first ``n`` shells hold ``sum_k 2 k^2 = n (n+1) (2n+1) / 3``
    electrons, so the answer is the smallest ``n`` whose capacity covers
    ``z``.
    """
    n = 0
    while n * (n + 1) * (2 * n + 1) // 3 < z:
        n += 1
    return n


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
        ecp_type: t.Optional[str] = None,
        ecp_mask: t.Optional[list[bool]] = None,
        elec_std: float = 1.0,
        laplacian_factory: t.Optional[LaplacianFactory] = None,
    ):
        if laplacian_factory is None:
            # TPU-first default: the single-pass forward Laplacian (the
            # reference defaults to 3N nested-autodiff passes, physics.py:104)
            from .fwdlap import forward_laplacian as laplacian_factory
        self.mol, self.elec_std, self.ecp_type = mol, elec_std, ecp_type
        self.laplacian = laplacian_factory

        # all bookkeeping below is host-side numpy on purpose: device ops in
        # a constructor cost one RPC dispatch each on a tunneled chip
        charges = np.asarray(mol.charges)
        self.n_nuc = len(charges)
        if ecp_type is None:
            mask = np.zeros(self.n_nuc, bool)
        elif ecp_mask is None:
            mask = charges > 2  # He core and lighter stay all-electron
        else:
            assert len(ecp_mask) == self.n_nuc, 'Incompatible shape of ecp_mask'
            mask = np.asarray(ecp_mask, bool)
        self.ecp_mask = mask

        if mask.any():
            from .ecp.gaussian_type_ecp import GaussianTypeECP

            self.potential = GaussianTypeECP(charges, ecp_type, mask)
        else:
            self.potential = physics.NuclearCoulombPotential(charges)
        self.ns_valence = self.potential.ns_valence

        n_elec = int(self.ns_valence.sum()) - mol.charge
        assert not (n_elec + mol.spin) % 2, 'n_elec and spin have different parity'
        assert n_elec > 1, 'The system must contain at least two active electrons.'
        self.n_up, self.n_down = (
            (n_elec + s * mol.spin) // 2 for s in (+1, -1)
        )
        self.mol_shells = [get_shell(z) for z in charges]
        self.mol_ecp_shells = [
            get_shell(core + 1) - 1 for core in charges - self.ns_valence
        ]

    # --- walker initialization ---------------------------------------------

    def init_sample(
        self, rng: KeyArray, R: jax.Array, n: int, elec_std: t.Optional[float] = None
    ) -> PhysicalConfiguration:
        """Heuristic initial electron positions for ``n`` walkers.

        Electrons are placed in normal clouds around nuclei, with integer
        electron counts per nucleus resolved by charge and spin heuristics
        (reference hamil.py:152-262).
        """
        assert R.ndim == 2
        R = jnp.asarray(R)  # callers may pass host-side (numpy) coordinates
        one_walker = lambda key: self.init_single_sample(key, R, elec_std)
        return jax.vmap(one_walker)(jax.random.split(rng, n))

    def init_single_sample(
        self, rng: KeyArray, R: jax.Array, elec_std: t.Optional[float]
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

    def local_energy(self, ansatz: types.ParametrizedWaveFunction) -> t.Callable[
        [t.Optional[KeyArray], Params, PhysicalConfiguration],
        tuple[types.Energy, types.Stats],
    ]:
        potential, ns_valence, lap_op = self.potential, self.ns_valence, self.laplacian

        def loc_ene(rng, params, phys_conf):
            wf = partial(ansatz, params)
            log_psi_flat = lambda x: wf(phys_conf.replace(r=x.reshape(-1, 3))).log
            lap, grad = lap_op(log_psi_flat)(phys_conf.r.flatten())
            force_sq = (grad * grad).sum(axis=-1)
            terms = {
                'E_kin': -0.5 * (lap + force_sq),
                'V_loc': potential.local_potential(phys_conf),
                'V_nl': potential.nonloc_potential(rng, phys_conf, wf),
                'V_el': electronic_potential(phys_conf),
            }
            E_loc = sum(terms.values()) + nuclear_energy(phys_conf, ns_valence)
            stats = {f'hamil/{k}': v for k, v in terms.items()}
            stats |= {'hamil/lap': lap, 'hamil/quantum_force': force_sq}
            return E_loc, stats

        return loc_ene

    def as_pyscf(self, *, coords: t.Optional[jax.Array] = None) -> dict[str, t.Any]:
        """System description in pyscf's ``gto.M`` keyword format."""
        mol = self.mol
        if coords is None:
            coords = mol.coords
        atoms = list(zip((int(z) for z in mol.charges), (xyz.tolist() for xyz in coords)))
        cores = {int(z): self.ecp_type for z in mol.charges[self.ecp_mask]}
        return dict(
            atom=atoms, unit='bohr', charge=mol.charge, spin=mol.spin, ecp=cores
        )
