"""Sampler composition, force regularization, equilibration, initialization.

Reference: /root/reference/src/deepqmc/sampling/sampling_utils.py.  The jitted
equilibration drive replaces the reference's per-step ``pmap`` dispatch
(sampling_utils.py:104-131): one compiled sampling step, host-side early
stopping on the pairwise-distance criterion.
"""

from collections.abc import Callable, Iterable
from functools import reduce
from statistics import mean, stdev
from typing import Optional

import jax
import jax.numpy as jnp

from ..hamil import MolecularHamiltonian
from ..molecule import Molecule
from ..parallel import rng_iterator, shard_walkers
from ..physics import pairwise_diffs
from ..types import Ansatz, KeyArray, Params, PhysicalConfiguration, SamplerState
from .combined_samplers import (
    IdleNucleiSampler,
    MoleculeIdxSampler,
    MultiElectronicStateSampler,
    MultiNuclearGeometrySampler,
    no_elec_warp,
)

__all__ = ['chain', 'combine_samplers']


def chain(*samplers):
    """Compose wrapper samplers around a base electron sampler.

    ``chain(DecorrSampler(length=20), metropolis)`` samples every 20th MCMC
    step.  Equivalent surface to the reference's dynamic-MRO ``chain``
    (sampling_utils.py:31-56) but via explicit wrapping.
    """
    *wrappers, base = samplers
    return reduce(lambda inner, w: w.wrap(inner), reversed(wrappers), base)


def combine_samplers(samplers, hamil: MolecularHamiltonian, wf) -> object:
    """Instantiate the base sampler with (hamil, wf) and chain the wrappers."""
    return chain(*samplers[:-1], samplers[-1](hamil=hamil, wf=wf))


def _unit(v, eps=None):
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / (norm if eps is None else jnp.clip(norm, eps, None))


def diffs_to_nearest_nuc(r: jax.Array, coords: jax.Array):
    """Displacement (+squared distance) from each electron to its closest
    nucleus, and that nucleus' index."""
    disp = pairwise_diffs(r, coords)
    nearest = jnp.argmin(disp[..., -1], axis=-1)
    return disp[jnp.arange(len(r)), nearest], nearest


def crossover_parameter(disp, force, charge):
    """Smart-MC crossover weight a(r): ~1 along the force direction far from
    a nucleus, falling towards the nucleus (Umrigar regularization)."""
    toward_nuc, dist2 = disp[..., :3], disp[..., 3]
    eps = jnp.finfo(force.dtype).eps
    alignment = jnp.sum(_unit(force, eps) * _unit(toward_nuc), axis=-1)
    zeta = charge**2 * dist2
    return (1 + alignment) / 2 + zeta / (10 * (4 + zeta))


def clean_force(force, phys_conf: PhysicalConfiguration, mol: Molecule, *, tau):
    """Regularize the quantum force for MALA proposals (reference
    sampling_utils.py:79-101): crossover damping of large forces, then a cap
    so one drift step never overshoots the nearest nucleus."""
    disp, nearest = jax.vmap(diffs_to_nearest_nuc)(phys_conf.r, phys_conf.R)
    a = crossover_parameter(disp, force, jnp.asarray(mol.charges)[nearest])
    av2tau = a * jnp.sum(force**2, axis=-1) * tau
    damped = (2 / (jnp.sqrt(1 + 2 * av2tau) + 1))[..., None] * force
    eps = jnp.finfo(phys_conf.r.dtype).eps
    drift_len = tau * jnp.clip(jnp.linalg.norm(damped, axis=-1), eps, None)
    cap = jnp.minimum(1.0, jnp.sqrt(disp[..., -1]) / drift_len)
    return damped * cap[..., None]


def equilibrate(
    rng: KeyArray,
    params: Params,
    molecule_idx_sampler: MoleculeIdxSampler,
    sampler: MultiNuclearGeometrySampler,
    state: SamplerState,
    criterion: Callable[[PhysicalConfiguration], jax.Array],
    steps: Iterable[int],
    *,
    block_size: int,
    n_blocks: int = 5,
    allow_early_stopping: bool = True,
):
    """Drive the sampler until the criterion time series stabilizes.

    Yields ``(step, state, mol_idxs, stats)``; one jitted sampling step.
    """
    from ..utils import sampling_precision_ctx

    def _sample(*args):
        with sampling_precision_ctx():
            return sampler.sample(*args)

    sample_wf = jax.jit(_sample)

    def stabilized(series: list[float]) -> bool:
        # equilibrated once the oldest and newest block of the criterion
        # series agree to within either block's own scatter
        head, tail = series[:block_size], series[-block_size:]
        return abs(mean(head) - mean(tail)) < min(stdev(head), stdev(tail))

    window = block_size * n_blocks
    series: list[float] = []
    # second guard: the |psi|-distribution itself.  The geometric criterion
    # (mean pairwise distance) can stabilize while the walker ensemble is
    # still migrating out of a fat low-|psi| tail — the documented +420 mHa
    # evaluation artifact (docs/evidence/accuracy_notes.md) — so early
    # stopping also requires the walker log|psi| SPREAD series to stabilize.
    psi_series: list[float] = []
    for step, rng_step in zip(steps, rng_iterator(rng)):
        mol_idxs = molecule_idx_sampler.sample()
        state, phys_conf, stats = sample_wf(rng_step, state, params, mol_idxs)
        yield step, state, mol_idxs, stats
        if allow_early_stopping:
            series = [*series[-window + 1 :], criterion(phys_conf).item()]
            spread = stats.get('sampling/log_psi/std')
            if spread is not None:
                psi_series = [
                    *psi_series[-window + 1 :],
                    jnp.asarray(spread).mean().item(),
                ]
            # a sampler may emit the log-psi-spread stat only intermittently:
            # require a FULL spread window before consulting it (a short
            # series would make head/tail blocks overlap — trivially stable —
            # and a 1-element series would crash stdev), mirroring the
            # full-window requirement on the geometric series
            if (
                len(series) == window
                and stabilized(series)
                and (not psi_series or
                     (len(psi_series) == window and stabilized(psi_series)))
            ):
                break


def initialize_sampling(
    rng: KeyArray,
    hamil: MolecularHamiltonian,
    ansatz: Ansatz,
    mols: list[Molecule],
    electronic_states: int,
    molecule_batch_size: int,
    *,
    elec_sampler,
    nuc_sampler=None,
    elec_warp_fn: Optional[Callable] = None,
    update_nuc_period: Optional[int] = None,
    elec_equilibration_steps: Optional[int] = None,
) -> tuple[MoleculeIdxSampler, MultiNuclearGeometrySampler]:
    """Wire electron/nuclei samplers into the combined hierarchy."""
    molecule_idx_sampler = MoleculeIdxSampler(
        rng, len(mols), molecule_batch_size, 'once'
    )
    elec_sampler = elec_sampler(hamil=hamil, wf=ansatz.apply)
    multi_state = MultiElectronicStateSampler(elec_sampler, electronic_states)
    nuc_sampler = (IdleNucleiSampler if nuc_sampler is None else nuc_sampler)(
        hamil.mol.charges
    )
    sampler = MultiNuclearGeometrySampler(
        multi_state,
        nuc_sampler,
        no_elec_warp if elec_warp_fn is None else elec_warp_fn,
        update_nuc_period,
        elec_equilibration_steps,
    )
    return molecule_idx_sampler, sampler


def initialize_sampler_state(
    rng: KeyArray, sampler, params: Params, electron_batch_size: int, mols
) -> SamplerState:
    """Initialize the global sampler state, sharded over the walker axis.

    The reference pmaps this with a per-device batch slice
    (sampling_utils.py:169-179); here the state is one global array batch
    ``[mol, state, walker, ...]`` with the walker axis sharded on the mesh.
    """
    state = jax.jit(sampler.init, static_argnums=2)(
        rng,
        params,
        electron_batch_size,
        jnp.stack([mol.coords for mol in mols]),
    )
    return shard_walkers(state)
