"""Observable monitors evaluated during training/evaluation.

Feature parity: /root/reference/src/deepqmc/observable.py (monitor zoo:
energy, wave function, spin, psi ratios, positions, oscillator strength,
five Hellmann-Feynman force estimators).  The design differs from the
reference: instead of one pmap dispatch per monitor subclass, every monitor
here is a declarative :class:`MonitorSpec` — a batch-level sample function
plus a stats reducer — executed by a single generic jitted runner over the
globally sharded ``[mol, state, walker]`` batch.  Per-sample observables
(spin, forces) are vmapped once over the flattened walker grid rather than
through three nested vmaps, which keeps a single large batch dimension for
the TPU.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .parallel import (
    all_device_max,
    all_device_mean,
    all_device_min,
    all_device_std,
)
from .physics import evaluate_spin
from .types import (
    Energy,
    ParametrizedWaveFunction,
    Params,
    PhysicalConfiguration,
    Psi,
    Stats,
)

__all__ = ['default_observable_monitors', 'EnergyMonitor', 'WaveFunctionMonitor']


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Batch:
    """Everything a monitor may look at after one optimization step."""

    params: Params
    phys_conf: PhysicalConfiguration
    psi: Psi
    local_energy: Energy
    psi_ratios: Optional[jax.Array]

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return self.local_energy.shape  # (mol, state, walker)


@dataclass(frozen=True)
class MonitorSpec:
    """A named observable: batch-level sampler + optional stats reducer."""

    name: str
    sample: Callable[[Batch], Any]
    stats: Optional[Callable[[Batch, Any], Stats]] = None


def grid_vmap(fn: Callable, batch: Batch, *extra_cols) -> jax.Array:
    """Map a per-walker function over the (mol, state, walker) grid.

    ``fn(params, phys_conf, *cols)`` is evaluated once per walker against the
    parameters of that walker's electronic state (``batch.params`` carries a
    leading state axis, wf/base.py init_wf_params): the mol and walker axes
    are collapsed into ONE large batch axis per state (one inner vmap, MXU-
    friendly), and an outer vmap pairs each state's walkers with its own
    parameter slice.  Grid axes are restored on the output.
    """
    m, s, w = batch.grid_shape

    def state_major(x):
        # (mol, state, walker, ...) -> (state, mol*walker, ...)
        return x.swapaxes(0, 1).reshape(s, m * w, *x.shape[3:])

    flat_conf = jax.tree_util.tree_map(state_major, batch.phys_conf)
    cols = tuple(
        state_major(jnp.broadcast_to(c, (m, s, w) + c.shape[3:]))
        for c in extra_cols
    )
    per_state = jax.vmap(fn, (None, 0) + (0,) * len(cols))
    out = jax.vmap(per_state)(batch.params, flat_conf, *cols)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(s, m, w, *x.shape[2:]).swapaxes(0, 1), out
    )


def walker_moments(name: str, samples: jax.Array, axis: int = -1) -> Stats:
    """Per-(mol, state) mean/std over the walker axis of a sample array."""
    return {
        f'{name}/mean': jnp.mean(samples, axis),
        f'{name}/std': jnp.std(samples, axis),
    }


# kept under the reference's name for code written against it
compute_mean_and_std = walker_moments


class ObservableMonitor:
    """Generic periodic runner of one :class:`MonitorSpec`.

    Subclasses (the config surface) only provide :meth:`spec`; evaluation,
    jitting, periodicity, and sample recording are handled here.
    """

    name: str

    def __init__(self, save_samples: bool, period: int):
        assert period > 0
        self.save_samples = save_samples
        self.period = period
        self._spec: Optional[MonitorSpec] = None
        self._jitted = None

    # --- subclass hooks ---------------------------------------------------

    def spec(self, hamil, wf: ParametrizedWaveFunction) -> MonitorSpec:
        raise NotImplementedError

    # --- engine -----------------------------------------------------------

    def finalize(self, hamil, wf: ParametrizedWaveFunction) -> 'ObservableMonitor':
        self._spec = self.spec(hamil, wf)
        return self

    def _evaluate(self, batch: Batch) -> tuple[Any, Stats]:
        spec = self._spec
        assert spec is not None, 'call ObservableMonitor.finalize first'
        samples = spec.sample(batch)
        stats = spec.stats(batch, samples) if spec.stats else {}
        return samples, stats

    def __call__(
        self,
        step: int,
        params: Params,
        phys_conf: PhysicalConfiguration,
        psi: Psi,
        local_energy: jax.Array,
        psi_ratios: Optional[jax.Array],
    ) -> Stats:
        if step % self.period:
            return {}
        if self._jitted is None:
            self._jitted = jax.jit(self._evaluate)
        samples, stats = self._jitted(
            Batch(params, phys_conf, psi, local_energy, psi_ratios)
        )
        if self.save_samples and samples is not None:
            stats |= {f'{self._spec.name}/samples': samples}
        return stats


def _per_walker_spec(name: str, fn_factory, with_energy: bool = False) -> Callable:
    """Spec for an observable evaluated one walker at a time."""

    def build(self, hamil, wf) -> MonitorSpec:
        fn = fn_factory(hamil, wf)

        if with_energy:
            # fn also sees (E_loc, per-(mol,state) mean E_loc)
            def sample(batch: Batch):
                e_bar = jnp.broadcast_to(
                    batch.local_energy.mean(-1, keepdims=True), batch.grid_shape
                )
                return grid_vmap(fn, batch, batch.local_energy, e_bar)

        else:

            def sample(batch: Batch):
                return grid_vmap(fn, batch)

        return MonitorSpec(name, sample, lambda b, s: walker_moments(name, s, axis=2))

    return build


class SpinMonitor(ObservableMonitor):
    """Total-spin expectation <S^2> per walker (physics.evaluate_spin)."""

    name = 'spin'
    spec = _per_walker_spec('spin', lambda hamil, wf: evaluate_spin(hamil, wf))


class ForceMonitor(ObservableMonitor):
    """Hellmann-Feynman force estimator monitor (one of five variants).

    ``kind`` selects the estimator from :mod:`deepqmc_tpu.force`: the bare
    Coulomb estimator, the antithetic-coordinate zero-variance ('ac_zv'),
    its zero-bias extension ('ac_zvzb', needs local energies), and their
    Q-function counterparts.  (Reference: one subclass per estimator,
    observable.py:187-297.)
    """

    KINDS = {
        'bare': ('evaluate_hf_force_bare', False),
        'ac_zv': ('evaluate_hf_force_ac_zv', False),
        'ac_zvzb': ('evaluate_hf_force_ac_zvzb', True),
        'ac_zvq': ('evaluate_hf_force_ac_zvq', False),
        'ac_zvzbq': ('evaluate_hf_force_ac_zvzbq', True),
    }

    def __init__(self, kind: str, save_samples: bool, period: int):
        super().__init__(save_samples, period)
        assert kind in self.KINDS, f'unknown force estimator {kind!r}'
        self.kind = kind
        self.name = f'hf_force_{kind}'

    def spec(self, hamil, wf) -> MonitorSpec:
        from . import force

        builder_name, with_energy = self.KINDS[self.kind]
        builder = getattr(force, builder_name)
        factory = (
            (lambda h, w: builder(h)) if self.kind == 'bare' else builder
        )
        return _per_walker_spec(self.name, factory, with_energy)(self, hamil, wf)


def _force_monitor_alias(kind):
    return partial(ForceMonitor, kind)


# config-compatible constructor names (reference observable.py:187-297)
BareForceMonitor = _force_monitor_alias('bare')
ACZVForceMonitor = _force_monitor_alias('ac_zv')
ACZVZBForceMonitor = _force_monitor_alias('ac_zvzb')
ACZVQForceMonitor = _force_monitor_alias('ac_zvq')
ACZVZBQForceMonitor = _force_monitor_alias('ac_zvzbq')


def energy_statistics(batch: Batch, samples) -> Stats:
    """Cross-device walker statistics of the local energies."""
    reducers = {
        'mean': all_device_mean,
        'std': all_device_std,
        'min': all_device_min,
        'max': all_device_max,
    }
    return {
        f'local_energy/{k}': reduce(batch.local_energy, axis=-1)
        for k, reduce in reducers.items()
    }


class EnergyMonitor(ObservableMonitor):
    """Cross-walker statistics (and samples) of the local energies."""

    name = 'local_energy'

    def spec(self, hamil, wf) -> MonitorSpec:
        return MonitorSpec('local_energy', lambda b: b.local_energy, energy_statistics)


class PsiRatioMonitor(ObservableMonitor):
    name = 'psi_ratio'

    def spec(self, hamil, wf) -> MonitorSpec:
        def sample(batch: Batch):
            assert batch.psi_ratios is not None
            return batch.psi_ratios

        return MonitorSpec('psi_ratio', sample)


class ElectronPositionMonitor(ObservableMonitor):
    name = 'r'

    def spec(self, hamil, wf) -> MonitorSpec:
        return MonitorSpec('r', lambda b: b.phys_conf.r)


class NuclearPositionMonitor(ObservableMonitor):
    name = 'R'

    def spec(self, hamil, wf) -> MonitorSpec:
        return MonitorSpec('R', lambda b: b.phys_conf.R[..., 0, :, :])


class WaveFunctionMonitor(ObservableMonitor):
    """Record the wave function sign/log at the sampled configurations."""

    name = 'psi'

    def spec(self, hamil, wf) -> MonitorSpec:
        return MonitorSpec('psi', lambda b: {'sign': b.psi.sign, 'log': b.psi.log})


def oscillator_strength_statistics(batch: Batch, samples) -> Stats:
    """Dipole-times-ratio estimator of oscillator strengths between states.

    f_ij = 2/3 (E_j - E_i) |<i|r|j>|^2 with the transition dipole estimated
    from wave-function ratios; errors propagate first-order through the
    product/sum chain (same estimator as reference observable.py
    OscillatorStrengthMonitor, original error algebra).
    """
    assert batch.psi_ratios is not None
    n = batch.local_energy.shape[-1]

    def mean_err(x, axis):
        return all_device_mean(x, axis=axis), all_device_std(x, axis=axis) / n**0.5

    e, e_err = mean_err(batch.local_energy, -1)
    # e is [mol, state]: the pair axes must broadcast over STATES, keeping
    # the molecule axis leading -> gap[mol, i, j] = E_j - E_i
    gap = e[..., None, :] - e[..., :, None]
    gap_err = (e_err[..., None, :] ** 2 + e_err[..., :, None] ** 2) ** 0.5

    # transition dipole components: (-Σ_i r_i) ψ_j/ψ_k per walker
    dipole = jnp.sum(-batch.phys_conf.r, axis=-2)[:, None] * batch.psi_ratios[..., None]
    d, d_err = mean_err(dipole, -2)
    d_rel = d_err / d

    # |<i|r|j>|^2 via the symmetrized product of the two ratio estimates
    strength_vec = d * d.swapaxes(1, 2)
    strength_vec_err = (
        jnp.abs(strength_vec) * (d_rel**2 + d_rel.swapaxes(1, 2) ** 2) ** 0.5
    )
    strength = jnp.sum(strength_vec, axis=-1)
    strength_err = jnp.sum(strength_vec_err**2, axis=-1) ** 0.5

    f = (2 / 3) * gap * strength
    # relative errors, guarded on the (i == i) diagonal where gap is zero by
    # construction (f is zero there too; report zero error, not NaN)
    safe = lambda num, den: jnp.where(den != 0, num / jnp.where(den == 0, 1.0, den), 0.0)
    f_err = (
        jnp.abs(f)
        * (safe(gap_err, gap) ** 2 + safe(strength_err, strength) ** 2) ** 0.5
    )
    return {'oscillator_strength/mean': f, 'oscillator_strength/err': f_err}


class OscillatorStrengthMonitor(ObservableMonitor):
    name = 'oscillator_strength'

    def spec(self, hamil, wf) -> MonitorSpec:
        return MonitorSpec(
            'oscillator_strength', lambda b: None, oscillator_strength_statistics
        )


def default_observable_monitors() -> list[ObservableMonitor]:
    """Energy and wave-function monitors, evaluated every step."""
    return [
        EnergyMonitor(save_samples=True, period=1),
        WaveFunctionMonitor(save_samples=True, period=1),
    ]
