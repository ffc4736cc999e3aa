"""Observable monitors evaluated during training/evaluation.

Reference: /root/reference/src/deepqmc/observable.py.  Each monitor's
``compute_observable`` is a pure jitted function over the globally-sharded
batch (the reference dispatches one pmap per monitor per step).
"""

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
    DataDict,
    Energy,
    ParametrizedWaveFunction,
    Params,
    PhysicalConfiguration,
    Psi,
    Stats,
)

__all__ = ['default_observable_monitors', 'EnergyMonitor', 'WaveFunctionMonitor']


def compute_mean_and_std(
    name: str, observable_samples: jax.Array, axis: int = -1
) -> dict[str, jax.Array]:
    return {
        f'{name}/mean': jnp.mean(observable_samples, axis),
        f'{name}/std': jnp.std(observable_samples, axis),
    }


class ObservableMonitor:
    """Periodically evaluates an observable over the walker batch."""

    name: str
    observable_fn: Optional[Callable]

    def __init__(self, save_samples: bool, period: int):
        assert period > 0
        self.save_samples = save_samples
        self.period = period
        self.observable_fn = None
        self.requires_energy = False
        self._jitted = None

    def finalize(self, hamil, wf: ParametrizedWaveFunction) -> 'ObservableMonitor':
        return self

    def compute_observable(
        self,
        params: Params,
        phys_conf: PhysicalConfiguration,
        psi: Psi,
        local_energy: Energy,
        psi_ratios: Optional[jax.Array],
    ) -> tuple[Any, Stats]:
        assert self.observable_fn is not None, 'call ObservableMonitor.finalize first'
        if not self.requires_energy:
            samples = jax.vmap(
                jax.vmap(jax.vmap(self.observable_fn, (None, 0))), (None, 0)
            )(params, phys_conf)
        else:
            samples = jax.vmap(
                jax.vmap(jax.vmap(self.observable_fn, (None, 0, 0, None))),
                (None, 0, 0, 0),
            )(params, phys_conf, local_energy, local_energy.mean(-1))
        stats = compute_mean_and_std(self.name, samples, axis=2)
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
            self._jitted = jax.jit(self.compute_observable)
        samples, stats = self._jitted(
            params, phys_conf, psi, local_energy, psi_ratios
        )
        if self.save_samples and samples is not None:
            stats |= {f'{self.name}/samples': samples}
        return stats


class SpinMonitor(ObservableMonitor):
    name = 'spin'

    def finalize(self, hamil, wf):
        self.observable_fn = evaluate_spin(hamil, wf)
        return self


class ForceMonitor(ObservableMonitor):
    """Hellmann-Feynman force estimator monitor (one of five variants).

    ``kind`` selects the estimator from :mod:`deepqmc_tpu.force`: the bare
    Coulomb estimator, the antithetic-coordinate zero-variance ('ac_zv'),
    its zero-bias extension ('ac_zvzb', needs local energies), and their
    Q-function counterparts.
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

    def finalize(self, hamil, wf):
        from . import force

        builder_name, self.requires_energy = self.KINDS[self.kind]
        builder = getattr(force, builder_name)
        self.observable_fn = (
            builder(hamil) if self.kind == 'bare' else builder(hamil, wf)
        )
        return self


def _force_monitor_alias(kind):
    return partial(ForceMonitor, kind)


# config-compatible constructor names (reference observable.py:187-297)
BareForceMonitor = _force_monitor_alias('bare')
ACZVForceMonitor = _force_monitor_alias('ac_zv')
ACZVZBForceMonitor = _force_monitor_alias('ac_zvzb')
ACZVQForceMonitor = _force_monitor_alias('ac_zvq')
ACZVZBQForceMonitor = _force_monitor_alias('ac_zvzbq')


class EnergyMonitor(ObservableMonitor):
    """Cross-walker statistics (and samples) of the local energies."""

    name = 'local_energy'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        stats = {
            f'{self.name}/mean': all_device_mean(local_energy, axis=-1),
            f'{self.name}/std': all_device_std(local_energy, axis=-1),
            f'{self.name}/min': all_device_min(local_energy, axis=-1),
            f'{self.name}/max': all_device_max(local_energy, axis=-1),
        }
        return local_energy, stats


class PsiRatioMonitor(ObservableMonitor):
    name = 'psi_ratio'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        assert psi_ratios is not None
        return psi_ratios, {}


class ElectronPositionMonitor(ObservableMonitor):
    name = 'r'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        return phys_conf.r, {}


class NuclearPositionMonitor(ObservableMonitor):
    name = 'R'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        return phys_conf.R[..., 0, :, :], {}


class WaveFunctionMonitor(ObservableMonitor):
    """Record the wave function sign/log at the sampled configurations."""

    name = 'psi'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        return {'sign': psi.sign, 'log': psi.log}, {}


class OscillatorStrengthMonitor(ObservableMonitor):
    """Dipole-times-ratio estimator of oscillator strengths between states."""

    name = 'oscillator_strength'

    def compute_observable(self, params, phys_conf, psi, local_energy, psi_ratios):
        assert psi_ratios is not None
        sample_size = local_energy.shape[-1]

        energy_mean = all_device_mean(local_energy, axis=-1)
        energy_err = all_device_std(local_energy, axis=-1) / sample_size**0.5
        ex_energy_mean = energy_mean[None, :] - energy_mean[:, None]
        ex_energy_err = (energy_err**2 + energy_err[:, None] ** 2) ** 0.5

        cd = jnp.sum(-phys_conf.r, axis=-2)[:, None] * psi_ratios[..., None]
        cd_mean = all_device_mean(cd, axis=-2)
        cd_err = all_device_std(cd, axis=-2) / sample_size**0.5
        cd_rel_err = cd_err / cd_mean

        ds_vec = cd_mean * cd_mean.swapaxes(1, 2)
        ds_err_vec = (
            jnp.abs(ds_vec) * (cd_rel_err**2 + cd_rel_err.swapaxes(1, 2) ** 2) ** 0.5
        )
        ds_mean = jnp.sum(ds_vec, axis=-1)
        ds_err = jnp.sum(ds_err_vec**2, axis=-1) ** 0.5

        os_mean = (2 / 3) * ex_energy_mean * ds_mean
        os_err = (
            (2 / 3)
            * jnp.abs(os_mean)
            * ((ex_energy_err / ex_energy_mean) ** 2 + (ds_err / ds_mean) ** 2) ** 0.5
        )
        return None, {f'{self.name}/mean': os_mean, f'{self.name}/err': os_err}


def default_observable_monitors() -> list[ObservableMonitor]:
    """Energy and wave-function monitors, evaluated every step."""
    return [
        EnergyMonitor(save_samples=True, period=1),
        WaveFunctionMonitor(save_samples=True, period=1),
    ]
