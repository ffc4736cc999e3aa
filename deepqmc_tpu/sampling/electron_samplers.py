"""Electron-position MCMC samplers.

Reference: /root/reference/src/deepqmc/sampling/electron_samplers.py.  Design
difference (SURVEY.md §7.5): the reference composes sampler behaviours by
synthesizing classes with a dynamic MRO at runtime (sampling_utils.py:47-54).
Here :class:`DecorrSampler`/:class:`ResampledSampler` are explicit wrappers —
plain composition that is pytree/jit-friendly — while the *state layout*
(a flat dict with ``r``/``psi``/``age``/``tau``/... keys) matches the
reference so checkpoints stay structurally equivalent.

All samplers act on a batch of ``n`` walkers of one (molecule, state) pair and
are ``vmap``-ed over states and molecules by the combined samplers; the
decorrelation loop is a ``lax.scan`` so the whole sampling step lives inside
one jitted program.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..physics import pairwise_self_distance
from ..types import (
    KeyArray,
    ParametrizedWaveFunction,
    Params,
    PhysicalConfiguration,
    SamplerState,
    Stats,
)
from ..utils import multinomial_resampling, split_dict

__all__ = [
    'MetropolisSampler',
    'LangevinSampler',
    'DecorrSampler',
    'ResampledSampler',
]


class MetropolisSampler:
    """Random-walk Metropolis--Hastings with adaptive step size.

    Args (reference electron_samplers.py:30-60): ``tau`` initial proposal
    scale; ``target_acceptance`` drives the tau adaptation; ``max_age`` forces
    acceptance of walkers stuck longer than this many steps.
    """

    WALKER_STATE = ['r', 'psi', 'age']

    def __init__(
        self,
        hamil,
        wf: ParametrizedWaveFunction,
        *,
        tau: float = 1.0,
        target_acceptance: float = 0.57,
        max_age: Optional[int] = None,
    ):
        self.hamil = hamil
        self.wf = wf
        self.initial_tau = tau
        self.target_acceptance = target_acceptance
        self.max_age = max_age

    def phys_conf(self, R: jax.Array, r: jax.Array) -> PhysicalConfiguration:
        if r.ndim == 2:
            return PhysicalConfiguration(R, r, jnp.array(0))
        n = len(r)
        return PhysicalConfiguration(
            jnp.tile(R[None], (n, 1, 1)), r, jnp.zeros(n, dtype=jnp.int32)
        )

    def _update(self, state: SamplerState, params: Params, R: jax.Array):
        psi = jax.vmap(self.wf, (None, 0))(params, self.phys_conf(R, state['r']))
        return {**state, 'psi': psi}

    def update(self, state: SamplerState, params: Params, R: jax.Array):
        return self._update(state, params, R)

    def init(self, rng: KeyArray, params: Params, n: int, R: jax.Array):
        state = {
            'r': self.hamil.init_sample(rng, R, n).r,
            'age': jnp.zeros(n, jnp.int32),
            'tau': jnp.array(self.initial_tau),
        }
        return self._update(state, params, R)

    def _proposal(self, state: SamplerState, rng: KeyArray) -> jax.Array:
        r = state['r']
        return r + state['tau'] * jax.random.normal(rng, r.shape, r.dtype)

    def _acc_log_prob(self, state, prop) -> jax.Array:
        return 2 * (prop['psi'].log - state['psi'].log)

    def _select_walkers(self, accepted, candidate, state):
        """Per-walker merge of accepted candidates into the walker state;
        non-walker entries (tau, ...) are taken from the candidate."""
        (cand_walkers, rest), (old_walkers, _) = (
            split_dict(d, lambda k: k in self.WALKER_STATE)
            for d in (candidate, state)
        )
        merged = jax.tree_util.tree_map(
            lambda new, old: jax.vmap(jnp.where)(accepted, new, old),
            cand_walkers,
            old_walkers,
        )
        return {**merged, **rest}

    def _stats(self, state) -> Stats:
        return {
            'sampling/tau': state['tau'],
            'sampling/age/mean': jnp.mean(state['age']),
            'sampling/age/max': jnp.max(state['age']),
            'sampling/log_psi/mean': jnp.mean(state['psi'].log),
            'sampling/log_psi/std': jnp.std(state['psi'].log),
            'sampling/dists/mean': jnp.mean(pairwise_self_distance(state['r'])),
        }

    def sample(
        self, rng: KeyArray, state: SamplerState, params: Params, R: jax.Array
    ) -> tuple[SamplerState, PhysicalConfiguration, Stats]:
        rng_prop, rng_acc = jax.random.split(rng)
        candidate = self._update(
            {
                'r': self._proposal(state, rng_prop),
                'age': jnp.zeros_like(state['age']),
                **{k: v for k, v in state.items() if k not in self.WALKER_STATE},
            },
            params,
            R,
        )
        log_prob = self._acc_log_prob(state, candidate)
        accepted = log_prob > jnp.log(jax.random.uniform(rng_acc, log_prob.shape))
        if self.max_age:
            # force stuck walkers to move so no region is frozen forever
            accepted = accepted | (state['age'] >= self.max_age)
        acceptance = accepted.mean(dtype=state['r'].dtype)
        if self.target_acceptance:
            candidate['tau'] = candidate['tau'] * (
                jnp.maximum(acceptance, 0.05) / self.target_acceptance
            )
        state = self._select_walkers(
            accepted, candidate, {**state, 'age': state['age'] + 1}
        )
        stats = {'sampling/acceptance': acceptance, **self._stats(state)}
        return state, self.phys_conf(R, state['r']), stats


class LangevinSampler(MetropolisSampler):
    """Metropolis-adjusted Langevin: drift along the regularized quantum force."""

    WALKER_STATE = MetropolisSampler.WALKER_STATE + ['force']

    def _update(self, state: SamplerState, params: Params, R: jax.Array):
        from .sampling_utils import clean_force

        @jax.vmap
        @partial(jax.value_and_grad, has_aux=True)
        def wf_and_force(r):
            psi = self.wf(params, self.phys_conf(R, r))
            return psi.log, psi

        (_, psi), force = wf_and_force(state['r'])
        force = clean_force(
            force, self.phys_conf(R, state['r']), self.hamil.mol, tau=state['tau']
        )
        return {**state, 'psi': psi, 'force': force}

    def _proposal(self, state, rng):
        r, tau = state['r'], state['tau']
        return (
            r
            + tau * state['force']
            + jnp.sqrt(tau) * jax.random.normal(rng, r.shape, r.dtype)
        )

    def _acc_log_prob(self, state, prop):
        log_G_ratios = jnp.sum(
            (state['force'] + prop['force'])
            * (
                (state['r'] - prop['r'])
                + state['tau'] / 2 * (state['force'] - prop['force'])
            ),
            axis=tuple(range(1, state['r'].ndim)),
        )
        return log_G_ratios + 2 * (prop['psi'].log - state['psi'].log)


class _WrappedSampler:
    """Base of explicit sampler wrappers; delegates by default."""

    def __init__(self, inner):
        self.inner = inner

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def init(self, rng, params, n, R):
        return self.inner.init(rng, params, n, R)

    def update(self, state, params, R):
        return self.inner.update(state, params, R)

    def sample(self, rng, state, params, R):
        return self.inner.sample(rng, state, params, R)


class DecorrSampler:
    """Insert ``length - 1`` decorrelating MCMC steps per sample call.

    The inner steps run as a ``lax.scan``, keeping the whole decorrelation
    inside one compiled program (the reference does the same,
    electron_samplers.py:215-221).
    """

    def __init__(self, *, length: int):
        self.length = length

    def wrap(self, inner):
        length = self.length

        class _Decorr(_WrappedSampler):
            def sample(self, rng, state, params, R):
                state, stats = lax.scan(
                    lambda st, key: self.inner.sample(key, st, params, R)[::2],
                    state,
                    jax.random.split(rng, length),
                )
                stats = {k: v[-1] for k, v in stats.items()}
                return state, self.inner.phys_conf(R, state['r']), stats

        return _Decorr(inner)


class ResampledSampler:
    """Importance-weight accumulation + multinomial resampling of walkers.

    Between parameter updates the walkers' weights track the change of
    ``|psi|^2``; once ``period`` steps elapse or the normalized effective
    sample size drops below ``threshold``, walkers are resampled
    (reference electron_samplers.py:225-297).
    """

    def __init__(
        self, *, period: Optional[int] = None, threshold: Optional[float] = None
    ):
        assert period is not None or threshold is not None
        self.period = period
        self.threshold = threshold

    def wrap(self, inner):
        period, threshold = self.period, self.threshold

        class _Resampled(_WrappedSampler):
            def init(self, rng, params, n, R):
                state = self.inner.init(rng, params, n, R)
                return {
                    **state,
                    'step': jnp.array(0),
                    'log_weight': jnp.zeros_like(state['psi'].log),
                }

            def update(self, state, params, R):
                state = dict(state)
                state['log_weight'] = state['log_weight'] - 2 * state['psi'].log
                state = self.inner.update(state, params, R)
                state['log_weight'] = state['log_weight'] + 2 * state['psi'].log
                state['log_weight'] = state['log_weight'] - state['log_weight'].max()
                return state

            def _resample(self, rng, state):
                idx = multinomial_resampling(rng, jnp.exp(state['log_weight']))
                walkers, other = split_dict(
                    state, lambda k: k in self.inner.WALKER_STATE
                )
                return {
                    **jax.tree_util.tree_map(lambda x: x[idx], walkers),
                    **other,
                    'step': jnp.array(0),
                    'log_weight': jnp.zeros_like(state['log_weight']),
                }

            def sample(self, rng, state, params, R):
                rng_re, rng_smpl = jax.random.split(rng)
                state, _, stats = self.inner.sample(rng_smpl, state, params, R)
                state = {**state, 'step': state['step'] + 1}
                weight = jnp.exp(state['log_weight'])
                ess = jnp.sum(weight) ** 2 / jnp.sum(weight**2)
                stats['sampling/effective sample size'] = ess
                do_resample = jnp.array(False)
                if period is not None:
                    do_resample |= state['step'] >= period
                if threshold is not None:
                    do_resample |= ess / len(weight) < threshold
                state = jax.lax.cond(
                    do_resample,
                    self._resample,
                    lambda rng, st: st,
                    rng_re,
                    state,
                )
                return state, self.inner.phys_conf(R, state['r']), stats

        return _Resampled(inner)
