"""Optimizers: evaluation (none), first-order (optax), natural gradient (KFAC).

Reference: /root/reference/src/deepqmc/optimizer.py.  All steps here are pure
functions designed to be called from inside the single jitted training step —
no per-optimizer ``pmap`` dispatches; gradients of the sharded batch are
globally correct because the loss reductions are global means.
"""

from typing import Optional, Protocol, TypeVar

import jax
import jax.numpy as jnp
import optax

from .types import Batch, Energy, KeyArray, OptState, Params, Stats
from .utils import filter_dict, tree_norm, tree_stack, tree_unstack

__all__ = ['Optimizer', 'NoOptimizer', 'OptaxOptimizer', 'KFACOptimizer']

T = TypeVar('T')


class Optimizer(Protocol):
    """init(rng, params, batch) -> state; step(...) -> updated everything."""

    def init(self, rng: KeyArray, params: Params, batch: Batch) -> OptState: ...

    def step(
        self, rng: KeyArray, params: Params, opt_state: OptState, batch: Batch
    ) -> tuple[Params, OptState, Energy, Optional[jax.Array], Stats]: ...


class NoOptimizer:
    """Evaluation mode: compute the loss aux, never touch the parameters."""

    def __init__(self, loss_and_grad_fn, merge_keys: Optional[list[str]] = None):
        # a VMCLoss bound method exposes the forward-only evaluation through
        # __self__; use it to skip the (discarded) backward pass entirely
        self.loss_fn = getattr(loss_and_grad_fn, '__self__', None) or (
            lambda params, rng, batch: loss_and_grad_fn(params, rng, batch)[0]
        )

    def init(self, rng, params, batch):
        return None

    def step(self, rng, params, opt_state, batch):
        loss, (E_loc, ratios, stats) = self.loss_fn(
            tree_unstack(params), rng, batch
        )
        return params, opt_state, E_loc, ratios, stats


class OptaxOptimizer:
    """First-order optimization through any optax transformation."""

    def __init__(
        self,
        loss_and_grad_fn,
        merge_keys: Optional[list[str]] = None,
        *,
        optax_opt,
    ):
        self.loss_and_grad_fn = loss_and_grad_fn
        self.merge_keys = merge_keys
        self.optax_opt = optax_opt

    def init(self, rng, params, batch):
        return self.optax_opt.init(tree_unstack(params))

    def step(self, rng, params, opt_state, batch):
        params_list = tree_unstack(params)
        (loss, (E_loc, ratios, stats)), grads = self.loss_and_grad_fn(
            params_list, rng, batch
        )
        updates, opt_state = self.optax_opt.update(grads, opt_state, params_list)
        param_norm, update_norm, grad_norm = map(
            tree_norm, (params_list, updates, grads)
        )
        params_list = optax.apply_updates(params_list, updates)
        params = merge_states(tree_stack(params_list), self.merge_keys)
        stats = {
            'opt/param_norm': param_norm,
            'opt/grad_norm': grad_norm,
            'opt/update_norm': update_norm,
            **stats,
        }
        return params, opt_state, E_loc, ratios, stats


class KFACOptimizer:
    """Natural-gradient optimization with the in-house KFAC engine.

    The reference delegates to kfac-jax (optimizer.py:140-198); here
    :mod:`deepqmc_tpu.kfac` provides the curvature estimation via nn
    instrumentation, so no graph-pattern machinery is needed.
    """

    def __init__(
        self, loss_and_grad_fn, merge_keys: Optional[list[str]] = None, *, kfac
    ):
        self.kfac = kfac(loss_and_grad_fn)
        self.merge_keys = merge_keys

    def bind_ansatz(self, ansatz):
        self.kfac.bind_ansatz(ansatz)

    def init(self, rng, params, batch):
        return self.kfac.init(rng, tree_unstack(params), batch)

    def step(self, rng, params, opt_state, batch):
        params_list, opt_state, aux, opt_stats = self.kfac.step(
            rng, tree_unstack(params), opt_state, batch
        )
        params = merge_states(tree_stack(params_list), self.merge_keys)
        E_loc, ratios, stats = aux
        return params, opt_state, E_loc, ratios, {**opt_stats, **stats}


def merge_states(params: Params, merge_keys: Optional[list[str]]) -> Params:
    """Average whitelisted parameter bundles over the electronic-state axis."""
    av = lambda x: jnp.mean(x, axis=0, keepdims=True).repeat(x.shape[0], axis=0)
    params_averaged = jax.tree_util.tree_map(av, filter_dict(params, merge_keys))
    return {**params, **params_averaged}
