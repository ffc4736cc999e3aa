"""Ansatz instantiation and parameter initialization.

Reference: /root/reference/src/deepqmc/wf/base.py and app.py:57-64.
"""

from typing import Optional

import jax

from .. import nn
from ..parallel import replicate_on_devices
from ..types import Ansatz, KeyArray, Params
from ..utils import tree_stack

__all__ = ()


def instantiate_ansatz(hamil, ansatz_factory) -> Ansatz:
    """Wrap an ansatz factory into a pure (init, apply) pair.

    Equivalent of the reference's ``hk.without_apply_rng(hk.transform(...))``
    (app.py:57-64) on our nn micro-framework; the returned object also carries
    ``apply_instrumented`` for the KFAC optimizer.
    """
    return nn.transform(
        lambda phys_conf, return_mos=False: ansatz_factory(hamil)(
            phys_conf, return_mos
        )
    )


def merge_states(params: Params, merge_keys: Optional[list[str]]) -> Params:
    """Average whitelisted parameters over the electronic-state axis."""
    from ..optimizer import merge_states as _merge

    return _merge(params, merge_keys)


def init_wf_params(
    rng: KeyArray,
    hamil,
    ansatz: Ansatz,
    electronic_states: int = 1,
    merge_keys: Optional[list[str]] = None,
) -> Params:
    """Initialize per-electronic-state parameter stacks.

    Returns a pytree whose leaves carry a leading ``electronic_states`` axis
    (reference wf/base.py:16-39), replicated across devices.
    """
    rng_sample, rng_params = jax.random.split(rng)
    phys_conf = hamil.init_sample(rng_sample, hamil.mol.coords, 1)[0]
    # ONE jitted program instead of an eager op-by-op forward: XLA dead-code
    # eliminates everything but the PRNG + initializer ops, and the remote
    # dispatch overhead (minutes through the TPU RPC tunnel) collapses to a
    # single compile, shared across electronic states
    init_one = jax.jit(ansatz.init)
    params = [
        init_one(rng_state, phys_conf)
        for rng_state in jax.random.split(rng_params, electronic_states)
    ]
    stacked = tree_stack(params)
    if merge_keys:
        stacked = merge_states(stacked, merge_keys)
    return replicate_on_devices(stacked)
