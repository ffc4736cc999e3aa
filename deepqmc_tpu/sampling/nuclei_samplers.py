"""Nuclear-geometry samplers and electron warps.

Reference: /root/reference/src/deepqmc/sampling/nuclei_samplers.py.  Only the
idle (fixed-geometry) sampler ships, mirroring the reference; the scaffold
supports future geometry-sampling strategies.
"""

import jax
import jax.numpy as jnp

from ..types import KeyArray, SamplerState, Stats


class IdleNucleiSampler:
    """Track nuclear coordinates without ever moving them."""

    def __init__(self, charges: jax.Array):
        pass

    def init(self, nuc_coords: jax.Array, *args, **kwargs) -> SamplerState:
        return {'R': nuc_coords}

    def sample(
        self, rng: KeyArray, state: SamplerState
    ) -> tuple[SamplerState, jax.Array, Stats]:
        return state, jnp.zeros_like(state['R']), {}


def no_elec_warp(
    rng: KeyArray, R: jax.Array, dR: jax.Array, smpl_state: SamplerState
) -> SamplerState:
    """Identity electron warp."""
    return smpl_state
