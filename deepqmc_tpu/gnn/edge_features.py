"""Edge featurizations (reference: /root/reference/src/deepqmc/gnn/edge_features.py)."""

from typing import Optional, Protocol

import jax
import jax.numpy as jnp

from ..utils import norm

__all__ = ()


def _log_damp(features: jax.Array, r: jax.Array) -> jax.Array:
    """Rescale per-edge features by log(1+r)/r (tames the long-range tail)."""
    return features * (jnp.log1p(r) / r)[..., None]


class EdgeFeature(Protocol):
    """Maps difference vectors [..., 3] to feature vectors [..., len(self)]."""

    def __call__(self, d: jax.Array) -> jax.Array: ...

    def __len__(self) -> int: ...


class DifferenceEdgeFeature:
    """The raw difference vector, optionally log-damped."""

    def __init__(self, *, log_rescale: bool = False):
        self.log_rescale = log_rescale

    def __call__(self, d: jax.Array) -> jax.Array:
        return _log_damp(d, norm(d, safe=True)) if self.log_rescale else d

    def __len__(self) -> int:
        return 3


class DistancePowerEdgeFeature:
    """Powers of the edge length, with regularized negative powers."""

    def __init__(
        self,
        *,
        powers: list[float],
        eps: Optional[float] = None,
        log_rescale: bool = False,
    ):
        if any(p < 0 for p in powers) and eps is None:
            raise ValueError('negative powers need an eps regularizer')
        self.powers = jnp.asarray(powers)
        self.eps = eps or 0.0
        self.log_rescale = log_rescale

    def __call__(self, d: jax.Array) -> jax.Array:
        r = norm(d, safe=True)
        rk = r[..., None]
        powered = jnp.where(
            self.powers > 0,
            rk**self.powers,
            1 / (rk ** (-self.powers) + self.eps),
        )
        return _log_damp(powered, r) if self.log_rescale else powered

    def __len__(self) -> int:
        return len(self.powers)


class GaussianEdgeFeature:
    """Distance expanded in a quadratically-spaced Gaussian basis."""

    def __init__(self, *, n_gaussian: int, radius: float, offset: bool):
        pad = 1 / (2 * n_gaussian) if offset else 0
        knots = jnp.linspace(pad, 1 - pad, n_gaussian)
        # centers crowd towards r=0 where the wave function varies fastest
        self.mus = radius * knots**2
        self.sigmas = (1 + radius * knots) / 7

    def __call__(self, d: jax.Array) -> jax.Array:
        r = norm(d, safe=True)
        return jnp.exp(-((r[..., None] - self.mus) ** 2) / self.sigmas**2)

    def __len__(self) -> int:
        return len(self.mus)


class CombinedEdgeFeature:
    """Concatenation of several edge features."""

    def __init__(self, *, features: list):
        self.features = features

    def __call__(self, d: jax.Array) -> jax.Array:
        return jnp.concatenate([f(d) for f in self.features], axis=-1)

    def __len__(self) -> int:
        return sum(map(len, self.features))
