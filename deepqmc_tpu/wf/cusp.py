"""Electronic and nuclear cusp corrections (reference: /root/reference/src/deepqmc/wf/cusp.py)."""

from typing import Optional

import jax.numpy as jnp

from .. import nn

__all__ = ()


class DeepQMCCusp:
    """scale / (alpha * (1 + alpha * r)) summed over pairs, negated."""

    def __call__(self, scale, alpha, dist):
        pair_terms = scale / (alpha * (1 + alpha * dist))
        return -pair_terms.sum()


class PsiformerCusp:
    """scale * alpha^2 / (alpha + r) summed over pairs, negated."""

    def __call__(self, scale, alpha, dist):
        pair_terms = (scale * alpha**2) / (alpha + dist)
        return -pair_terms.sum()


class CuspAsymptotic(nn.Module):
    """Shared machinery of nuclear and electronic cusps."""

    def __init__(self, *, cusp_function, trainable_alpha, name: Optional[str] = None):
        super().__init__(name=name)
        self.trainable_alpha = trainable_alpha
        self.cusp_function = cusp_function

    def get_alpha(self, value, label):
        """The cusp length scale: a fixed constant or a learned scalar."""
        return (
            nn.get_param(f'{label}_alpha', (), nn.constant_init(value))
            if self.trainable_alpha
            else jnp.asarray(value, dtype=float)
        )


class ElectronicCuspAsymptotic(CuspAsymptotic):
    """Additive log-psi term enforcing e-e cusp conditions.

    ``same_scale``/``anti_scale`` are the 1/4 and 1/2 Kato coefficients.
    """

    def __init__(self, *, same_scale, anti_scale, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.same_scale, self.anti_scale = same_scale, anti_scale
        self.initial_alpha = alpha

    def __call__(self, same_dists, anti_dists):
        # one term per spin-pair channel; empty channels (e.g. a single
        # electron of one spin) contribute nothing and create no parameter
        channels = (
            ('same', self.same_scale, same_dists),
            ('anti', self.anti_scale, anti_dists),
        )
        total = jnp.array(0.0)
        for label, scale, dists in channels:
            if dists.size:
                alpha = self.get_alpha(self.initial_alpha, label)
                total += self.cusp_function(scale, alpha, dists)
        return total


class NuclearCuspAsymptotic(CuspAsymptotic):
    """Additive log-psi term enforcing e-n cusp conditions."""

    def __init__(self, nuclear_charges, *, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.nuclear_charges = jnp.asarray(nuclear_charges)[None]  # [1, n_nuc]
        self.alpha = self.get_alpha(alpha, 'nuc')

    def __call__(self, dists):
        # dists: [n_elec, n_nuc]
        return self.cusp_function(self.nuclear_charges, self.alpha, dists)
