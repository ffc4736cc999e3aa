"""Electronic and nuclear cusp corrections (reference: /root/reference/src/deepqmc/wf/cusp.py)."""

from typing import Optional

import jax.numpy as jnp

from .. import nn

__all__ = ()


class DeepQMCCusp:
    """scale / (alpha * (1 + alpha * r)) summed over pairs, negated."""

    def __call__(self, scale, alpha, dist):
        return -(scale / (alpha * (1 + alpha * dist))).sum()


class PsiformerCusp:
    """scale * alpha^2 / (alpha + r) summed over pairs, negated."""

    def __call__(self, scale, alpha, dist):
        return -((scale * alpha**2) / (alpha + dist)).sum()


class CuspAsymptotic(nn.Module):
    """Shared machinery of nuclear and electronic cusps."""

    def __init__(self, *, cusp_function, trainable_alpha, name: Optional[str] = None):
        super().__init__(name=name)
        self.trainable_alpha = trainable_alpha
        self.cusp_function = cusp_function

    def get_alpha(self, value, label):
        if self.trainable_alpha:
            return nn.get_param(f'{label}_alpha', (), nn.constant_init(value))
        return jnp.asarray(value, dtype=float)


class ElectronicCuspAsymptotic(CuspAsymptotic):
    """Additive log-psi term enforcing e-e cusp conditions.

    ``same_scale``/``anti_scale`` are the 1/4 and 1/2 Kato coefficients.
    """

    def __init__(self, *, same_scale, anti_scale, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.same_scale, self.anti_scale = same_scale, anti_scale
        self.initial_alpha = alpha

    def __call__(self, same_dists, anti_dists):
        cusp = jnp.array(0.0)
        if same_dists.size > 0:
            cusp += self.cusp_function(
                self.same_scale, self.get_alpha(self.initial_alpha, 'same'), same_dists
            )
        if anti_dists.size > 0:
            cusp += self.cusp_function(
                self.anti_scale, self.get_alpha(self.initial_alpha, 'anti'), anti_dists
            )
        return cusp


class NuclearCuspAsymptotic(CuspAsymptotic):
    """Additive log-psi term enforcing e-n cusp conditions."""

    def __init__(self, nuclear_charges, *, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.nuclear_charges = nuclear_charges[None]  # [1, n_nuc]
        self.alpha = self.get_alpha(alpha, 'nuc')

    def __call__(self, dists):
        # dists: [n_elec, n_nuc]
        return self.cusp_function(self.nuclear_charges, self.alpha, dists)
