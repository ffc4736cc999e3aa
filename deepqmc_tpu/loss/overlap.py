"""Overlap penalty for penalty-method excited states.

Multi-state VMC keeps electronic states apart by penalizing the pairwise
overlaps S_ij = <Psi_i|Psi_j> (reference: loss/overlap.py; Entwistle et al.,
Nat. Commun. 2023).  This module packages the whole penalty — the Monte
Carlo estimator, the symmetrization, the gradient-scale schedule and the
tangent — in one :class:`OverlapPenalty` object.

Estimator.  Samples r ~ Psi_j^2 give the one-sided estimate
``S[m, i, j] = E_j[w * Psi_i/Psi_j]``; two one-sided estimates are merged by
a sign-consistent geometric mean (zero when they disagree in sign) and the
penalty is the mean over molecules of sum_{i<j} S_ij^2.

TPU notes.  All states' wave functions are evaluated on the *flattened*
(sample-state x walker) axis — two vmap levels instead of the reference's
four (overlap.py:37-47) — so the per-shard batch presented to the network
kernels is n_states-fold larger and the batching depth the compiler must
tile through is halved.  Ratios are formed directly on the whole grid with
one log-shift per evaluation state (the reference's per-sample helper,
overlap.py:49-75, becomes a single broadcast).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel import all_device_mean
from ..types import Ansatz, DataDict, Params, PhysicalConfiguration, Weight
from ..utils import masked_mean, permute_matrix, triu_flat

__all__ = ['OverlapPenalty']


def _pair_upper_sum(per_mol: jax.Array) -> jax.Array:
    """Mean over molecules of the sum over distinct state pairs i < j."""
    return jax.vmap(triu_flat)(per_mol).sum(axis=-1).mean()


class OverlapPenalty:
    """Pairwise-overlap penalty: estimator, symmetrization, scaled tangent.

    ``scale``: None | 'energy_gap' | 'energy_std' | 'max_gap_std' — how the
    per-pair gradient is rescaled from EWM training statistics (the
    reference's scale_by_* factories, overlap.py:155-181); ``floor`` is the
    minimum scale factor.
    """

    def __init__(self, scale: Optional[str] = None, floor: float = 0.1):
        assert scale in (None, 'energy_gap', 'energy_std', 'max_gap_std')
        self.scale = scale
        self.floor = floor

    def ratios(
        self, ansatz: Ansatz, params: Params, phys_conf: PhysicalConfiguration
    ) -> jax.Array:
        """R[mol, i, j, walker] = Psi_i/Psi_j at walkers drawn from Psi_j^2.

        ``params`` carries a leading state axis, ``phys_conf`` leading
        [mol, state, walker] axes.
        """
        n_mol, n_states, n_walk = jax.tree.leaves(phys_conf)[0].shape[:3]
        flat_conf = jax.tree.map(
            lambda x: x.reshape(n_mol, n_states * n_walk, *x.shape[3:]), phys_conf
        )
        eval_flat = jax.vmap(ansatz.apply, (None, 0))  # one state, all samples
        psi = jax.vmap(jax.vmap(eval_flat, (0, None)), (None, 0))(params, flat_conf)
        log = psi.log.reshape(n_mol, n_states, n_states, n_walk)
        sign = psi.sign.reshape(n_mol, n_states, n_states, n_walk)
        # stabilize each evaluation state by its own grid mean, then divide
        # by the diagonal (the sampling state's own value)
        log = log - log.mean(axis=(-1, -2))[:, :, None, None]
        diag = jnp.diagonal(log, axis1=1, axis2=2).swapaxes(-1, -2)
        sign_diag = jnp.diagonal(sign, axis1=1, axis2=2).swapaxes(-1, -2)
        return sign * sign_diag[:, None] * jnp.exp(log - diag[:, None])

    @staticmethod
    def one_sided(ratios: jax.Array, weight: Weight) -> jax.Array:
        """S[mol, i, j]: weighted cross-device mean over walkers."""
        return all_device_mean(weight[:, None] * ratios, axis=-1)

    @staticmethod
    def symmetrized(one_sided: jax.Array) -> jax.Array:
        """Sign-consistent geometric mean of S and S^T per molecule."""
        cross = one_sided * one_sided.swapaxes(-1, -2)
        return jnp.sign(one_sided) * jnp.sqrt(jnp.clip(cross, 0.0))

    def value(self, ratios: jax.Array, weight: Weight) -> tuple[jax.Array, dict]:
        """(penalty value, stats with the symmetrized overlap matrix)."""
        s_sym = self.symmetrized(self.one_sided(ratios, weight))
        return _pair_upper_sum(s_sym**2), {'overlap/pairwise/mean': s_sym}

    def gradient_scale(self, data: DataDict) -> jax.Array:
        """Per-pair gradient rescaling from EWM energy statistics.

        NaN EWM entries (warmup) fall back to neutral values; everything is
        clipped to [floor, 5].
        """
        if self.scale is None:
            return jnp.array(1.0)
        factors = []
        if self.scale in ('energy_gap', 'max_gap_std'):
            e = data['energy_ewm']
            gap = jnp.abs(e[:, :, None] - e[:, None])
            factors.append(jnp.nan_to_num(gap, nan=1.0))
        if self.scale in ('energy_std', 'max_gap_std'):
            std = jnp.nan_to_num(data['std_ewm'].mean(axis=0), nan=5.0)
            factors.append(std[:, None])  # per evaluation state i
        combined = factors[0] if len(factors) == 1 else jnp.maximum(*factors)
        return jnp.clip(combined, self.floor, 5.0)

    def tangent(
        self,
        ratios: jax.Array,
        weight: Weight,
        log_psi_tangent: jax.Array,
        gradient_mask: jax.Array,
        data: DataDict,
    ) -> jax.Array:
        """Tangent of the penalty along d log|psi| (one-sided estimator).

        Only the sampled state's parameters are differentiated (states are
        kept ordered through ``data['ordering']`` instead of adding the
        i<->j permuted term; reference overlap.py:208-215).
        """
        w = weight[:, None]
        s_one = self.one_sided(ratios, weight)
        # covariance of the ratio with the score, outlier walkers masked
        d_s = masked_mean(
            (ratios - s_one[..., None]) * w * log_psi_tangent[:, None],
            gradient_mask,
            axis=-1,
        )
        per_pair = 2.0 * d_s * s_one.swapaxes(-1, -2) * self.gradient_scale(data)
        ordered = jax.vmap(permute_matrix)(per_pair, data['ordering'])
        return _pair_upper_sum(ordered)
