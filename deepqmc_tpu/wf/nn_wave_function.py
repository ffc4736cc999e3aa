"""The neural-network wave function: orbitals -> Slater determinants -> psi.

Reference: /root/reference/src/deepqmc/wf/nn_wave_function.py.  TPU note: the
per-determinant slogdets are evaluated as one batched ``slogdet`` over the
determinant axis; for the small matrix sizes of molecular systems this is the
dominant linear-algebra kernel and is later swappable for a fused Pallas
LU kernel (see deepqmc_tpu/ops).
"""

from typing import Literal, Optional

import jax
import jax.numpy as jnp

from .. import nn
from ..ops import slogdet_flat
from ..physics import pairwise_diffs, pairwise_self_distance
from ..types import Psi
from ..utils import flatten, triu_flat, unflatten

__all__ = ['NeuralNetworkWaveFunction']


class BackflowOp(nn.Module):
    """Applies multiplicative/additive backflow factors to the orbitals."""

    def __init__(
        self, mult_act=None, add_act=None, with_envelope=True, name: Optional[str] = None
    ):
        super().__init__(name=name)
        self.mult_act = mult_act or (lambda x: 1 + 2 * jnp.tanh(x / 4))
        self.add_act = add_act or (lambda x: 0.1 * jnp.tanh(x / 4))
        self.with_envelope = with_envelope

    def __call__(self, xs, fs_mult, fs_add, dists_nuc):
        """Backflow on flat orbitals: all arrays are [n_el, n_det * n_orb].

        The norm for the additive term runs over the flat determinant x
        orbital column axis — the same det+orb reduction as the reference's
        [det, el, orb] layout (nn_wave_function.py:19-33 there).
        """
        if self.with_envelope:
            envel = jnp.sqrt((xs**2).sum(axis=-1, keepdims=True))
        else:
            envel = 1
        if fs_mult is not None:
            xs = xs * self.mult_act(fs_mult)
        if fs_add is not None:
            R = dists_nuc.min(axis=-1) / 0.5
            cutoff = jnp.where(
                R < 1, R**2 * (6 - 8 * R + 3 * R**2), jnp.ones_like(R)
            )
            xs = xs + cutoff[:, None] * envel * self.add_act(fs_add)
        return xs


def eval_log_slater(
    xs: jax.Array, n_det: int
) -> tuple[jax.Array, jax.Array]:
    """Per-determinant (sign, log|det|) of flat Slater matrices.

    ``xs`` is [..., n, n_det * n] with determinant-major columns; empty
    matrices give (1, 0) per determinant.  Uses the framework's own
    flat-layout slogdet primitive so (a) the forward-Laplacian engine can
    apply its analytic second-order rule and (b) no [n_det, n, n]-shaped
    tensor — catastrophically tile-padded on TPU for molecular n — is ever
    materialized upstream (see ops/slogdet.py).
    """
    if xs.shape[-1] == 0:
        return (
            jnp.ones((*xs.shape[:-2], n_det)),
            jnp.zeros((*xs.shape[:-2], n_det)),
        )
    return slogdet_flat(xs, n_det)


class NeuralNetworkWaveFunction(nn.Module):
    """The full deep-QMC ansatz family (PauliNet/FermiNet/DeepErwin/PsiFormer).

    Pipeline (reference nn_wave_function.py:127-172): pairwise features ->
    OmniNet (GNN + Jastrow + backflow + nuclear head) -> envelopes -> backflow
    op -> per-determinant slogdet -> exp-normalized determinant mixing via
    ``conf_coeff`` -> + cusps + Jastrow -> Psi(sign, log).
    """

    def __init__(
        self,
        hamil,
        *,
        omni_factory,
        envelope,
        backflow_op,
        n_determinants,
        full_determinant,
        cusp_electrons,
        cusp_nuclei,
        backflow_transform: Literal['mult', 'add', 'both'],
        conf_coeff,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.mol = hamil.mol
        self.n_up, self.n_down = hamil.n_up, hamil.n_down
        self.charges = hamil.mol.charges
        self.n_det = n_determinants
        self.full_determinant = full_determinant
        self.envelope = envelope(hamil, n_determinants)
        self.conf_coeff = conf_coeff(1, name='conf_coeff')
        self.cusp_electrons = cusp_electrons() if cusp_electrons else None
        self.cusp_nuclei = cusp_nuclei(hamil.mol.charges) if cusp_nuclei else None
        n_up, n_down = self.n_up, self.n_down
        backflow_spec = [
            *((n_up + n_down, n_up + n_down) if full_determinant else (n_up, n_down)),
            n_determinants,
            2 if backflow_transform == 'both' else 1,
        ]
        self.backflow_transform = backflow_transform
        self.backflow_op = backflow_op() if backflow_op else None
        self.omni = omni_factory(hamil, *backflow_spec) if omni_factory else None

    @property
    def spin_slices(self):
        return slice(None, self.n_up), slice(self.n_up, None)

    def _apply_backflow(self, xs, fs, dists_nuc):
        assert self.backflow_op is not None
        if self.backflow_transform == 'mult':
            fs_mult, fs_add = fs, None
        elif self.backflow_transform == 'add':
            fs_mult, fs_add = None, fs
        else:  # both
            fs_mult, fs_add = jnp.split(fs, 2, axis=0)
        fs_mult = fs_mult.squeeze(axis=0) if fs_mult is not None else None
        fs_add = fs_add.squeeze(axis=0) if fs_add is not None else None
        return self.backflow_op(xs, fs_mult, fs_add, dists_nuc)

    def _spin_orbitals(self, phys_conf, fs, nuc_params, dists_nuc):
        """Per-spin flat orbital matrices [n_spin, n_det * n_orb].

        The whole determinant channel runs in the flat det-major column
        layout (see ops/slogdet.py ``slogdet_flat``); for full determinants
        the spin split is a pure electron-row slice.
        """
        orb = self.envelope(phys_conf, nuc_params)  # [n_el, n_det * n_orb]
        if self.full_determinant:
            cols_up = cols_down = orb
        else:
            # column split per spin: orbital o of det d sits at d * n + o
            parts = unflatten(orb, -1, (self.n_det, -1))
            cols_up = flatten(parts[..., : self.n_up], -2)
            cols_down = flatten(parts[..., self.n_up :], -2)
        orb_up = cols_up[: self.n_up]
        orb_down = cols_down[self.n_up :]
        if fs is not None:
            orb_up = self._apply_backflow(orb_up, fs[0], dists_nuc[: self.n_up])
            orb_down = self._apply_backflow(orb_down, fs[1], dists_nuc[self.n_up :])
        return orb_up, orb_down

    def _determinant_mix(self, orb_up, orb_down):
        """Slater determinants -> exp-normalized linear combination."""
        if self.full_determinant:
            sign, logdet = eval_log_slater(
                jnp.concatenate([orb_up, orb_down], axis=-2), self.n_det
            )
        else:
            sign_up, det_up = eval_log_slater(orb_up, self.n_det)
            sign_down, det_down = eval_log_slater(orb_down, self.n_det)
            sign, logdet = sign_up * sign_down, det_up + det_down
        # exp-normalize across determinants, guarding fully -inf batches
        shift = logdet.max()
        shift = jnp.where(~jnp.isinf(shift), shift, jnp.zeros_like(shift))
        psi = self.conf_coeff(sign * jnp.exp(logdet - shift)).squeeze()
        return jax.lax.stop_gradient(jnp.sign(psi)), jnp.log(jnp.abs(psi)) + shift

    def _log_corrections(self, log_psi, jastrow, dists_nuc, dists_elec):
        """Additive log-psi terms: electronic/nuclear cusps and the Jastrow."""
        if self.cusp_electrons:
            same_dists = jnp.concatenate(
                [triu_flat(dists_elec[idxs, idxs]) for idxs in self.spin_slices],
                axis=-1,
            )
            anti_dists = flatten(dists_elec[: self.n_up, self.n_up :])
            log_psi += self.cusp_electrons(same_dists, anti_dists)
        if self.cusp_nuclei:
            log_psi += self.cusp_nuclei(dists_nuc)
        if jastrow is not None:
            log_psi = log_psi + jastrow
        return log_psi

    def __call__(self, phys_conf, return_mos: bool = False):
        diffs_nuc = pairwise_diffs(phys_conf.r, phys_conf.R)
        dists_nuc = jnp.sqrt(diffs_nuc[..., -1])
        dists_elec = pairwise_self_distance(phys_conf.r, full=True)
        jastrow, fs, nuc_params = (
            self.omni(phys_conf) if self.omni else (None, None, None)
        )
        orb_up, orb_down = self._spin_orbitals(phys_conf, fs, nuc_params, dists_nuc)
        if return_mos:
            # cold path (pretraining targets): unpack the flat layout into
            # the reference's [n_det, n_el_spin, n_orb] per-spin matrices
            def unpack(flat):
                return jnp.moveaxis(
                    unflatten(flat, -1, (self.n_det, -1)), -2, -3
                )

            return unpack(orb_up), unpack(orb_down)
        sign_psi, log_psi = self._determinant_mix(orb_up, orb_down)
        log_psi = self._log_corrections(log_psi, jastrow, dists_nuc, dists_elec)
        return Psi(sign_psi, log_psi)
