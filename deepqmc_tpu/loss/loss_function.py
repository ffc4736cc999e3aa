"""The VMC loss with a *direct* gradient estimator.

Covers the behavior of the reference's custom-JVP loss
(/root/reference/src/deepqmc/loss/loss_function.py) with a different
mechanism, chosen for the fused single-jit training step this framework is
built around.  The reference must express the VMC gradient as a
``jax.custom_jvp`` so that kfac-jax's ``value_and_grad`` picks it up via AD
transposition, and must smuggle its aux outputs through the unused tangent
slot (reference loss_function.py:240-244).  Here the optimizer interface
takes a loss-and-gradient *function*, so neither trick is needed; the
estimator is computed head-on:

1. every gradient contribution (energy, overlap penalty, spin penalty) is
   linear in the per-walker tangents ``T = d log|psi|`` — assemble that
   linear map, transpose it once with :func:`jax.linear_transpose` to get a
   per-walker cotangent field ``c[mol, state, walker]``;
2. pull ``c`` back to parameter space with ONE :func:`jax.vjp` backward pass
   of batched ``log|psi|`` per electronic state.

This keeps the estimator semantics (clipping, masking, per-state baselines,
penalty scalings) in small composable term functions, costs a single
backward pass no matter how many penalty terms are active, and never asks
AD to differentiate through the Hamiltonian.
"""

import os
from functools import partial
from typing import Optional, Protocol, cast

import jax
import jax.numpy as jnp

from ..types import (
    Ansatz,
    Batch,
    Energy,
    KeyArray,
    Params,
    PhysicalConfiguration,
    Stats,
)
from ..utils import tree_stack
from .clip import (
    LocalEnergyClipAndMaskFn,
    PsiRatioClipAndMaskFn,
    clip_local_energy,
    clip_psi_ratio,
)
from .energy import (
    compute_local_energy,
    compute_mean_energy,
    compute_mean_energy_tangent,
)
from .overlap import OverlapPenalty
from .spin import (
    compute_mean_spin,
    compute_mean_spin_tangent,
    compute_spin_contributions,
)

__all__ = ()


class LossFunction(Protocol):
    def __call__(
        self, params: list[Params], rng: KeyArray, batch: Batch
    ) -> tuple[jax.Array, tuple[Energy, Optional[jax.Array], Stats]]: ...


class LossFunctionFactory(Protocol):
    def __call__(self, hamil, ansatz: Ansatz) -> LossFunction: ...


class LossAndGradFunction(Protocol):
    def __call__(self, params: list[Params], rng: KeyArray, batch: Batch): ...


def _grad_walker_chunk() -> int:
    """Walker-axis chunk for the log-psi vjp pullback (0 = whole batch).

    The pullback's residuals (every layer activation of the batched
    forward) and its backward pass (vmapped over the two stacked cotangents
    for the fused KFAC taps) are the HBM peak of the optimization half of
    the step — benzene at 512 walkers x 2 states OOM'd exactly there
    (``jvp(update_step)`` temps, round-4 r04_benzene3.log).  Chunking runs
    the vjp in sequential walker chunks under ``lax.scan``; the gradient is
    linear in the per-walker cotangents so chunk gradients SUM exactly, and
    the KFAC Kronecker-factor statistics are plain per-walker second-moment
    sums, so they accumulate exactly too (the factor sums are reduced inside
    each chunk — full-batch activation captures never materialize).
    Companion of DEEPQMC_TPU_ELOC_WALKER_CHUNK (loss/energy.py), which
    bounds the *local-energy* half.
    """
    return int(os.environ.get('DEEPQMC_TPU_GRAD_WALKER_CHUNK', '0'))


def _chunk_size(batch: int, chunk: int) -> int:
    """Largest divisor of ``batch`` that is <= ``chunk``."""
    return max(d for d in range(1, min(chunk, batch) + 1) if batch % d == 0)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _state_phys_conf(phys_conf: PhysicalConfiguration, i: int):
    """Select electronic state ``i`` and flatten [mol, walker] into one axis."""
    n_batch = len(phys_conf.batch_shape)
    return jax.tree_util.tree_map(
        lambda x: x[:, i].reshape(-1, *x.shape[n_batch:]), phys_conf
    )


def _batched_log_psi(ansatz: Ansatz, phys_conf, params: Params) -> jax.Array:
    return jax.vmap(ansatz.apply, (None, 0))(params, phys_conf).log


class VMCLoss:
    """Weighted mean local energy with optional overlap and spin penalties.

    Calling the object evaluates the loss and its aux outputs
    ``(local_energy, psi_ratio, stats)``; :meth:`value_and_grad` additionally
    returns the VMC gradient estimate.  Construct via :func:`create_loss_fn`.
    """

    def __init__(
        self,
        hamil,
        ansatz: Ansatz,
        clip_mask_fn: LocalEnergyClipAndMaskFn,
        clip_mask_overlap_fn: Optional[PsiRatioClipAndMaskFn],
        alpha: Optional[float],
        spin_penalty: Optional[float],
        scale_overlap_by: Optional[str],
        sort_states_by: Optional[str],
        min_gap_scale_factor: float,
    ):
        self.hamil = hamil
        self.ansatz = ansatz
        self.clip_mask_fn = clip_mask_fn
        self.clip_mask_overlap_fn = clip_mask_overlap_fn
        self.alpha = alpha
        self.spin_penalty = spin_penalty
        self.overlap_penalty = OverlapPenalty(scale_overlap_by, min_gap_scale_factor)
        self.sort_states_by = sort_states_by

    # -- shared forward work -------------------------------------------------

    def _state_ordering(self, data) -> jax.Array:
        energy_ewm = data['energy_ewm']
        if self.sort_states_by == 'energy':
            return jnp.argsort(energy_ewm, axis=-1)
        return jnp.broadcast_to(
            jnp.arange(energy_ewm.shape[-1]), energy_ewm.shape
        )

    def _evaluate_terms(self, params, rng, batch):
        """Everything both the loss and the gradient need: local energies,
        penalty raw materials, and the running stats dict."""
        phys_conf, weight, _ = batch
        stacked_params = tree_stack(params)
        local_energy, stats = compute_local_energy(
            rng, self.hamil, self.ansatz.apply, stacked_params, phys_conf
        )
        loss, energy_stats = compute_mean_energy(local_energy, weight)
        stats |= energy_stats

        psi_ratio = None
        spin_contributions = None
        if phys_conf.batch_shape[1] > 1:
            psi_ratio = self.overlap_penalty.ratios(
                self.ansatz, stacked_params, phys_conf
            )
            overlap, overlap_stats = self.overlap_penalty.value(psi_ratio, weight)
            loss += self.alpha * overlap
            stats |= overlap_stats
        if self.spin_penalty is not None:
            spin_contributions = compute_spin_contributions(
                self.hamil, self.ansatz, stacked_params, phys_conf
            )
            spin, spin_stats = compute_mean_spin(spin_contributions, weight)
            loss += self.spin_penalty * spin
            stats |= spin_stats
        return loss, local_energy, psi_ratio, spin_contributions, stats

    # -- public surface --------------------------------------------------------

    def __call__(self, params, rng, batch):
        loss, local_energy, psi_ratio, _, stats = self._evaluate_terms(
            params, rng, batch
        )
        return loss, (local_energy, psi_ratio, stats)

    def value_and_grad(self, params, rng, batch):
        return self._value_grad_taps(params, rng, batch, None)[:2]

    def value_grad_and_taps(self, params, rng, batch, taps_spec, taps_reducer=None):
        """Loss, gradient, AND per-layer curvature taps in one shared pass.

        ``taps_spec`` maps dense-layer path -> list of single-sample output
        shapes (one per call of that layer).  The log-psi pullback used for
        the VMC gradient is built over the *instrumented* forward, and its
        residuals are reused for a second cotangent (all-ones), so the KFAC
        activation/sensitivity taps cost one extra backward instead of a
        whole separate instrumented forward+backward pass.  Returns
        ``((loss, aux), grads, taps)`` with ``taps[state] = (captures,
        sensitivities)``, or — when ``taps_reducer`` is given — the reducer
        applied to each state's (captures, sensitivities).  The reducer must
        be linear in per-walker contributions (KFAC's factor sums are), so
        the walker-chunked pullback (DEEPQMC_TPU_GRAD_WALKER_CHUNK) can
        accumulate it per chunk without materializing full-batch captures.
        """
        return self._value_grad_taps(params, rng, batch, taps_spec, taps_reducer)

    def _value_grad_taps(self, params, rng, batch, taps_spec, taps_reducer=None):
        phys_conf, weight, data = batch
        loss, local_energy, psi_ratio, spin_contributions, stats = (
            self._evaluate_terms(params, rng, batch)
        )

        # the estimator's per-walker coefficients: clip outliers, mask walkers
        clipped_energy, gradient_mask = clip_local_energy(
            self.clip_mask_fn, local_energy
        )
        if psi_ratio is not None:
            assert self.clip_mask_overlap_fn is not None
            clipped_ratio, ratio_mask = clip_psi_ratio(
                self.clip_mask_overlap_fn, psi_ratio
            )
            overlap_data = dict(data, ordering=self._state_ordering(data))

        def assemble_tangent(log_psi_tangent):
            """Total loss tangent as a function of T = d log|psi|; linear."""
            tangent = compute_mean_energy_tangent(
                clipped_energy, weight, log_psi_tangent, gradient_mask
            )
            if psi_ratio is not None:
                tangent += self.alpha * self.overlap_penalty.tangent(
                    clipped_ratio,
                    weight,
                    log_psi_tangent,
                    ratio_mask,
                    overlap_data,
                )
            if spin_contributions is not None:
                tangent += self.spin_penalty * compute_mean_spin_tangent(
                    spin_contributions, weight, log_psi_tangent, gradient_mask
                )
            return tangent

        # transpose the linear tangent assembly: the cotangent of T under a
        # unit loss cotangent is the per-walker coefficient field c
        t_shape = jax.ShapeDtypeStruct(local_energy.shape, local_energy.dtype)
        (cotangent,) = jax.linear_transpose(assemble_tangent, t_shape)(
            jnp.ones((), local_energy.dtype)
        )

        # pull c back to parameter space: one vjp of log|psi| per state.
        # The whole pullback runs under the gradient matmul-precision
        # context (utils.grad_precision_ctx): its forward AND transposed
        # matmuls feed only the stochastic gradient + curvature taps.
        from ..utils import grad_precision_ctx

        grads, taps = [], []
        with grad_precision_ctx():
            for i, state_params in enumerate(params):
                grad_i, tap_i = self._pull_back_state(
                    params, phys_conf, cotangent, taps_spec, i, taps_reducer
                )
                grads.append(grad_i)
                if tap_i is not None:
                    taps.append(tap_i)

        return (loss, (local_energy, psi_ratio, stats)), grads, taps

    def _pull_back_state(
        self, params, phys_conf, cotangent, taps_spec, i, taps_reducer=None
    ):
        state_params = params[i]
        conf_i = _state_phys_conf(phys_conf, i)
        cot_i = cotangent[:, i].reshape(-1)
        n_batch = len(cot_i)
        chunk = _grad_walker_chunk()
        size = _chunk_size(n_batch, chunk) if chunk else n_batch

        def pull_chunk(conf_c, cot_c):
            """vjp of batched log|psi| over one walker chunk.

            Returns ``(grad, taps)`` for the chunk; both sum exactly over
            chunks (the gradient is linear in the per-walker cotangents, the
            reduced taps are per-walker second-moment sums).
            """
            if taps_spec is None:
                _, pullback = jax.vjp(
                    partial(_batched_log_psi, self.ansatz, conf_c), state_params
                )
                (grad_c,) = pullback(cot_c)
                return grad_c, None
            perturb = {
                path: [jnp.zeros((len(cot_c), *shape)) for shape in shapes]
                for path, shapes in taps_spec.items()
            }

            def fwd(p, pert, conf_c=conf_c):
                def single(pc, pert_1):
                    psi, caps = self.ansatz.apply_instrumented(p, pert_1, pc)
                    return psi.log, {
                        k: [x for x, _ in v] for k, v in caps.items()
                    }

                return jax.vmap(single)(conf_c, pert)

            (_, pullback, captures) = jax.vjp(
                fwd, state_params, perturb, has_aux=True
            )
            # ONE batched backward for both cotangents — the VMC-gradient
            # field c and the all-ones taps cotangent (d sum(log psi) /
            # d pert) — instead of two sequential backward sweeps over the
            # same residuals: the backward GEMMs batch over the cotangent
            # axis on the MXU
            both = jax.vmap(pullback)(jnp.stack([cot_c, jnp.ones_like(cot_c)]))
            grad_c = jax.tree_util.tree_map(lambda x: x[0], both[0])
            sensitivities = jax.tree_util.tree_map(lambda x: x[1], both[1])
            tap_c = (captures, sensitivities)
            if taps_reducer is not None:
                tap_c = taps_reducer(captures, sensitivities)
            return grad_c, tap_c

        if size == n_batch:
            return pull_chunk(conf_i, cot_i)

        # chunked: scan sequential walker chunks, accumulating the (linear)
        # gradient and reduced-tap sums — bounds the vjp residual + backward
        # HBM peak to one chunk.  Raw (unreduced) taps cannot be chunked
        # without re-materializing the full batch, so a reducer is required.
        assert taps_spec is None or taps_reducer is not None, (
            'DEEPQMC_TPU_GRAD_WALKER_CHUNK with curvature taps needs a '
            'taps_reducer (KFAC passes its factor-sum reducer)'
        )
        resh = lambda x: x.reshape(n_batch // size, size, *x.shape[1:])
        conf_chunks = jax.tree_util.tree_map(resh, conf_i)
        cot_chunks = resh(cot_i)
        first = jax.tree_util.tree_map(
            lambda x: x[0], (conf_chunks, cot_chunks)
        )
        out_shapes = jax.eval_shape(pull_chunk, *first)
        init = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), out_shapes
        )

        def body(carry, xs):
            return _tree_add(carry, pull_chunk(*xs)), None

        return jax.lax.scan(body, init, (conf_chunks, cot_chunks))[0]


def create_loss_fn(
    hamil,
    ansatz: Ansatz,
    clip_mask_fn: LocalEnergyClipAndMaskFn,
    clip_mask_overlap_fn: Optional[PsiRatioClipAndMaskFn] = None,
    alpha: Optional[float] = None,
    spin_penalty: Optional[float] = None,
    scale_overlap_by: Optional[str] = None,
    sort_states_by: Optional[str] = None,
    min_gap_scale_factor: float = 0.1,
) -> VMCLoss:
    """Build the VMC loss (kwargs mirror reference loss_function.py:111-135)."""
    return VMCLoss(
        hamil,
        ansatz,
        clip_mask_fn,
        clip_mask_overlap_fn,
        alpha,
        spin_penalty,
        scale_overlap_by,
        sort_states_by,
        min_gap_scale_factor,
    )
