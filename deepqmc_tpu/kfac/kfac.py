"""In-house KFAC natural-gradient engine for VMC.

The reference relies on DeepMind's kfac-jax plus custom graph patterns and
curvature blocks (/root/reference/src/deepqmc/kfacext.py).  This
implementation obtains the same two-Kronecker-factor approximation without
any graph-pattern matching: every dense layer built on
:mod:`deepqmc_tpu.nn` reports its input activations and accepts per-call
output perturbations, so one instrumented forward plus one backward pass of
``sum(log psi)`` yields the activation factor A = E[a a^T] and sensitivity
factor G = E[g g^T] of every layer ("fisher_exact" for a scalar
normal-predictive output, matching the reference's estimation mode,
conf/task/opt/kfac.yaml:14).

Specifics:
- layers applied repeatedly per sample (vmapped over electrons / edges /
  orbitals — the RepeatedDenseBlock case of kfacext.py:58-96) contribute one
  (a, g) pair per repetition and carry a block scale R = #repetitions;
- parameters that are not dense-layer weights (envelope zetas/pis, cusp
  alphas, embeddings) use an identity curvature, as kfac-jax's generic
  ScaledIdentity blocks do for unregistered parameters;
- damping is split between the factors via the pi-correction
  pi = sqrt((tr(A)/dim_A) / (tr(G)/dim_G));
- the update is rescaled to satisfy the trust-region norm constraint
  lr^2 * v^T (F + lambda I) v <= norm_constraint, with v^T(F+lambda)v = v.g
  since v solves the damped system;
- everything is a pure function of (params, opt_state, batch) and runs
  inside the fused jitted training step, with factor statistics reduced over
  the globally-sharded walker batch (psum over ICI under the hood).
"""

import logging
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import ConstantSchedule

log = logging.getLogger(__name__)

__all__ = ['KFAC']


class LayerMeta(NamedTuple):
    path: str
    in_dim: int
    out_dim: int
    has_bias: bool
    n_calls: int
    # number of per-sample repetitions of each call (prod of leading axes of
    # the single-sample activation)
    repeats: tuple[int, ...]
    out_shapes: tuple[tuple[int, ...], ...]


def _flat_batch(x, feat_dim):
    """Collapse all leading axes except the trailing feature axis."""
    return x.reshape(-1, feat_dim)


def factor_sums(metas, caps, grads):
    """Unnormalized per-layer Kronecker factor sums (A_sum, G_sum).

    ``A_sum = sum_rows a a^T`` over every (sample, repetition) row of the
    captured activations, ``G_sum`` likewise over the sensitivities.  Plain
    per-row sums, so results accumulate exactly across walker chunks —
    this is the ``taps_reducer`` handed to the loss pullback
    (loss_function.py, DEEPQMC_TPU_GRAD_WALKER_CHUNK).  Normalization (the
    total row count) is applied by the caller, which knows the full batch.
    """
    sums = {}
    for m in metas:
        A = jnp.zeros((m.in_dim + (1 if m.has_bias else 0),) * 2)
        G = jnp.zeros((m.out_dim, m.out_dim))
        for call_idx in range(m.n_calls):
            if m.repeats[call_idx] == 0:
                continue
            a = caps[m.path][call_idx]  # [n_batch, *rep, in_dim]
            g = grads[m.path][call_idx]  # [n_batch, *rep, out_dim]
            a = _flat_batch(a, m.in_dim)
            g = _flat_batch(g, m.out_dim)
            if m.has_bias:
                a = jnp.concatenate([a, jnp.ones((a.shape[0], 1), a.dtype)], -1)
            A = A + jnp.dot(a.T, a, precision=jax.lax.Precision.HIGHEST)
            G = G + jnp.dot(g.T, g, precision=jax.lax.Precision.HIGHEST)
        sums[m.path] = (A, G)
    return sums


def _normalize_factor_sums(metas, sums, n_batch):
    """Divide factor sums by the total contributing row count."""
    stats = {}
    for m in metas:
        total = n_batch * sum(r for r in m.repeats if r > 0)
        A, G = sums[m.path]
        stats[m.path] = (A / total, G / total)
    return stats


class KFAC:
    """Kronecker-factored natural-gradient optimizer.

    Args mirror the reference's kfac-jax configuration
    (conf/task/opt/kfac.yaml): ``learning_rate_schedule``,
    ``damping_schedule``, ``norm_constraint``, ``inverse_update_period``.
    """

    def __init__(
        self,
        loss_and_grad_fn,
        *,
        learning_rate_schedule,
        damping_schedule=None,
        norm_constraint: float = 1e-3,
        curvature_ema: float = 0.95,
        inverse_update_period: int = 5,
        estimation_mode: str = 'fisher_exact',
        num_burnin_steps: int = 0,
        min_damping: float = 1e-8,
    ):
        assert estimation_mode == 'fisher_exact'
        self.loss_and_grad_fn = loss_and_grad_fn
        self.lr_schedule = learning_rate_schedule
        self.damping_schedule = damping_schedule or ConstantSchedule(1e-3)
        self.norm_constraint = norm_constraint
        self.curvature_ema = curvature_ema
        self.inverse_update_period = inverse_update_period
        self.num_burnin_steps = num_burnin_steps
        self.min_damping = min_damping
        self._ansatz = None
        self._layer_meta: Optional[list[LayerMeta]] = None

    # -- wiring ------------------------------------------------------------

    def bind_ansatz(self, ansatz):
        """Attach the instrumented ansatz used for curvature estimation."""
        self._ansatz = ansatz

    def _discover_layers(self, params, phys_conf) -> list[LayerMeta]:
        """One single-sample SHAPE trace to learn the dense-layer structure.

        Only shapes are consumed, so the forward runs under
        :func:`jax.eval_shape` — zero FLOPs and zero device dispatches
        (an eager forward here costs minutes of per-op RPC round-trips
        through the TPU tunnel at process start)."""
        assert self._ansatz is not None, 'KFAC needs bind_ansatz() before init'

        def shape_probe(p, pc):
            _, caps = self._ansatz.apply_instrumented(p, None, pc)
            # re-express the static out_shape tuples as abstract zeros so
            # eval_shape carries them as ShapeDtypeStructs, not int leaves
            return {
                path: [(x, jnp.zeros(s)) for x, s in calls]
                for path, calls in caps.items()
            }

        captures = jax.eval_shape(shape_probe, params, phys_conf)
        metas = []
        for path, calls in captures.items():
            bundle = params[path]
            if 'w' not in bundle:
                continue
            in_dim, out_dim = bundle['w'].shape
            repeats, out_shapes = [], []
            for x, out_probe in calls:
                rep = 1
                for d in x.shape[:-1]:
                    rep *= d
                repeats.append(rep)
                out_shapes.append(tuple(out_probe.shape))
            if sum(repeats) == 0:
                # layers applied only to empty edge sets (e.g. same-spin
                # edges with one electron per spin) receive no gradient;
                # treat them as generic parameters
                continue
            metas.append(
                LayerMeta(
                    path,
                    in_dim,
                    out_dim,
                    'b' in bundle,
                    len(calls),
                    tuple(repeats),
                    tuple(out_shapes),
                )
            )
        return metas

    # -- curvature estimation ---------------------------------------------

    def _factor_stats(self, params, phys_conf_flat):
        """Per-layer (A, G) factor statistics over a flat sample batch.

        Standalone estimation path (one instrumented forward + backward);
        used when the loss does not expose fused curvature taps.
        """
        n_batch = len(phys_conf_flat.r)

        def logpsi_sum_and_caps(perturb):
            def single(pc, pert):
                psi, caps = self._ansatz.apply_instrumented(params, pert, pc)
                # keep only the activation arrays (shapes are static metadata)
                caps = {
                    p: [x for x, _ in entries] for p, entries in caps.items()
                }
                return psi.log, caps

            logs, caps = jax.vmap(single, (0, 0))(phys_conf_flat, perturb)
            return logs.sum(), caps

        perturb = {
            m.path: [
                jnp.zeros((n_batch, *shape)) for shape in m.out_shapes
            ]
            for m in self._layer_meta
        }
        grads, caps = jax.grad(logpsi_sum_and_caps, has_aux=True)(perturb)
        sums = factor_sums(self._layer_meta, caps, grads)
        return _normalize_factor_sums(self._layer_meta, sums, n_batch)

    # -- public API --------------------------------------------------------

    def init(self, rng, params_list, batch):
        phys_conf, weight, data = batch
        single_pc = jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[3:])[0], phys_conf
        )
        self._layer_meta = self._discover_layers(params_list[0], single_pc)
        n_states = len(params_list)
        factors = [
            {
                m.path: (
                    jnp.zeros((m.in_dim + (1 if m.has_bias else 0),) * 2),
                    jnp.zeros((m.out_dim, m.out_dim)),
                )
                for m in self._layer_meta
            }
            for _ in range(n_states)
        ]
        inverses = [
            {
                m.path: (
                    jnp.eye(m.in_dim + (1 if m.has_bias else 0)),
                    jnp.eye(m.out_dim),
                )
                for m in self._layer_meta
            }
            for _ in range(n_states)
        ]
        return {
            'step': jnp.array(0),
            'ema_weight': jnp.array(0.0),
            'factors': factors,
            'inverses': inverses,
        }

    def step(self, rng, params_list, opt_state, batch):
        phys_conf, weight, data = batch
        if self._layer_meta is None:
            single_pc = jax.tree_util.tree_map(
                lambda x: x.reshape(-1, *x.shape[3:])[0], phys_conf
            )
            self._layer_meta = self._discover_layers(params_list[0], single_pc)
        metas = self._layer_meta
        step = opt_state['step']
        lr = self.lr_schedule(step)
        damping = jnp.maximum(self.damping_schedule(step), self.min_damping)

        # fused path: the VMC loss reuses its own log-psi pullback residuals
        # for the curvature taps, saving an instrumented forward+backward
        loss_obj = getattr(self.loss_and_grad_fn, '__self__', None)
        if loss_obj is not None and hasattr(loss_obj, 'value_grad_and_taps'):
            taps_spec = {m.path: list(m.out_shapes) for m in metas}
            # the factor-sum reducer runs INSIDE the pullback (per walker
            # chunk when DEEPQMC_TPU_GRAD_WALKER_CHUNK is set), so the
            # full-batch activation captures never materialize in HBM
            from functools import partial as _partial

            (loss, aux), grads_list, tap_sums = loss_obj.value_grad_and_taps(
                params_list, rng, batch, taps_spec, _partial(factor_sums, metas)
            )
            # flat per-state batch: [mol, walker] collapsed (state axis is 1)
            n_flat = phys_conf.batch_shape[0] * phys_conf.batch_shape[2]
            per_state_stats = [
                _normalize_factor_sums(metas, sums, n_flat) for sums in tap_sums
            ]
        else:
            (loss, aux), grads_list = self.loss_and_grad_fn(
                params_list, rng, batch
            )
            per_state_stats = []
            for s, params in enumerate(params_list):
                # all samples of state s across molecules and walkers
                pc_s = jax.tree_util.tree_map(
                    lambda x: x[:, s].reshape(-1, *x.shape[3:]), phys_conf
                )
                per_state_stats.append(self._factor_stats(params, pc_s))

        # --- update curvature factors (EMA over steps) ---
        ema = self.curvature_ema
        new_weight = ema * opt_state['ema_weight'] + (1 - ema)
        factors = []
        for s in range(len(params_list)):
            stats = per_state_stats[s]
            old = opt_state['factors'][s]
            factors.append(
                {
                    path: (
                        ema * old[path][0] + (1 - ema) * stats[path][0],
                        ema * old[path][1] + (1 - ema) * stats[path][1],
                    )
                    for path in stats
                }
            )

        # --- refresh damped inverses (bias-corrected factors) ---
        # small per-layer matrices are latency-bound on TPU: batch the
        # inversions by matrix size with one Cholesky solve per group
        def compute_inverses():
            damped = []  # (state, path, matrix, which) entries
            for s in range(len(params_list)):
                for m in metas:
                    A, G = factors[s][m.path]
                    A = A / new_weight
                    G = G / new_weight
                    scale = float(sum(m.repeats))
                    lam = damping / scale
                    dim_a, dim_g = A.shape[0], G.shape[0]
                    tr_a = jnp.trace(A) / dim_a
                    tr_g = jnp.trace(G) / dim_g
                    pi = jnp.sqrt(
                        jnp.maximum(tr_a, 1e-20) / jnp.maximum(tr_g, 1e-20)
                    )
                    A_damp = A + (pi * jnp.sqrt(lam) + 1e-12) * jnp.eye(dim_a)
                    G_damp = G + (jnp.sqrt(lam) / pi + 1e-12) * jnp.eye(dim_g)
                    damped.append((s, m.path, A_damp, 0))
                    damped.append((s, m.path, G_damp, 1))
            by_dim: dict = {}
            for entry in damped:
                by_dim.setdefault(entry[2].shape[0], []).append(entry)
            results: dict = {}
            for dim, entries in by_dim.items():
                stacked = jnp.stack([e[2] for e in entries])
                chol = jnp.linalg.cholesky(stacked)
                eye = jnp.broadcast_to(jnp.eye(dim), stacked.shape)
                invs = jax.scipy.linalg.cho_solve((chol, True), eye)
                for e, inv in zip(entries, invs):
                    results[(e[0], e[1], e[3])] = inv
            return [
                {
                    m.path: (
                        results[(s, m.path, 0)],
                        results[(s, m.path, 1)],
                    )
                    for m in metas
                }
                for s in range(len(params_list))
            ]

        if self.inverse_update_period == 1:
            inverses = compute_inverses()
        else:
            inverses = jax.lax.cond(
                step % self.inverse_update_period == 0,
                lambda: compute_inverses(),
                lambda: opt_state['inverses'],
            )

        # --- precondition the gradient ---
        dense_paths = {m.path for m in metas}
        meta_of = {m.path: m for m in metas}
        updates_list = []
        for s, grads in enumerate(grads_list):
            updates = {}
            for path, bundle in grads.items():
                if path in dense_paths:
                    m = meta_of[path]
                    A_inv, G_inv = inverses[s][path]
                    W = bundle['w']
                    if m.has_bias:
                        W = jnp.concatenate([W, bundle['b'][None, :]], axis=0)
                    scale = float(sum(m.repeats))
                    V = A_inv @ W @ G_inv / scale
                    if m.has_bias:
                        updates[path] = {'w': V[:-1], 'b': V[-1]}
                    else:
                        updates[path] = {'w': V}
                else:
                    # generic parameters: identity curvature
                    updates[path] = jax.tree_util.tree_map(
                        lambda g: g / (1 + damping), bundle
                    )
            updates_list.append(updates)

        # --- trust region: lr^2 v^T (F + lambda) v <= norm_constraint ---
        # v solves the damped system, so v^T (F+lambda) v == v . grad
        v_dot_g = sum(
            jnp.vdot(v, g)
            for upd, grd in zip(updates_list, grads_list)
            for v, g in zip(
                jax.tree_util.tree_leaves(upd), jax.tree_util.tree_leaves(grd)
            )
        )
        v_dot_g = jnp.maximum(v_dot_g, 1e-20)
        coeff = jnp.minimum(
            1.0, jnp.sqrt(self.norm_constraint / (lr**2 * v_dot_g))
        )

        new_params_list = [
            jax.tree_util.tree_map(lambda p, v: p - lr * coeff * v, params, upd)
            for params, upd in zip(params_list, updates_list)
        ]
        new_state = {
            'step': step + 1,
            'ema_weight': new_weight,
            'factors': factors,
            'inverses': inverses,
        }
        stats = {
            'opt/lr': lr * coeff,
            'opt/damping': damping,
            'opt/norm_scale': coeff,
            'opt/v_dot_g': v_dot_g,
            'opt/param_norm': _tree_norm(params_list),
            'opt/grad_norm': _tree_norm(grads_list),
            'opt/update_norm': _tree_norm(updates_list) * lr * coeff,
        }
        return new_params_list, new_state, aux, stats


def _tree_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(leaf**2) for leaf in jax.tree_util.tree_leaves(tree))
    )
