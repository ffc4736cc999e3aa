"""Supervised pretraining of the ansatz orbitals to the SCF baseline.

Reference: /root/reference/src/deepqmc/pretrain/pretraining.py.  The step
runs as two jitted programs (sampling; orbital MSE + update) — see the
comment at the definition site; the reference dispatches a pmap per step.
"""

import logging
import math
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..parallel import rng_iterator
from ..types import Ansatz
from .pretraining_target import PretrainTarget

__all__ = ['pretrain']

log = logging.getLogger(__name__)


def pretrain(  # noqa: C901
    rng,
    hamil,
    ansatz: Ansatz,
    params,
    opt,
    molecule_idx_sampler,
    sampler,
    smpl_state,
    dataset,
    *,
    steps,
):
    """Generator yielding (step, params, per_sample_losses, mol_idxs)."""
    target_fn = PretrainTarget(
        hamil, None, dataset['centers'], dataset['shells'], dataset['mo_coeffs']
    )
    confs = dataset['confs']  # [n_mols, n_states, n_det, n_el]
    conf_coeffs = dataset['conf_coeffs']

    def loss_fn(params, phys_conf):
        def state_target(state_idx, pc):
            return jax.vmap(  # electron batch
                partial(target_fn, confs[:, state_idx], conf_coeffs[:, state_idx])
            )(pc)

        target = jax.vmap(  # molecule batch
            jax.vmap(state_target, (0, 0)),  # electronic states
            (None, 0),
        )(jnp.arange(phys_conf.batch_shape[1]), phys_conf)
        orbs = jax.vmap(  # molecule batch
            jax.vmap(  # electronic state
                jax.vmap(ansatz.apply, (None, 0, None)),  # electron batch
                (0, 0, None),
            ),
            (None, 0, None),
        )(params, phys_conf, True)
        *_, n_det, n_up, n_orb_up = orbs[0].shape
        n_det_target = target.shape[-3]
        target = jnp.tile(target, (math.ceil(n_det / n_det_target), 1, 1))[
            ..., :n_det, :, :
        ]
        n_up = hamil.n_up
        target = (target[..., :n_up, :n_up], target[..., n_up:, n_up:])
        if n_orb_up != n_up:
            # full determinants: off-diagonal blocks are pretrained to zero
            pad0 = [(0, 0)] * (target[0].ndim - 1)
            target = (
                jnp.pad(target[0], pad0 + [(0, n_orb_up - n_up)]),
                jnp.pad(target[1], pad0 + [(n_up, 0)]),
            )
        losses = jax.tree_util.tree_map(lambda o, t: (o - t) ** 2, orbs, target)
        loss = sum(map(jnp.mean, losses))
        per_sample_losses = sum(map(partial(jnp.mean, axis=(-3, -2, -1)), losses))
        return loss, per_sample_losses

    loss_and_grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    assert isinstance(opt, optax.GradientTransformation)
    opt_state = opt.init(params)

    # TWO jitted programs instead of one fused step: the combined
    # sample+loss+update program hit a pathological (tens-of-minutes) XLA:TPU
    # compile on larger systems (ScO/benzene, round 4), and splitting both
    # halves the peak program size and lets the log attribute which half
    # compiles slowly.  Pretraining is compile-bound, not dispatch-bound, so
    # the extra per-step dispatch is noise.
    @jax.jit
    def sample_step(rng, smpl_state, params, mol_idxs):
        return sampler.sample(rng, smpl_state, params, mol_idxs)

    # the orbital-MSE gradient's vjp residuals (every layer activation of
    # [mol, state, walker] forwards) are the pretrain HBM peak — benzene at
    # 2 states x 512 walkers OOM'd exactly here (the round-4 'jit(update_step)'
    # dump).  The loss is a mean over walkers, so equal-size walker chunks
    # give the exact gradient as the mean of chunk gradients; lax.scan bounds
    # the peak to one chunk.  Same lever as the VMC-loss pullback
    # (loss/loss_function.py): DEEPQMC_TPU_GRAD_WALKER_CHUNK.
    chunk = int(os.environ.get('DEEPQMC_TPU_GRAD_WALKER_CHUNK', '0'))

    @jax.jit
    def update_step(params, opt_state, phys_conf):
        n_w = phys_conf.batch_shape[2]
        size = (
            max(d for d in range(1, min(chunk, n_w) + 1) if n_w % d == 0)
            if chunk
            else n_w
        )
        if size == n_w:
            (_, per_sample_losses), grads = loss_and_grad_fn(params, phys_conf)
        else:
            resh = lambda x: jnp.moveaxis(
                x.reshape(*x.shape[:2], n_w // size, size, *x.shape[3:]), 2, 0
            )
            pc_chunks = jax.tree_util.tree_map(resh, phys_conf)

            def chunk_term(pc_c):
                (_, psl), g = loss_and_grad_fn(params, pc_c)
                return g, psl

            first_pc = jax.tree_util.tree_map(lambda x: x[0], pc_chunks)
            g_shapes, _ = jax.eval_shape(chunk_term, first_pc)
            g_zero = jax.tree_util.tree_map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), g_shapes
            )

            def body(carry, pc_c):
                g, psl = chunk_term(pc_c)
                return jax.tree_util.tree_map(jnp.add, carry, g), psl

            g_sum, psl_stack = jax.lax.scan(body, g_zero, pc_chunks)
            grads = jax.tree_util.tree_map(lambda x: x / (n_w // size), g_sum)
            # [n_chunks, mol, state, size] -> [mol, state, walker]
            per_sample_losses = jnp.moveaxis(psl_stack, 0, 2).reshape(
                *psl_stack.shape[1:3], -1
            )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, per_sample_losses

    first = True
    for step, rng_step in zip(steps, rng_iterator(rng)):
        mol_idxs = molecule_idx_sampler.sample()
        _, rng_sample = jax.random.split(rng_step)
        t0 = time.perf_counter()
        smpl_state, phys_conf, _ = sample_step(
            rng_sample, smpl_state, params, mol_idxs
        )
        if first:
            jax.block_until_ready(phys_conf.r)
            t1 = time.perf_counter()
            log.info(f'Pretrain sampling program ready in {t1 - t0:.0f}s')
        params, opt_state, per_sample_losses = update_step(
            params, opt_state, phys_conf
        )
        if first:
            jax.block_until_ready(per_sample_losses)
            log.info(
                f'Pretrain update program ready in {time.perf_counter() - t1:.0f}s'
            )
            first = False
        yield step, params, per_sample_losses, mol_idxs
