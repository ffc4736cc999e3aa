"""The per-step training loop: ONE fused jitted step, optionally scanned.

Reference: /root/reference/src/deepqmc/fit.py.  The reference dispatches at
least four separate pmap programs per step (sample, weight normalization,
optimizer step, sampler refresh; fit.py:46-92) plus one per observable
monitor — each a host-device round trip.  Here sampling, weighting, the
optimizer step (including KFAC curvature updates), the sampler psi-cache
refresh AND the EWM energy estimator compile into a single ``jax.jit``
program over the device mesh, with walkers sharded on the 'data' axis and
parameters replicated.

``block_size > 1`` additionally wraps ``block_size`` optimization steps in a
``lax.scan``, so the host only synchronizes once per block — essential when
host-device latency is high.  Inside a block the built-in energy /
wave-function statistics are recorded every step; additional observable
monitors run on the last step of each block.
"""

import logging
import os
import time
from collections.abc import Generator, Iterable
from functools import partial
from typing import Type

import jax
import jax.numpy as jnp
import numpy as np

from .ewm import init_multi_mol_multi_state_ewm
from .loss import LossFunctionFactory
from .observable import ObservableMonitor
from .optimizer import NoOptimizer, Optimizer
from .parallel import pexp_normalize_mean, rng_iterator
from .types import Ansatz, KeyArray, Stats, TrainState
from .utils import sampling_precision_ctx, split_dict

__all__ = ()

log = logging.getLogger(__name__)

# capture a device trace of this (0-based) post-compile block when set;
# inspect with tensorboard or scripts/trace_eloc.py's xplane parser
PROFILE_DIR_ENV = 'DEEPQMC_TPU_PROFILE_DIR'
PROFILE_BLOCK = 1


def fit_wf(  # noqa: C901
    rng: KeyArray,
    hamil,
    ansatz: Ansatz,
    optimizer_factory: Type[Optimizer],
    molecule_idx_sampler,
    sampler,
    steps: Iterable,
    train_state: TrainState,
    loss_function_factory: LossFunctionFactory,
    observable_monitors: list[ObservableMonitor],
    block_size: int = 1,
    aot_cache=None,
) -> Generator[tuple[int, TrainState, jax.Array, Stats, dict], None, None]:
    loss_fn = loss_function_factory(hamil, ansatz)
    # VMCLoss provides the direct (single-vjp) gradient estimator; fall back
    # to AD for plain callables so custom loss factories keep working
    loss_and_grad_fn = getattr(
        loss_fn, 'value_and_grad', None
    ) or jax.value_and_grad(loss_fn, has_aux=True)
    opt = optimizer_factory(loss_and_grad_fn)
    if hasattr(opt, 'bind_ansatz'):
        opt.bind_ansatz(ansatz)
    is_evaluation = isinstance(opt, NoOptimizer)
    # energy and wave-function statistics are fused into the jitted step;
    # only genuinely extra monitors run at block boundaries
    from .observable import EnergyMonitor, WaveFunctionMonitor

    observable_monitors = [
        m
        for m in observable_monitors
        if not isinstance(m, (EnergyMonitor, WaveFunctionMonitor))
    ]

    smpl_state, params, opt_state = train_state
    n_states = smpl_state['elec']['r'].shape[1]
    ewm_state, update_ewm = init_multi_mol_multi_state_ewm(
        shape=(molecule_idx_sampler.n_mols, n_states)
    )
    std_ewm_state, _ = init_multi_mol_multi_state_ewm(
        shape=(molecule_idx_sampler.n_mols, n_states)
    )

    def step_body(carry, inputs):
        train_state, ewm_state, std_ewm_state = carry
        rng_step, mol_idxs = inputs
        smpl_state, params, opt_state = train_state
        rng_sample, rng_loss = jax.random.split(rng_step)
        data = {'energy_ewm': ewm_state.mean, 'std_ewm': std_ewm_state.mean}
        data_it = jax.tree_util.tree_map(lambda x: x[mol_idxs], data)
        with sampling_precision_ctx():
            smpl_state, phys_conf, smpl_stats = sampler.sample(
                rng_sample, smpl_state, params, mol_idxs
            )
        if 'log_weight' in smpl_state['elec']:
            # resampled samplers carry per-walker importance weights
            weight = pexp_normalize_mean(
                smpl_state['elec']['log_weight'][mol_idxs], axis=-1
            )
        else:
            weight = jnp.ones(phys_conf.batch_shape)
        params, opt_state, E_loc, ratios, stats = opt.step(
            rng_loss, params, opt_state, (phys_conf, weight, data_it)
        )
        if not is_evaluation:
            # parameters changed: refresh the sampler's cached psi values
            # (same precision as sampling, so acceptance ratios stay unbiased)
            with sampling_precision_ctx():
                smpl_state = sampler.update(smpl_state, params)
        # built-in energy & wave-function monitors, fused into the step
        psi = smpl_state['elec']['psi']
        stats = {
            **stats,
            **smpl_stats,
            'local_energy/mean': E_loc.mean(-1),
            'local_energy/std': E_loc.std(-1),
            'local_energy/min': E_loc.min(-1),
            'local_energy/max': E_loc.max(-1),
        }
        ewm_state = update_ewm(stats['local_energy/mean'], ewm_state, mol_idxs)
        std_ewm_state = update_ewm(stats['local_energy/std'], std_ewm_state, mol_idxs)
        stats |= {
            'energy/ewm': ewm_state.mean[mol_idxs],
            'energy/ewm_error': jnp.sqrt(ewm_state.sqerr[mol_idxs]),
            'energy/std_ewm': std_ewm_state.mean[mol_idxs],
        }
        outputs = {
            'stats': stats,
            'E_loc': E_loc,
            'ratios': ratios if ratios is not None else jnp.zeros(()),
            'psi_log': psi.log,
            'psi_sign': psi.sign,
        }
        heavy = {'phys_conf': phys_conf}
        return (
            (TrainState(smpl_state, params, opt_state), ewm_state, std_ewm_state),
            (outputs, heavy),
        )

    def _pack(stats):
        """Concatenate all stats leaves into one array (one host fetch)."""
        layout = [
            (key, jnp.shape(stats[key])[1:]) for key in sorted(stats)
        ]  # [k, ...] per leaf; static layout
        flat = jnp.concatenate(
            [stats[key].reshape(stats[key].shape[0], -1) for key, _ in layout],
            axis=1,
        )
        return layout, flat

    def _unpack(layout, flat_row):
        out = {}
        offset = 0
        for key, shape in layout:
            size = int(np.prod(shape, dtype=int))
            out[key] = np.asarray(flat_row[offset : offset + size]).reshape(shape)
            offset += size
        return out

    layout_box: dict = {}

    # note: the carry is deliberately NOT donated — CheckpointStore keeps a
    # live reference to yielded TrainStates for its close-time dump
    @jax.jit
    def train_block(rngs, mol_idxs_block, carry):
        carry, (outputs, heavy) = jax.lax.scan(
            step_body, carry, (rngs, mol_idxs_block)
        )
        # only the final step's configuration feeds the periodic monitors —
        # keep one step, not the whole block, so the pipelined loop's two
        # in-flight blocks cost 2 single-step buffers instead of 2 x k
        heavy = jax.tree_util.tree_map(lambda x: x[-1], heavy)
        stats = outputs.pop('stats')
        layout, outputs['stats_flat'] = _pack(
            {k: jnp.asarray(v, jnp.float32) for k, v in stats.items()}
        )
        layout_box['layout'] = layout  # static metadata, set at trace time
        return carry, (outputs, heavy)

    # AOT executable cache (aot.py): a warm start loads the fully compiled
    # block — no Python trace of the forward-Laplacian jaxpr, no XLA compile.
    # Short trailing blocks (k < block_size) fall back to the jitted path.
    block_fn_box: dict = {'fn': None, 'k': None}

    def resolve_block_fn(rngs, mol_idxs_block, carry):
        k = len(rngs)
        if block_fn_box['fn'] is not None and block_fn_box['k'] == k:
            return block_fn_box['fn']
        fn = train_block
        if aot_cache is not None and k == block_size:
            hit = aot_cache.load(rngs, mol_idxs_block, carry)
            if hit is not None:
                fn, meta = hit
                layout_box['layout'] = meta['layout']
            else:
                t0 = time.perf_counter()
                lowered = train_block.lower(rngs, mol_idxs_block, carry)
                t1 = time.perf_counter()
                log.info(f'Traced training block in {t1 - t0:.0f}s')
                # second-chance executable hit keyed on the traced program:
                # survives source edits that don't change the program
                hit = aot_cache.load_for_lowered(
                    lowered, rngs, mol_idxs_block, carry
                )
                if hit is not None:
                    fn, meta = hit
                    layout_box['layout'] = meta['layout']
                else:
                    fn = lowered.compile()
                    log.info(
                        f'Compiled training block in '
                        f'{time.perf_counter() - t1:.0f}s'
                    )
                    aot_cache.save(
                        fn,
                        {'layout': layout_box['layout']},
                        rngs,
                        mol_idxs_block,
                        carry,
                        jitted=train_block,
                        lowered=lowered,
                    )
        block_fn_box.update(fn=fn, k=k)
        return fn

    if opt_state is None:
        rng, rng_sample, rng_opt = jax.random.split(rng, 3)
        mol_idxs = molecule_idx_sampler.sample()
        data = {'energy_ewm': ewm_state.mean, 'std_ewm': std_ewm_state.mean}
        data_it = jax.tree_util.tree_map(lambda x: x[mol_idxs], data)
        # every opt.init consumes only the SHAPES of the batch (optimizer.py;
        # KFAC layer discovery inspects activation shapes) — eval_shape skips
        # compiling-and-running a whole sampling program at startup
        _, init_pc_shapes, _ = jax.eval_shape(
            sampler.sample, rng_sample, smpl_state, params, mol_idxs
        )
        init_phys_conf = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), init_pc_shapes
        )
        opt_state = opt.init(
            rng_opt,
            params,
            (init_phys_conf, jnp.ones(init_phys_conf.batch_shape), data_it),
        )
    carry = (TrainState(smpl_state, params, opt_state), ewm_state, std_ewm_state)

    steps_iter = iter(steps)
    rngs_iter = rng_iterator(rng)
    profile_dir = os.environ.get(PROFILE_DIR_ENV)
    block_counter = 0

    def next_block_inputs():
        """(steps, rngs, mol_idxs) of the next block, or None at the end."""
        block_steps = []
        for _ in range(block_size):
            try:
                block_steps.append(next(steps_iter))
            except StopIteration:
                break
        if not block_steps:
            return None
        k = len(block_steps)
        return (
            block_steps,
            jnp.stack([next(rngs_iter) for _ in range(k)]),
            jnp.stack([molecule_idx_sampler.sample() for _ in range(k)]),
        )

    def dispatch(inputs, carry, counter):
        """Enqueue one block; returns device-array handles immediately
        (async dispatch), so the host can log the PREVIOUS block while the
        device crunches this one."""
        _, rngs, mol_idxs_block = inputs
        block_fn = resolve_block_fn(rngs, mol_idxs_block, carry)
        if profile_dir and counter == PROFILE_BLOCK:
            log.info(f'Capturing jax.profiler trace of block {counter}')
            with jax.profiler.trace(profile_dir):
                carry, out = block_fn(rngs, mol_idxs_block, carry)
                jax.block_until_ready(out)
        else:
            carry, out = block_fn(rngs, mol_idxs_block, carry)
        return carry, out

    # software-pipelined loop: while the host fetches and logs block N, the
    # device already executes block N+1 — without this, every block pays the
    # full host-side logging time as device idle time.  Pipelining keeps two
    # blocks' outputs alive on device at once; configs tuned near the HBM
    # limit can opt out (DEEPQMC_TPU_NO_PIPELINE=1) to fetch block N before
    # block N+1 is dispatched.
    pipelined = not os.environ.get('DEEPQMC_TPU_NO_PIPELINE')
    inflight = next_block_inputs()
    if inflight is not None:
        block_start = time.perf_counter()
        carry, (outputs, heavy) = dispatch(inflight, carry, block_counter)
        block_counter += 1
    while inflight is not None:
        block_steps, _, mol_idxs_block = inflight
        k = len(block_steps)
        train_state = carry[0]
        pending = None
        pending_exc = None

        def dispatch_pending():
            nonlocal pending, pending_exc, block_counter
            pending = next_block_inputs()
            if pending is None:
                return None
            try:
                out = dispatch(pending, carry, block_counter)
                block_counter += 1
                return out
            except Exception as exc:  # noqa: BLE001
                # don't lose block N's finished steps to a failed dispatch of
                # block N+1 — yield them first, re-raise after
                pending_exc = exc
                pending = None
                return None

        if pipelined:
            dispatched = dispatch_pending()
            if dispatched is not None:
                next_carry, next_out = dispatched
        # the heavy per-step phys_confs stay on device; only the last step's
        # configuration feeds the periodic monitors
        outputs = jax.device_get(outputs)
        if not pipelined:
            dispatched = dispatch_pending()
            if dispatched is not None:
                next_carry, next_out = dispatched
        block_time = time.perf_counter() - block_start
        block_start = time.perf_counter()
        n_walkers = int(np.prod(train_state.sampler['elec']['r'].shape[:3]))
        for b, step in enumerate(block_steps):
            stats = _unpack(layout_box['layout'], outputs['stats_flat'][b])
            stats['perf/step_time'] = block_time / k
            stats['perf/walker_steps_per_sec'] = n_walkers / (block_time / k)
            mol_idxs = mol_idxs_block[b]
            observable_samples = {
                'local_energy/samples': outputs['E_loc'][b],
                'psi/samples': {
                    'sign': outputs['psi_sign'][b],
                    'log': outputs['psi_log'][b],
                },
            }
            if b == k - 1 and observable_monitors:
                last_phys_conf = heavy['phys_conf']
                ratios = (
                    None
                    if np.ndim(outputs['ratios']) == 1
                    else jnp.asarray(outputs['ratios'][b])
                )
                for monitor in observable_monitors:
                    extra = monitor(
                        step,
                        train_state.params,
                        last_phys_conf,
                        train_state.sampler['elec']['psi'],
                        jnp.asarray(outputs['E_loc'][b]),
                        ratios,
                    )
                    extra_samples, extra_stats = split_dict(
                        extra, lambda key: 'samples' in key
                    )
                    stats |= jax.device_get(extra_stats)
                    observable_samples |= jax.device_get(extra_samples)
            yield step, train_state, mol_idxs, stats, observable_samples
        if pending_exc is not None:
            raise pending_exc
        inflight = pending
        if pending is not None:
            carry, (outputs, heavy) = next_carry, next_out
