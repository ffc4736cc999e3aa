"""1-vs-N-device equivalence of the full fused training step.

The multi-chip dryrun only checks that the sharded program compiles and
produces a finite energy; this test is the actual correctness guarantee:
the SAME initial params and walker batch stepped through the full fused
step (sampling + VMC loss + KFAC curvature/preconditioning + param update)
on a 1-device mesh and on the full 8-virtual-device mesh must produce the
same parameter update (up to f64 reduction reassociation).

The reference has no distributed test at all (SURVEY.md §4); KFAC curvature
factors are the risk surface here — a per-device (instead of global) second
moment would silently change the preconditioner.
"""

from functools import partial

import jax
import numpy as np
import pytest

from deepqmc_tpu.fit import fit_wf
from deepqmc_tpu.kfac import KFAC
from deepqmc_tpu.loss import create_loss_fn, median_log_squeeze_and_mask
from deepqmc_tpu.optimizer import KFACOptimizer, OptaxOptimizer
from deepqmc_tpu.parallel import get_mesh, set_default_mesh
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.sampling import (
    DecorrSampler,
    MetropolisSampler,
    combine_samplers,
    initialize_sampler_state,
    initialize_sampling,
)
from deepqmc_tpu.types import TrainState
from deepqmc_tpu.utils import ConstantSchedule, InverseSchedule
from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz


@pytest.fixture
def restore_mesh():
    yield
    set_default_mesh(None)


def _run_steps(helpers, n_devices, opt_name, n_steps=1, walkers=16):
    set_default_mesh(get_mesh(jax.devices()[:n_devices]))
    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default',
            n_determinants=1,
            embedding_dim=8,
            n_interactions=1,
            two_particle_stream_dim=4,
        ),
    )
    mols = [hamil.mol]
    mol_idx_sampler, sampler = initialize_sampling(
        jax.random.PRNGKey(0),
        hamil,
        ansatz,
        mols,
        electronic_states=1,
        molecule_batch_size=1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=1), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(jax.random.PRNGKey(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(
        jax.random.PRNGKey(2), sampler, params, walkers, mols
    )
    if opt_name == 'kfac':
        opt_factory = partial(
            KFACOptimizer,
            kfac=partial(
                KFAC,
                learning_rate_schedule=InverseSchedule(0.05, 10000),
                damping_schedule=ConstantSchedule(1e-3),
                norm_constraint=1e-3,
            ),
        )
    else:
        import optax

        opt_factory = partial(OptaxOptimizer, optax_opt=optax.adam(1e-2))
    final_params = None
    last = None
    for _step, train_state, _mol_idxs, stats, _obs in fit_wf(
        jax.random.PRNGKey(3),
        hamil,
        ansatz,
        opt_factory,
        mol_idx_sampler,
        sampler,
        range(n_steps),
        TrainState(smpl_state, params, None),
        partial(create_loss_fn, clip_mask_fn=median_log_squeeze_and_mask),
        [],
        block_size=1,
    ):
        final_params = train_state.params
        last = stats
    return jax.device_get(final_params), last


@pytest.mark.heavy
@pytest.mark.parametrize('opt_name', ['adam', 'kfac'])
def test_one_vs_eight_device_step_equivalence(helpers, restore_mesh, opt_name):
    params_1, stats_1 = _run_steps(helpers, 1, opt_name)
    params_8, stats_8 = _run_steps(helpers, 8, opt_name)
    flat_1, tree_1 = jax.tree_util.tree_flatten(params_1)
    flat_8, tree_8 = jax.tree_util.tree_flatten(params_8)
    assert tree_1 == tree_8
    for a, b in zip(flat_1, flat_8):
        # identical math up to f64 reduction reassociation across shards,
        # amplified by two steps of KFAC Cholesky inverses
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        stats_1['local_energy/mean'], stats_8['local_energy/mean'], rtol=1e-8
    )
