"""Checkpoint/restore: topology-independence and the restart/evaluate tasks.

Covers what the reference only implements but never tests (reference
log.py:39-73, app.py:85-124): a checkpoint written under one device mesh must
restore onto a different mesh with identical values, and the CLI
``task=restart`` / ``task=evaluate`` paths must resume from a prior workdir.
"""

import os
import pickle
import subprocess
import sys
from functools import partial

import jax
import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_train_state(helpers):
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.sampling import (
        DecorrSampler,
        MetropolisSampler,
        combine_samplers,
        initialize_sampler_state,
        initialize_sampling,
    )
    from deepqmc_tpu.types import TrainState
    from deepqmc_tpu.wf import init_wf_params, instantiate_ansatz

    hamil = helpers.hamil(mol=helpers.mol('H2'))
    ansatz = instantiate_ansatz(
        hamil,
        ansatz_preset(
            'default',
            n_determinants=2,
            embedding_dim=16,
            n_interactions=1,
            two_particle_stream_dim=8,
        ),
    )
    mols = [hamil.mol]
    _, sampler = initialize_sampling(
        helpers.rng(0), hamil, ansatz, mols, 1, 1,
        elec_sampler=partial(
            combine_samplers,
            [DecorrSampler(length=1), partial(MetropolisSampler, tau=1.0)],
        ),
    )
    params = init_wf_params(helpers.rng(1), hamil, ansatz, 1)
    smpl_state = initialize_sampler_state(helpers.rng(2), sampler, params, 16, mols)
    return TrainState(smpl_state, params, None)


def test_checkpoint_roundtrip_across_mesh_sizes(tmp_path, tiny_train_state):
    """Save on the full 8-device mesh, restore onto a 4-device mesh."""
    from deepqmc_tpu import parallel
    from deepqmc_tpu.log import CheckpointStore

    store = CheckpointStore(str(tmp_path), interval=1)
    store.update(0, tiny_train_state)
    (chkpt,) = list(tmp_path.glob('chkpt-*.pt'))

    full_mesh = parallel.get_mesh()
    half_mesh = parallel.get_mesh(jax.devices()[:4])
    try:
        parallel.set_default_mesh(half_mesh)
        step, restored = CheckpointStore.load(chkpt)
    finally:
        parallel.set_default_mesh(full_mesh)

    assert step == 0
    # same pytree structure, same shapes, same values
    orig_leaves = jax.tree_util.tree_leaves_with_path(tiny_train_state)
    rest_leaves = jax.tree_util.tree_leaves_with_path(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for (path_o, leaf_o), (path_r, leaf_r) in zip(orig_leaves, rest_leaves):
        assert path_o == path_r
        assert leaf_o.shape == leaf_r.shape, path_o
        np.testing.assert_allclose(
            np.asarray(leaf_o), np.asarray(leaf_r), err_msg=str(path_o)
        )
    # the walker axis is actually sharded over the half mesh
    r_sharding = restored.sampler['elec']['r'].sharding
    assert len(r_sharding.device_set) == 4


def _run_cli(workdir, *overrides, timeout=900):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        'import jax; jax.config.update("jax_platforms", "cpu");'
        'from deepqmc_tpu.app import cli; cli()'
    )
    return subprocess.run(
        [sys.executable, '-c', code, *overrides, f'--workdir={workdir}'],
        cwd=repo_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


TINY = [
    'hamil/mol=H2',
    'task.electron_batch_size=8',
    '+task.max_eq_steps=1',
    'task.pretrain_steps=null',
    'ansatz.n_determinants=2',
    'ansatz.omni_factory.embedding_dim=16',
    'ansatz.omni_factory.gnn_factory.n_interactions=1',
]


@pytest.mark.slow
def test_restart_and_evaluate_from_workdir(tmp_path):
    train_dir = tmp_path / 'run1'
    result = _run_cli(
        train_dir, *TINY, 'task.steps=3', 'task/opt=adamw',
    )
    assert result.returncode == 0, result.stderr[-3000:]
    chkpts = list((train_dir / 'training').glob('chkpt-*.pt'))
    assert chkpts, os.listdir(train_dir / 'training')

    # resume training from the last checkpoint in a fresh workdir; the
    # original run's config is recovered from the restdir
    restart_dir = tmp_path / 'run2'
    result = _run_cli(
        restart_dir, 'task=restart', '+task.steps=5',
        f'task.restdir={train_dir}',
    )
    assert result.returncode == 0, result.stderr[-3000:]
    with open(restart_dir / 'deepqmc.log') as f:
        log_text = f.read()
    assert 'Restart training from step 3' in log_text
    assert 'The training has been completed!' in log_text

    # evaluate (no optimizer) from the same checkpoint
    eval_dir = tmp_path / 'run3'
    result = _run_cli(
        eval_dir, 'task=evaluate', '+task.steps=2',
        f'task.restdir={train_dir}',
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert (eval_dir / 'evaluation' / 'result.h5').exists() or (
        eval_dir / 'training' / 'result.h5'
    ).exists()
    with open(eval_dir / 'deepqmc.log') as f:
        log_text = f.read()
    assert 'The evaluation has been completed!' in log_text


def test_checkpoint_pickle_is_host_only(tmp_path, tiny_train_state):
    """Checkpoints must hold plain numpy leaves (portable across backends)."""
    from deepqmc_tpu.log import serialize_train_state

    state = serialize_train_state(tiny_train_state)
    for leaf in jax.tree_util.tree_leaves(state):
        assert isinstance(leaf, np.ndarray), type(leaf)
    # round-trips through pickle without touching jax
    blob = pickle.dumps(state)
    assert pickle.loads(blob) is not None


def test_serialize_packs_many_mixed_leaves():
    """The packed per-dtype fetch must round-trip values, shapes, and dtypes
    for KFAC-scale trees (hundreds of leaves, mixed dtypes, scalars)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepqmc_tpu.log import serialize_train_state
    from deepqmc_tpu.types import TrainState

    rng = np.random.default_rng(0)
    opt = {}
    for i in range(150):
        opt[f'layer{i}/A'] = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
        opt[f'layer{i}/count'] = jnp.asarray(i, jnp.int32)
    opt['flag'] = jnp.asarray(True)
    opt['py_scalar'] = 3
    state = TrainState(
        {'elec': {'r': jnp.ones((1, 1, 4, 2, 3))},
         'nuc': {'R': jnp.ones((1, 2, 3))},
         'update_nuc_counter': jnp.asarray(0)},
        {'w': jnp.asarray(rng.normal(size=(3, 2)), jnp.float64)},
        opt,
    )
    out = serialize_train_state(state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(out)):
        if hasattr(a, 'shape'):
            assert np.asarray(b).shape == a.shape
            assert np.asarray(b).dtype == a.dtype
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        else:
            assert a == b
