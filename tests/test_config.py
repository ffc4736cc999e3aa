from functools import partial

import numpy as np
import pytest

from deepqmc_tpu.config import MissingValueError, compose, instantiate
from deepqmc_tpu.hamil import MolecularHamiltonian
from deepqmc_tpu.molecule import Molecule


def test_compose_defaults():
    cfg = compose(user_conf_dir=None)
    assert cfg['task']['_target_'] == 'deepqmc_tpu.app.train_from_factories'
    assert cfg['hamil']['mol']['charges'] == [3, 1]  # LiH default
    assert cfg['ansatz']['n_determinants'] == 16
    assert cfg['task']['opt']['_target_'] == 'deepqmc_tpu.optimizer.KFACOptimizer'


def test_group_override_recomposes():
    cfg = compose(overrides=['hamil/mol=H2'], user_conf_dir=None)
    # the group override must merge with qc.yaml's mol _target_
    assert cfg['hamil']['mol']['charges'] == [1, 1]
    assert cfg['hamil']['mol']['_target_'] == 'deepqmc_tpu.molecule.Molecule'


def test_value_and_add_overrides():
    cfg = compose(
        overrides=['task.steps=5', '+task.max_eq_steps=7', 'task/opt=adamw'],
        user_conf_dir=None,
    )
    assert cfg['task']['steps'] == 5
    assert cfg['task']['max_eq_steps'] == 7
    assert cfg['task']['opt']['optax_opt']['_target_'] == 'optax.adamw'


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        compose(overrides=['task.not_a_key=1'], user_conf_dir=None)


def test_ansatz_group_switch():
    cfg = compose(overrides=['ansatz=psiformer'], user_conf_dir=None)
    # psiformer uses attention update features
    layer = cfg['ansatz']['omni_factory']['gnn_factory']['layer_factory']
    assert 'NodeAttention' in layer['update_features'][0]['_target_']


def test_instantiate_hamil():
    cfg = compose(overrides=['hamil/mol=H2'], user_conf_dir=None)
    hamil = instantiate(cfg['hamil'], root=cfg)
    assert isinstance(hamil, MolecularHamiltonian)
    assert hamil.n_up == 1 and hamil.n_down == 1


def test_instantiate_full_ansatz_factory(helpers):
    cfg = compose(user_conf_dir=None)
    ansatz_factory = instantiate(cfg['ansatz'], root=cfg)
    assert isinstance(ansatz_factory, partial)
    # build the real module inside a transform
    from deepqmc_tpu.wf import instantiate_ansatz

    hamil = helpers.hamil()
    ansatz = instantiate_ansatz(hamil, ansatz_factory)
    pc = helpers.phys_conf(hamil)
    params = ansatz.init(helpers.rng(0), pc)
    psi = ansatz.apply(params, pc)
    assert np.isfinite(float(psi.log))


def test_eval_resolver():
    node = {'f': '${eval:"lambda x: x + 1"}'}
    out = instantiate(node)
    assert out['f'](1) == 2


def test_reference_custom_resolvers():
    # reference conf/custom_resolvers.py: ${mode_subdir:} / ${process_idx_suffix:}
    node = {'task': {'evaluate': True}, 'sub': '${mode_subdir:}'}
    assert instantiate(node)['sub'] == 'evaluation'
    node = {'task': {'steps': 5}, 'sub': '${mode_subdir:}'}
    assert instantiate(node)['sub'] == 'training'
    assert instantiate({'s': '${process_idx_suffix:}'})['s'] == ''


def test_missing_value_raises():
    with pytest.raises(MissingValueError):
        instantiate({'x': '???'})


def test_legacy_reference_targets_resolve():
    """Reference configs (deepqmc.* / haiku.* / kfac_jax.*) run unchanged."""
    from deepqmc_tpu.config import resolve_target
    from deepqmc_tpu.kfac import KFAC
    from deepqmc_tpu.nn import MLP, Linear

    assert resolve_target('deepqmc.hkext.MLP') is MLP
    assert resolve_target('haiku.Linear') is Linear
    assert resolve_target('kfac_jax.Optimizer') is KFAC
    assert (
        resolve_target('deepqmc.sampling.MetropolisSampler').__name__
        == 'MetropolisSampler'
    )
    assert resolve_target('deepqmc.molecule.Molecule') is Molecule


def test_interpolation_of_root_keys():
    cfg = compose(user_conf_dir=None)
    assert cfg['task']['hamil'] == '${hamil}'
    # instantiating task.hamil resolves through the root
    hamil = instantiate(cfg['task']['hamil'], root=cfg)
    assert isinstance(hamil, MolecularHamiltonian)
