"""presets.py and the packaged YAML configs must build identical networks.

bench.py and __graft_entry__ construct the flagship models through
``ansatz_preset`` while the CLI composes the packaged YAML; this pins the two
routes to each other so the benchmarked model provably is the configured one
(addresses the round-1 review's single-source-of-truth concern).
"""

import jax
import numpy as np
import pytest

from deepqmc_tpu.config import compose, instantiate
from deepqmc_tpu.presets import ansatz_preset
from deepqmc_tpu.wf import instantiate_ansatz


@pytest.mark.parametrize(
    'preset', ['default', 'ferminet', 'deeperwin', 'psiformer']
)
def test_preset_matches_yaml(helpers, preset):
    hamil = helpers.hamil(mol=helpers.mol('LiH'))
    cfg = compose(overrides=[f'ansatz={preset}', 'hamil/mol=LiH'])
    yaml_ansatz = instantiate_ansatz(hamil, instantiate(cfg['ansatz']))
    preset_ansatz = instantiate_ansatz(hamil, ansatz_preset(preset))

    phys_conf = helpers.phys_conf(hamil)
    rng = helpers.rng(17)
    params_yaml = yaml_ansatz.init(rng, phys_conf)
    params_preset = preset_ansatz.init(rng, phys_conf)

    # identical parameter trees: same paths, shapes, and (same rng) values
    leaves_yaml = jax.tree_util.tree_leaves_with_path(params_yaml)
    leaves_preset = jax.tree_util.tree_leaves_with_path(params_preset)
    assert [p for p, _ in leaves_yaml] == [p for p, _ in leaves_preset]
    for (path, leaf_y), (_, leaf_p) in zip(leaves_yaml, leaves_preset):
        assert leaf_y.shape == leaf_p.shape, path
        np.testing.assert_array_equal(
            np.asarray(leaf_y), np.asarray(leaf_p), err_msg=str(path)
        )

    # identical outputs on the same configuration
    psi_yaml = yaml_ansatz.apply(params_yaml, phys_conf)
    psi_preset = preset_ansatz.apply(params_preset, phys_conf)
    np.testing.assert_allclose(
        np.asarray(psi_yaml.log), np.asarray(psi_preset.log), rtol=1e-12
    )
    assert np.asarray(psi_yaml.sign) == np.asarray(psi_preset.sign)
