"""deepqmc_tpu: a TPU-native deep-learning variational Monte Carlo framework.

A ground-up rebuild of the capabilities of deepqmc/deepqmc (reference mounted
at /root/reference) designed for TPU hardware: one fused jitted training step
over a device mesh, forward-Laplacian local energies, Pallas kernels on the
hot paths, and an in-house KFAC natural-gradient optimizer.
"""

import jax

from .hamil import MolecularHamiltonian  # noqa: F401
from .molecule import Molecule  # noqa: F401
from .parallel import maybe_init_multi_host
from .types import Ansatz, PhysicalConfiguration, Psi, TrainState  # noqa: F401

__version__ = '0.1.0'

# VMC needs accurate matmuls: like the reference (__init__.py:9-34 forces
# highest matmul precision / disables TF32), default all f32 matmuls to the
# highest TPU precision.  DEEPQMC_TPU_MATMUL_PRECISION overrides — on TPU
# 'high' (3-pass bf16) is ~2x faster on the MXU at near-f32 accuracy.
import os as _os  # noqa: E402

# honor JAX_PLATFORMS even when a sitecustomize already imported jax with a
# preregistered accelerator plugin (the env var is only read at jax import,
# so on such interpreters it would otherwise be silently ignored)
if _os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])

jax.config.update(
    'jax_default_matmul_precision',
    _os.environ.get('DEEPQMC_TPU_MATMUL_PRECISION', 'highest'),
)

# persistent compilation cache: the forward-Laplacian training step is a
# large XLA program (remote compiles can take minutes on tunneled TPU
# runtimes); cache compiled executables across processes unless disabled
if not _os.environ.get('DEEPQMC_TPU_NO_COMPILE_CACHE'):
    jax.config.update(
        'jax_compilation_cache_dir',
        _os.environ.get(
            'DEEPQMC_TPU_COMPILE_CACHE',
            _os.path.expanduser('~/.cache/deepqmc_tpu/jax'),
        ),
    )
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
if _os.environ.get('DEEPQMC_TPU_EXPLAIN_CACHE_MISSES'):
    jax.config.update('jax_explain_cache_misses', True)

maybe_init_multi_host()

__all__ = [
    'Ansatz',
    'Molecule',
    'MolecularHamiltonian',
    'PhysicalConfiguration',
    'Psi',
    'TrainState',
]
