"""TPU-native parallel runtime: device mesh, shardings, collective statistics.

This replaces the reference's ``pmap``-based L0 layer
(/root/reference/src/deepqmc/parallel.py).  Design differences, on purpose:

- The reference dispatches >=4 separate ``pmap`` programs per training step and
  keeps all arrays in a per-device ``[n_device, ...]`` layout
  (parallel.py:57-75, fit.py:46-92).  Here there is ONE ``jax.jit`` step over a
  1D ``Mesh`` ('data'); walker batches are *global* arrays with a
  :class:`~jax.sharding.NamedSharding` over the walker axis, and XLA inserts the
  ICI collectives (psum/all-gather) automatically for cross-walker reductions
  (means, medians, quantiles).
- Parameters are replicated; walker state is sharded on the electron-batch axis
  (layout ``[mol, state, walker, ...]``).
- Multi-host: ``jax.distributed.initialize()`` is auto-detecting on TPU pods,
  replacing the reference's SLURM-specific bootstrap (parallel.py:17-54).

The distributed statistic helpers (``all_device_mean`` etc.) preserve the
reference's *semantics* (parallel.py:163-250) but compile to plain ``jnp``
reductions over globally-sharded arrays.
"""

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ()

DATA_AXIS = 'data'


def get_process_count() -> int:
    return jax.process_count()


def get_process_index() -> int:
    return jax.process_index()


def maybe_init_multi_host():
    """Initialize the distributed runtime on multi-host platforms.

    On TPU pods (and under SLURM) ``jax.distributed.initialize`` auto-detects
    the coordinator, replacing the reference's hand-rolled SLURM bootstrap
    (/root/reference/src/deepqmc/parallel.py:17-54).  Off those platforms the
    coordinator can be pinned explicitly via ``DEEPQMC_TPU_COORDINATOR_ADDRESS``
    / ``DEEPQMC_TPU_NUM_PROCESSES`` / ``DEEPQMC_TPU_PROCESS_ID`` (e.g. the
    two-process CPU collective test, tests/test_multihost.py).  Explicit opt-in
    via the ``DEEPQMC_TPU_MULTIHOST`` env var to avoid surprising hangs in
    unit tests.
    """
    if os.environ.get('DEEPQMC_TPU_MULTIHOST', '').lower() not in ('1', 'true'):
        return
    kwargs = {}
    address = os.environ.get('DEEPQMC_TPU_COORDINATOR_ADDRESS')
    if address:
        kwargs = dict(
            coordinator_address=address,
            num_processes=int(os.environ['DEEPQMC_TPU_NUM_PROCESSES']),
            process_id=int(os.environ['DEEPQMC_TPU_PROCESS_ID']),
        )
    jax.distributed.initialize(**kwargs)


_mesh_override: Optional[Mesh] = None


@lru_cache(maxsize=None)
def _default_mesh() -> Mesh:
    import numpy as np

    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def get_mesh(devices=None) -> Mesh:
    """Return a 1D device mesh; by default over all addressable devices."""
    if devices is not None:
        import numpy as np

        return Mesh(np.array(devices), (DATA_AXIS,))
    return _mesh_override or _default_mesh()


def set_default_mesh(mesh: Optional[Mesh]):
    """Override the global default mesh (e.g. to restrict to a device subset)."""
    global _mesh_override
    _mesh_override = mesh


def walker_spec(ndim: int, walker_axis: int = 2) -> P:
    """PartitionSpec sharding ``walker_axis`` over the data mesh axis."""
    spec = [None] * ndim
    spec[walker_axis] = DATA_AXIS
    return P(*spec)


def shard_walkers(tree, walker_axis: int = 2, mesh: Optional[Mesh] = None):
    """Place every leaf's ``walker_axis`` on the data axis of the mesh.

    Leaves with fewer dims than ``walker_axis + 1`` are replicated.  Replaces
    the reference's ``scatter_electrons_to_devices`` (parallel.py:274-313).
    """
    mesh = mesh or get_mesh()

    def place(x):
        x = jnp.asarray(x)
        if x.ndim > walker_axis and x.shape[walker_axis] % mesh.size == 0:
            sharding = NamedSharding(mesh, walker_spec(x.ndim, walker_axis))
        else:
            sharding = NamedSharding(mesh, P())
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


def replicate_on_devices(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree across all devices of the mesh."""
    mesh = mesh or get_mesh()
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )



def gather_on_host(tree):
    """Fetch fully-addressable host copies of (possibly sharded) arrays."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)



def rng_iterator(rng):
    """Yield an infinite stream of fresh keys derived from ``rng``."""
    while True:
        rng, rng_yield = jax.random.split(rng)
        yield rng_yield


# --- distributed statistics -------------------------------------------------
# Under jit with globally-sharded inputs these compile to psum/all-gather over
# ICI; the helper names keep call sites readable and aligned with the reference
# semantics (parallel.py:163-250).


def all_device_mean(x, axis=None, **kwargs):
    return jnp.mean(x, axis=axis, **kwargs)


def all_device_median(x, axis=None, **kwargs):
    return jnp.median(x, axis=axis, **kwargs)


def all_device_std(x, axis=None, **kwargs):
    return jnp.std(x, axis=axis, **kwargs)


def all_device_min(x, axis=None, **kwargs):
    return jnp.min(x, axis=axis, **kwargs)


def all_device_max(x, axis=None, **kwargs):
    return jnp.max(x, axis=axis, **kwargs)


def all_device_quantile(x, q, axis=None, **kwargs):
    return jnp.quantile(x, q, axis=axis, **kwargs)


def pexp_normalize_mean(log_w, axis=None):
    """exp(log_w) normalized to unit mean, computed stably via a max shift.

    Mirrors the reference's cross-device softmax-like weight normalization
    (parallel.py:222-232); here the reduction is over the (sharded) walker axis.
    """
    shift = jnp.max(log_w, axis=axis, keepdims=axis is not None)
    w = jnp.exp(log_w - shift)
    return w / jnp.mean(w, axis=axis, keepdims=axis is not None)
