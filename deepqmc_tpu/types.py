"""Core value types shared across the framework.

TPU-native re-design of the reference's type layer
(/root/reference/src/deepqmc/types.py:11-113).  The reference relies on
``jax_dataclasses``; here we use :func:`jax.tree_util.register_dataclass` so the
containers are first-class pytrees that trace cleanly through ``jit``/``scan``/
``shard_map`` without third-party dependencies.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable, MutableMapping
from typing import Any, NamedTuple, Optional, Protocol, TypeAlias

import jax


class Psi(NamedTuple):
    """Wave-function value in sign/log representation."""

    sign: jax.Array
    log: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PhysicalConfiguration:
    """Electron and nuclear coordinates of one (or a batch of) sample(s).

    ``R``: nuclear coordinates ``[..., n_nuc, 3]``; ``r``: electron coordinates
    ``[..., n_elec, 3]``; ``mol_idx``: index of the molecular geometry each
    sample belongs to ``[...]``.  Mirrors the reference's container
    (types.py:21-48) so downstream call signatures line up.
    """

    R: jax.Array
    r: jax.Array
    mol_idx: jax.Array

    def __getitem__(self, idx):
        return PhysicalConfiguration(self.R[idx], self.r[idx], self.mol_idx[idx])

    def __len__(self):
        return len(self.r)

    def replace(self, **kwargs) -> 'PhysicalConfiguration':
        return dataclasses.replace(self, **kwargs)

    @property
    def batch_shape(self):
        assert self.r.shape[:-2] == self.R.shape[:-2] == self.mol_idx.shape
        return self.r.shape[:-2]


Params: TypeAlias = MutableMapping
Stats: TypeAlias = dict
Weight: TypeAlias = jax.Array
Energy: TypeAlias = jax.Array
KeyArray: TypeAlias = jax.Array
SamplerState: TypeAlias = dict
OptState: TypeAlias = Any
DataDict: TypeAlias = dict
Batch: TypeAlias = tuple[PhysicalConfiguration, Weight, Optional[DataDict]]
WaveFunction: TypeAlias = Callable[[PhysicalConfiguration], Psi]
ParametrizedWaveFunction: TypeAlias = Callable[[Params, PhysicalConfiguration], Psi]


class TrainState(NamedTuple):
    """Complete training state (sampler walkers, ansatz params, optimizer)."""

    sampler: SamplerState
    params: Params
    opt: OptState


class Ansatz(Protocol):
    """Protocol for parametrized wave-function ansatzes.

    Same contract as the reference (types.py:71-113): ``init``/``apply`` act on a
    *single* sample; batching is applied by the framework via ``vmap``.
    """

    def init(self, rng: KeyArray, phys_conf: PhysicalConfiguration) -> Params: ...

    def apply(
        self, params: Params, phys_conf: PhysicalConfiguration, return_mos: bool = False
    ) -> Psi: ...
