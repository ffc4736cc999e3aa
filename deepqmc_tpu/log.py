"""Checkpointing, HDF5 result logging, Tensorboard metric logging.

Reference: /root/reference/src/deepqmc/log.py.  Checkpoint serialization here
is topology-independent by construction: global (sharded) arrays are gathered
to host numpy on save, and re-sharded onto whatever mesh exists on load —
replacing the reference's manual device-axis gather/scatter dance
(log.py:38-73).
"""

import logging
import os
import pickle
import re
import sys
import time
from functools import partial
from itertools import product
from pathlib import Path
from typing import NamedTuple, Optional, Protocol, Union

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from .parallel import gather_on_host, replicate_on_devices, shard_walkers
from .types import Stats, TrainState
from .utils import flatten_dict

__all__ = ['CheckpointStore', 'H5LogTable', 'H5Logger', 'TensorboardMetricLogger']
log = logging.getLogger(__name__)


class Checkpoint(NamedTuple):
    step: int
    loss: float
    path: Path


def serialize_train_state(train_state: TrainState) -> TrainState:
    """Bring all device arrays to host numpy for pickling.

    The KFAC-bearing state has hundreds of leaves; fetching them one
    ``np.asarray`` at a time costs one round-trip each (observed: a
    minutes-long stall per checkpoint through a tunneled TPU runtime).
    Instead, ONE jitted program concatenates all raveled leaves per dtype on
    device, so the whole state crosses the wire in a handful of large
    transfers, and the host splits them back.
    """
    gathered = gather_on_host(train_state)
    leaves, treedef = jax.tree_util.tree_flatten(gathered)
    def packable(leaf):
        try:
            return (
                isinstance(leaf, jax.Array)
                and np.dtype(leaf.dtype).kind in 'fiub'
            )
        except TypeError:  # extended dtypes (e.g. typed PRNG keys)
            return False

    by_dtype: dict = {}
    for i, leaf in enumerate(leaves):
        if packable(leaf):
            by_dtype.setdefault(np.dtype(leaf.dtype), []).append(i)
    host = list(leaves)
    for dtype, idxs in by_dtype.items():
        packed = np.asarray(
            _pack_leaves(tuple(leaves[i] for i in idxs))
        )
        offset = 0
        for i in idxs:
            size = int(np.prod(leaves[i].shape, dtype=np.int64))
            host[i] = packed[offset : offset + size].reshape(leaves[i].shape)
            offset += size
    return jax.tree_util.tree_map(
        np.asarray, jax.tree_util.tree_unflatten(treedef, host)
    )


@jax.jit
def _pack_leaves(leaves):
    return jnp.concatenate([leaf.ravel() for leaf in leaves])


def deserialize_train_state(train_state: TrainState) -> TrainState:
    """Re-place a host checkpoint onto the current device mesh."""
    sampler = dict(train_state.sampler)
    sampler['elec'] = shard_walkers(sampler['elec'])
    sampler['nuc'], sampler['update_nuc_counter'] = replicate_on_devices(
        (sampler['nuc'], sampler['update_nuc_counter'])
    )
    params, opt = replicate_on_devices((train_state.params, train_state.opt))
    return TrainState(sampler, params, opt)


class CheckpointStore:
    """Rolling store of pickled ``(step, TrainState)`` checkpoints.

    Args: ``size`` caps the number of retained checkpoints (the initial one is
    always kept); ``interval`` spaces the dumps in steps.
    """

    PATTERN = 'chkpt-{}.pt'

    def __init__(self, workdir: str, *, size: int = sys.maxsize, interval: int = 1000):
        self.workdir = Path(workdir)
        for p in self.workdir.glob(self.PATTERN.format('*')):
            p.unlink()
        self.size = size
        self.interval = interval
        self.chkpts: list[Checkpoint] = []
        self.buffer = (None, None, None)

    def update(self, step: int, state: TrainState, loss=float('inf')):
        self.buffer = (step, state, loss)
        if not self.chkpts or step >= self.interval + self.chkpts[-1].step:
            self.dump()
        while len(self.chkpts) > self.size:
            # pop index 1: index 0 is the pre-training initial checkpoint
            self.chkpts.pop(1).path.unlink()

    def dump(self):
        step, state, loss = self.buffer
        assert state is not None and step is not None
        path = self.workdir / self.PATTERN.format(step)
        with path.open('wb') as f:
            pickle.dump((step, serialize_train_state(state)), f)
        self.chkpts.append(Checkpoint(step, loss, path))

    @staticmethod
    def load(path) -> tuple[int, TrainState]:
        with open(path, 'rb') as f:
            step, state = pickle.load(f)
        return step, deserialize_train_state(state)

    def close(self):
        if all(x is not None for x in self.buffer):
            try:
                self.dump()
            except Exception as e:  # buffers may already be freed on crash
                log.warning(f'Could not dump final checkpoint: {e!r}')

    @property
    def last(self) -> tuple[int, TrainState]:
        return self.load(self.chkpts[-1].path)

    @classmethod
    def extract_step_from_filename(cls, filename: str) -> int:
        match = re.search(cls.PATTERN.format(r'(\d+)'), filename)
        if match is None:
            raise ValueError(f'Invalid checkpoint filename {filename}.')
        return int(match.groups()[0])


def _resize_if_dataset(size: int, name: str, obj):
    if isinstance(obj, h5py.Dataset):
        obj.resize(size, axis=0)


class H5LogTable:
    """Appendable row-oriented view over an HDF5 group."""

    def __init__(self, group):
        self._group = group

    def __getitem__(self, label):
        return self._group[label] if label in self._group else []

    def resize(self, size: int):
        self._group.visititems(partial(_resize_if_dataset, size))

    @property
    def row(self):
        group = self._group

        class Appender:
            def __setitem__(self, label: str, row):
                row = np.asarray(row) if not isinstance(row, (float, int)) else row
                shape = row.shape if hasattr(row, 'shape') else ()
                if label not in group:
                    dtype = row.dtype if hasattr(row, 'dtype') else float
                    group.create_dataset(
                        label, (0, *shape), maxshape=(None, *shape), dtype=dtype
                    )
                ds = group[label]
                ds.resize(ds.shape[0] + 1, axis=0)
                ds[-1, ...] = row

        return Appender()


class H5Logger:
    """Appends whitelisted statistics to ``result.h5`` (SWMR mode)."""

    def __init__(
        self,
        workdir: str,
        additional_keys_to_whitelist: Optional[list[str]] = None,
        *,
        keys_whitelist: Optional[list[str]] = None,
        init_step: int = 0,
        aux_data: Optional[dict] = None,
    ):
        self.keys_whitelist = (
            keys_whitelist if keys_whitelist is not None else ['local_energy']
        ) + (additional_keys_to_whitelist or [])
        # note: unlike the reference (log.py:215-216) we do not enable SWMR
        # mode — a killed run would leave the SWMR consistency flag set and
        # block every subsequent append-mode open of result.h5
        path = os.path.join(workdir, 'result.h5')
        try:
            self.h5file = h5py.File(path, 'a', libver='v110')
        except OSError as exc:
            # a SIGKILLed run leaves the HDF5 write-lock consistency flag
            # set in the superblock and every later append-open fails; the
            # partial log of a crashed run is not worth blocking a restart,
            # so move it aside and start fresh
            if 'already open for write' not in str(exc) or not os.path.exists(path):
                raise
            stale = f'{path}.stale-{int(time.time())}'
            os.replace(path, stale)
            log.warning(
                f'{path} carried a stale HDF5 write lock (crashed run?); '
                f'moved it to {stale} and starting a fresh log'
            )
            self.h5file = h5py.File(path, 'a', libver='v110')
        for k, v in (aux_data or {}).items():
            self.h5file.attrs.create(k, v)
        self.table = H5LogTable(self.h5file)
        self.table.resize(init_step)
        self.flush()

    def update(self, data: Stats):
        data = flatten_dict(data)
        for key, value in data.items():
            if any(phrase in key for phrase in self.keys_whitelist):
                self.write(key, value)
        self.flush()

    def write(self, key: str, data):
        self.table.row[key] = np.asarray(data)

    def flush(self):
        self.h5file.flush()

    def close(self):
        self.h5file.close()


class MetricLogger(Protocol):
    """Protocol for metric sinks fed from the train loop."""

    def __init__(self, workdir: str, n_mol: int): ...

    def update(
        self,
        step: int,
        single_device_stats: Stats,
        multi_device_stats: Stats,
        mol_idxs,
        prefix: Optional[str] = None,
    ): ...

    def close(self): ...


class TensorboardMetricLogger:
    """Tensorboard sink with per-molecule/state/state-pair scalar fan-out."""

    def __init__(self, workdir: str, n_mol: int, *, max_queue: int = 10):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(workdir, max_queue=max_queue)
        self.n_mol = n_mol
        self.layout: dict = {}

    def update(
        self,
        step: int,
        single_device_stats: Stats,
        multi_device_stats: Stats,
        mol_idxs,
        prefix: Optional[str] = None,
    ):
        prefix = f'{prefix}/' if prefix else ''
        stats = {**(multi_device_stats or {}), **single_device_stats}
        stats = {k: np.asarray(v) for k, v in stats.items()}
        if self.n_mol <= 100:
            self._write_full(step, stats, mol_idxs, prefix)
        else:
            self._write_batched(step, stats, mol_idxs, prefix)

    def _register_layout(self, keys_of, stats: Stats, prefix: str):
        for k, v in stats.items():
            keys = keys_of(k, v)
            if keys is None:
                continue
            group = k.split('/')[0]
            self.layout[f'{prefix}{group}'] = {
                k: ['Multiline', keys],
                **self.layout.get(f'{prefix}{group}', {}),
            }
        self.writer.add_custom_scalars(self.layout)

    def _write_full(self, step, stats, mol_idxs, prefix):
        if step == 0:
            def keys_of(k, v):
                if v.ndim == 1:
                    return [f'{prefix}{k}/{i}' for i in range(self.n_mol)]
                if v.ndim == 2:
                    return [
                        f'{prefix}{k}/{i}/{j}'
                        for i, j in product(range(self.n_mol), range(v.shape[1]))
                    ]
                if v.ndim == 3:
                    return [
                        f'{prefix}{k}/{i}/{j}-{m}'
                        for i, j, m in product(
                            range(self.n_mol), range(v.shape[1]), range(v.shape[2])
                        )
                    ]
                return None

            self._register_layout(keys_of, stats, prefix)
        for k, v in stats.items():
            if v.ndim == 0:
                self.writer.add_scalar(f'{prefix}{k}', v, step)
            elif v.ndim == 1:
                for i, v_i in zip(mol_idxs, v):
                    self.writer.add_scalar(f'{prefix}{k}/{i}', v_i, step)
            elif v.ndim == 2:
                for i, v_i in zip(mol_idxs, v):
                    for j, v_ij in enumerate(v_i):
                        self.writer.add_scalar(f'{prefix}{k}/{i}/{j}', v_ij, step)
            elif v.ndim == 3 and v.shape[1] == v.shape[2]:
                triu = np.triu_indices(v.shape[2], k=1)
                for i, v_i in zip(mol_idxs, v):
                    for j, m in zip(*triu):
                        self.writer.add_scalar(
                            f'{prefix}{k}/{i}/{m}-{j}', v_i[j, m], step
                        )
            else:
                log.warning(f'Invalid ndim ({v.ndim}) for {k}; skipping TB log.')

    def _write_batched(self, step, stats, mol_idxs, prefix):
        for k, v in stats.items():
            if v.ndim == 0:
                self.writer.add_scalar(f'{prefix}{k}', v, step)
            elif v.ndim == 1:
                self.writer.add_scalar(f'{prefix}{k}/mean', v.mean(), step)
                self.writer.add_scalar(f'{prefix}{k}/std', v.std(), step)
            elif v.ndim == 2:
                for j, (m, s) in enumerate(zip(v.mean(axis=0), v.std(axis=0))):
                    self.writer.add_scalar(f'{prefix}{k}/mean/{j}', m, step)
                    self.writer.add_scalar(f'{prefix}{k}/std/{j}', s, step)
            elif v.ndim == 3 and v.shape[1] == v.shape[2]:
                v_mean, v_std = v.mean(axis=0), v.std(axis=0)
                for j, m in zip(*np.triu_indices(v.shape[2], k=1)):
                    self.writer.add_scalar(
                        f'{prefix}{k}/mean/{m}-{j}', v_mean[j, m], step
                    )
                    self.writer.add_scalar(f'{prefix}{k}/std/{m}-{j}', v_std[j, m], step)

    def close(self):
        self.writer.close()
