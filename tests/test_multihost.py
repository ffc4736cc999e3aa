"""Two-process distributed bootstrap + cross-process collective.

Exercises the multi-host path the reference bootstraps via SLURM env vars
(/root/reference/src/deepqmc/parallel.py:17-54): two OS processes join one
``jax.distributed`` cluster (gloo CPU collectives), build ONE global mesh
over all 4 devices (2 local per process), and a jitted global-mean over a
walker-sharded global array must see every process's shard.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import os, sys
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

sys.path.insert(0, os.environ['DEEPQMC_TPU_TEST_ROOT'])
import deepqmc_tpu  # noqa: F401  (import runs maybe_init_multi_host)
from deepqmc_tpu import parallel

import numpy as np
from jax.sharding import NamedSharding

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = parallel.get_mesh()
assert mesh.size == 4

# global [1, 1, 8] walker array: process p contributes walkers 4p..4p+3
pid = jax.process_index()
local = np.arange(4 * pid, 4 * (pid + 1), dtype=np.float32).reshape(1, 1, 4)
sharding = NamedSharding(mesh, parallel.walker_spec(3))
glob = jax.make_array_from_process_local_data(sharding, local, (1, 1, 8))

mean = jax.jit(
    lambda x: parallel.all_device_mean(x),
    out_shardings=NamedSharding(mesh, jax.sharding.PartitionSpec()),
)(glob)
print('MEAN', float(mean), flush=True)
assert abs(float(mean) - 3.5) < 1e-6, float(mean)
print(f'PROC{pid} OK', flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_bootstrap_and_collective(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            DEEPQMC_TPU_TEST_ROOT=ROOT,
            DEEPQMC_TPU_MULTIHOST='1',
            DEEPQMC_TPU_COORDINATOR_ADDRESS=f'localhost:{port}',
            DEEPQMC_TPU_NUM_PROCESSES='2',
            DEEPQMC_TPU_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, '-c', DRIVER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=str(tmp_path),
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
        assert f'PROC{pid} OK' in out, out
        assert 'MEAN 3.5' in out, out
