"""Probe: batched tiny contractions in Mosaic — MXU loop vs VPU reduce.

The step trace (scripts/trace_eloc.py on the full bench block) shows the FL
attention + slogdet Pallas kernels dominating the step (~160 ms of ~410 ms):
their [W*K]-batched [n, dh] x [dh, n] contractions (n=10, dh<=64) lower to
Mosaic LOOPS of tiny MXU ops.  This probes the alternative: broadcast-
multiply + lane-reduce on the VPU, which has no per-matmul latency.

Each variant runs R repetitions of the contraction chain inside ONE kernel
(carry-dependent so Mosaic cannot hoist), timed via the marginal method.

Usage: python scripts/probe_vpu_contract.py [--reps 16] [--walker-block 8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bmm(x, y, contract):
    return jax.lax.dot_general(
        x, y, ((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def contract_mxu(jq, k):
    """[B, n, d] x [B, n, d] -> [B, n, n] via batched dot_general."""
    return _bmm(jq, k, ((2,), (2,)))


def contract_vpu(jq, k):
    """Same contraction as broadcast-multiply + lane reduction."""
    # [B, n(i), 1, d] * [B, 1, n(j), d] -> reduce d
    return (jq[:, :, None, :] * k[:, None, :, :]).sum(axis=-1)


def make_kernel(form, reps):
    contract = {'mxu': contract_mxu, 'vpu': contract_vpu}[form]

    def kernel(jq_ref, k_ref, out_ref):
        jq = jq_ref[...]
        k = k_ref[...]
        acc = jnp.zeros(jq.shape[:2] + (jq.shape[1],), jq.dtype)
        for _ in range(reps):
            z = contract(jq, k)
            acc = acc + z
            # carry-dependence: feed a scalar of z back into jq (keep every
            # intermediate rank >= 2 — rank-1 vectors crash this Mosaic
            # toolchain)
            zs = z.sum(axis=2, keepdims=True).sum(axis=1, keepdims=True)
            jq = jq + zs * 1e-30
        out_ref[...] = acc

    return kernel


def run(form, jq, k, reps, interpret=False):
    kernel = make_kernel(form, reps)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(jq.shape[:2] + (jq.shape[1],), jnp.float32),
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                'compiler_params': pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                )
            }
        ),
    )
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(jq, k))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jq, k))
        times.append(time.perf_counter() - t0)
    return out, min(times) * 1e3, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reps', type=int, default=16)
    p.add_argument('--batch', type=int, default=240, help='W*K per program')
    p.add_argument('--n', type=int, default=10)
    p.add_argument('--d', type=int, default=64)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    jq = jnp.asarray(rng.normal(size=(args.batch, args.n, args.d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(args.batch, args.n, args.d)), jnp.float32)

    ref = None
    for form in ('mxu', 'vpu'):
        try:
            out, ms, compile_s = run(form, jq, k, args.reps)
            if ref is None:
                ref = out
                status = 'ref'
            else:
                dev = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
                status = f'rel_dev {dev:.2e}'
            print(
                f'{form}: {ms:8.3f} ms  ({args.reps} reps, batch '
                f'{args.batch}, [{args.n},{args.d}]x[{args.d},{args.n}]) '
                f'compile {compile_s:.0f}s  {status}',
                flush=True,
            )
        except Exception as e:
            print(f'{form}: FAIL {type(e).__name__} '
                  f'{str(e).splitlines()[0][:120]}', flush=True)


if __name__ == '__main__':
    main()
