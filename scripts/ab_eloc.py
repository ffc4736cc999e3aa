"""A/B sweep of eloc kernel variants in ONE process (one tunnel session).

Kernel-path selectors (DEEPQMC_TPU_ATTN_COLFORM, DEEPQMC_TPU_BLOCK_KERNEL,
the WALKER_BLOCK module constants) are read at trace time, so distinct jit
closures per variant re-trace with fresh settings and each variant compiles
exactly once.  Timing is the marginal (dispatch-free) scan method of
scripts/marginal_eloc.py.

Usage: python scripts/ab_eloc.py [--walkers 2048] [--variants a,b,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

VARIANTS = {
    'default': {},
    'no_pallas': {'DEEPQMC_TPU_NO_PALLAS': '1'},
    # plain loop-head per-op attention at larger walker blocks (round 2 only
    # measured colform at WB>1): amortizes per-program dispatch/DMA overhead
    'w4': {'ATTN_WB': 4},
    'w8': {'ATTN_WB': 8},
    # bf16 Jacobian storage channel (fwdlap DEEPQMC_TPU_JAC_DTYPE): halves
    # jac HBM bytes; convergence-gated via scripts/ab_lih_convergence.py
    # pre-r4 production path (storage lever only; matmul lever pinned off)
    'jac_bf16': {'DEEPQMC_TPU_JAC_DTYPE': 'bf16', 'DEEPQMC_TPU_JAC_MATMUL': 'f32'},
    'jac_bf16_w4': {
        'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
        'DEEPQMC_TPU_JAC_MATMUL': 'f32',
        'ATTN_WB': 4,
    },
    'jac_bf16_w8': {
        'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
        'DEEPQMC_TPU_JAC_MATMUL': 'f32',
        'ATTN_WB': 8,
    },
    # round-4 lever: jac-channel contractions natively in bf16 on the MXU
    # (fwdlap dot rule + attention kernel _bmm low mode)
    'jacmm_bf16': {
        'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
        'DEEPQMC_TPU_JAC_MATMUL': 'bf16',
    },
    'jacmm_bf16_w4': {
        'DEEPQMC_TPU_JAC_DTYPE': 'bf16',
        'DEEPQMC_TPU_JAC_MATMUL': 'bf16',
        'ATTN_WB': 4,
    },
    'colform': {'DEEPQMC_TPU_ATTN_COLFORM': '1'},
    'colform_w4': {'DEEPQMC_TPU_ATTN_COLFORM': '1', 'ATTN_WB': 4},
    'block_loop_w1': {'DEEPQMC_TPU_BLOCK_KERNEL': '1', 'BLOCK_WB': 1},
    'block_loop_w4': {'DEEPQMC_TPU_BLOCK_KERNEL': '1', 'BLOCK_WB': 4},
    'stack_loop_w1': {
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'DEEPQMC_TPU_GNN_STACK_BLOCK': '1',
        'BLOCK_WB': 1,
    },
    'block_colform_w1': {
        'DEEPQMC_TPU_ATTN_COLFORM': '1',
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'BLOCK_WB': 1,
    },
    'block_colform_w4': {
        'DEEPQMC_TPU_ATTN_COLFORM': '1',
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'BLOCK_WB': 4,
    },
    'block_colform_w8': {
        'DEEPQMC_TPU_ATTN_COLFORM': '1',
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'BLOCK_WB': 8,
    },
    'stack_colform_w1': {
        'DEEPQMC_TPU_ATTN_COLFORM': '1',
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'DEEPQMC_TPU_GNN_STACK_BLOCK': '1',
        'BLOCK_WB': 1,
    },
    'stack_colform_w4': {
        'DEEPQMC_TPU_ATTN_COLFORM': '1',
        'DEEPQMC_TPU_BLOCK_KERNEL': '1',
        'DEEPQMC_TPU_GNN_STACK_BLOCK': '1',
        'BLOCK_WB': 4,
    },
}

FLAG_KEYS = [
    'DEEPQMC_TPU_ATTN_COLFORM',
    'DEEPQMC_TPU_ATTN_KRON',
    'DEEPQMC_TPU_BLOCK_KERNEL',
    'DEEPQMC_TPU_GNN_STACK_BLOCK',
    'DEEPQMC_TPU_NO_PALLAS',
    'DEEPQMC_TPU_JAC_DTYPE',
    'DEEPQMC_TPU_JAC_MATMUL',
]


def apply_variant(spec):
    from deepqmc_tpu.ops import fl_attention, fl_block

    for k in FLAG_KEYS:
        os.environ.pop(k, None)
    fl_attention.WALKER_BLOCK = 1
    fl_block.WALKER_BLOCK = 4
    for k, v in spec.items():
        if k == 'ATTN_WB':
            fl_attention.WALKER_BLOCK = v
        elif k == 'BLOCK_WB':
            fl_block.WALKER_BLOCK = v
        else:
            os.environ[k] = v


def marginal(fn, args, perturb_idx, k=4, reps=3):
    def scanned(K):
        @jax.jit
        def run(*args):
            def body(c, _):
                perturbed = list(args)
                perturbed[perturb_idx] = jax.tree_util.tree_map(
                    lambda x: x + c * 1e-30
                    if jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    perturbed[perturb_idx],
                )
                out = fn(*perturbed)
                total = sum(
                    jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(leaf.dtype, jnp.floating)
                )
                return c + total, None

            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

        return run

    f1, fk = scanned(1), scanned(k)
    t0 = time.perf_counter()
    float(f1(*args))
    compile_s = time.perf_counter() - t0
    float(fk(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f1(*args))
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fk(*args))
    tk = (time.perf_counter() - t0) / reps
    return (tk - t1) / (k - 1) * 1e3, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--k', type=int, default=4)
    p.add_argument('--variants', default=None)
    args = p.parse_args()
    names = args.variants.split(',') if args.variants else list(VARIANTS)

    import deepqmc_tpu as dq
    from deepqmc_tpu.presets import ansatz_preset
    from deepqmc_tpu.wf import instantiate_ansatz

    hamil = dq.MolecularHamiltonian(mol=dq.Molecule.from_name(args.mol))
    ansatz = instantiate_ansatz(hamil, ansatz_preset(args.ansatz))
    conf = hamil.init_sample(
        jax.random.PRNGKey(3), hamil.mol.coords, args.walkers
    )
    params = ansatz.init(jax.random.PRNGKey(1), conf[0])
    rngs = jax.random.split(jax.random.PRNGKey(4), args.walkers)

    for name in names:
        apply_variant(VARIANTS[name])

        def eloc(r, p_, c):
            return jax.vmap(hamil.local_energy(ansatz.apply), (0, None, 0))(
                r, p_, c
            )[0]

        try:
            ms, compile_s = marginal(
                eloc, (rngs, params, conf), perturb_idx=2, k=args.k
            )
            print(
                json.dumps(
                    {
                        'variant': name,
                        'eloc_ms': round(ms, 2),
                        'compile_s': round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - sweep survives one bad variant
            limit = int(os.environ.get('AB_ELOC_ERROR_CHARS', '300'))
            print(
                json.dumps({'variant': name, 'error': repr(e)[:limit]}),
                flush=True,
            )


if __name__ == '__main__':
    main()
