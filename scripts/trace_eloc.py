"""Capture a TPU trace of the forward-Laplacian local energy and rank ops.

Writes a jax.profiler trace, parses the XSpace protobuf, and prints the top
ops on the device plane by total self-duration — the ground truth for where
the eloc milliseconds go.

Usage: python scripts/trace_eloc.py [--walkers N] [--mol H2O] [--top 40]
       [--what eloc|fwd|step]
"""

import argparse
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_xplane(tracedir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f'{tracedir}/**/*.xplane.pb', recursive=True)
    assert paths, f'no xplane.pb under {tracedir}'
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], 'rb') as f:
        space.ParseFromString(f.read())
    rows = []
    for plane in space.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals: collections.Counter = collections.Counter()
        counts: collections.Counter = collections.Counter()
        for line in plane.lines:
            if 'XLA Ops' not in line.name and 'XLA TraceMe' not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if totals:
            rows.append((plane.name, totals, counts))
    def category(name):
        # async copy-start/-done events span their whole DMA window and
        # overlap compute — bucket them separately so they don't read as
        # serialized core time
        head = name.split(' ', 1)[0].lstrip('%')
        base = head.split('.', 1)[0]
        if base in ('copy-start', 'copy-done', 'all-gather-start',
                    'all-gather-done', 'collective-permute-start',
                    'collective-permute-done'):
            return 'async-copy-window'
        if 'pallas' in name or 'custom-call' in name or base == 'custom-call':
            return 'pallas/custom-call'
        if base in ('fusion', 'loop_fusion', 'input_fusion', 'output_fusion'):
            return 'fusion'
        if base == 'copy':
            return 'sync-copy'
        if base in ('convolution', 'dot', 'dot_general'):
            return 'matmul'
        return base

    for plane_name, totals, counts in rows:
        grand = sum(totals.values())
        print(f'== {plane_name}: total {grand:.1f} ms ==')
        cats = collections.Counter()
        for name, ms in totals.items():
            cats[category(name)] += ms
        sync = sum(ms for c, ms in cats.items() if c != 'async-copy-window')
        print(json.dumps({'serialized_total_ms': round(sync, 1)}))
        for cat, ms in cats.most_common(12):
            print(json.dumps({'category': cat, 'ms': round(ms, 2),
                              'pct_of_serial': round(100 * ms / max(sync, 1e-9), 1)}))
        for name, ms in totals.most_common(top):
            print(
                json.dumps(
                    {'op': name[:110], 'ms': round(ms, 3),
                     'calls': counts[name],
                     'pct': round(100 * ms / grand, 1)}
                )
            )


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--walkers', type=int, default=2048)
    p.add_argument('--mol', default='H2O')
    p.add_argument('--ansatz', default='psiformer')
    p.add_argument('--top', type=int, default=40)
    p.add_argument('--what', default='eloc', choices=['eloc', 'fwd', 'grad'])
    p.add_argument('--tracedir', default='/tmp/eloc_trace')
    p.add_argument('--parse-only', action='store_true')
    args = p.parse_args()

    if not args.parse_only:
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
        if args.what == 'eloc':
            fn = jax.jit(
                lambda r, p_, c: jax.vmap(
                    hamil.local_energy(ansatz.apply), (0, None, 0)
                )(r, p_, c)[0]
            )
            fn_args = (rngs, params, conf)
        elif args.what == 'grad':
            # the VMC gradient's pullback: ONE vjp of batched log|psi| with a
            # per-walker cotangent (loss_function.py:259-263)
            cot = jnp.ones((args.walkers,)) / args.walkers

            def vjp_once(p_, c, ct):
                _, pullback = jax.vjp(
                    lambda pp: jax.vmap(ansatz.apply, (None, 0))(pp, c).log, p_
                )
                return pullback(ct)[0]

            fn = jax.jit(vjp_once)
            fn_args = (params, conf, cot)
        else:
            fn = jax.jit(lambda p_, c: jax.vmap(ansatz.apply, (None, 0))(p_, c).log)
            fn_args = (params, conf)
        jax.block_until_ready(fn(*fn_args))  # compile outside the trace
        with jax.profiler.trace(args.tracedir):
            for _ in range(3):
                jax.block_until_ready(fn(*fn_args))
    parse_xplane(args.tracedir, args.top)


if __name__ == '__main__':
    main()
