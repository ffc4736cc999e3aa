"""Probe which ops this TPU Mosaic toolchain accepts inside a kernel.

Each probe is a tiny pallas_call compiled and checked against jnp; prints
PASS/FAIL per probe.  Used to de-risk kernel designs (minor-dim reshapes,
lane slicing, rank-1 refs, ...) before building them.

Usage: python scripts/mosaic_probe.py [probe ...]
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, args, want_fn, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*args)
        want = want_fn(*args)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-5, atol=1e-5
        )
        print(f'PASS {name}')
        return True
    except Exception as e:
        msg = str(e).split('\n')[0][:140]
        print(f'FAIL {name}: {type(e).__name__} {msg}')
        return False


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(8, 10, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(1, 256)), jnp.float32)

    only = set(sys.argv[1:])

    def probe(name, *args_):
        if only and name not in only:
            return
        run(name, *args_)

    probe(
        'reshape-minor-split',  # [8,256] -> [8,4,64]
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(8, 4, 64)),
        (x,),
        lambda a: a.reshape(8, 4, 64),
        (8, 4, 64),
    )
    probe(
        'reshape-minor-merge',  # [8,4,64] -> [8,256]
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(8, 256)),
        (x.reshape(8, 4, 64),),
        lambda a: a.reshape(8, 256),
        (8, 256),
    )
    probe(
        'lane-slice-64',  # x[:, 64:128]
        lambda i, o: o.__setitem__(slice(None), i[:, 64:128]),
        (x,),
        lambda a: a[:, 64:128],
        (8, 64),
    )
    probe(
        'lane-concat',  # concat 4 x [8,64] -> [8,256]
        lambda i, o: o.__setitem__(
            slice(None),
            jnp.concatenate([i[:, 64 * h : 64 * (h + 1)] for h in range(4)], -1),
        ),
        (x,),
        lambda a: a,
        (8, 256),
    )
    probe(
        'rank1-ref-bias',  # read [256] ref, broadcast add
        lambda xr, br, o: o.__setitem__(slice(None), xr[:] + br[:]),
        (x, b1),
        lambda a, b: a + b,
        (8, 256),
    )
    probe(
        'rank2-bias',  # [1,256] bias add
        lambda xr, br, o: o.__setitem__(slice(None), xr[:] + br[:]),
        (x, b2),
        lambda a, b: a + b,
        (8, 256),
    )
    probe(
        'leading-merge-dot',  # [8,10,256] -> [80,256] @ [256,256]
        lambda xr, wr, o: o.__setitem__(
            slice(None),
            jax.lax.dot_general(
                xr[:].reshape(80, 256),
                wr[:],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(8, 10, 256),
        ),
        (x3, w),
        lambda a, b: jax.lax.dot_general(
            a.reshape(80, 256),
            b,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(8, 10, 256),
        (8, 10, 256),
    )
    probe(
        'sum-middle-axis',  # [8,10,256] sum axis 1
        lambda xr, o: o.__setitem__(slice(None), xr[:].sum(axis=1)),
        (x3,),
        lambda a: a.sum(axis=1),
        (8, 256),
    )
    probe(
        'transpose-minor',  # [8,10,256]->[8,256,10]
        lambda xr, o: o.__setitem__(slice(None), jnp.swapaxes(xr[:], 1, 2)),
        (x3,),
        lambda a: jnp.swapaxes(a, 1, 2),
        (8, 256, 10),
    )
    probe(
        'mean-lastaxis-keep',  # layernorm building block
        lambda xr, o: o.__setitem__(
            slice(None), xr[:] - xr[:].mean(axis=-1, keepdims=True)
        ),
        (x,),
        lambda a: a - a.mean(axis=-1, keepdims=True),
        (8, 256),
    )


if __name__ == '__main__':
    main()
