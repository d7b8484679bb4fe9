"""Probe what Mosaic accepts on this runtime, for the conv3x3 redesign.

Each probe is a tiny pallas_call compiled on the real TPU; failures print
the first line of the Mosaic error. Findings drive ops/attic/conv3x3.py.
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, W, C = 16, 32, 64
DT = jnp.bfloat16


def run(name, fn):
    try:
        r = fn()
        r = jax.tree.leaves(r)[0]
        print(f"{name}: OK sum={float(jnp.sum(r.astype(jnp.float32))):.3f}")
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "Mosaic" in l or "must be" in l or "not supported" in l or "Unsupported" in l or "error:" in l]
        print(f"{name}: FAIL {type(e).__name__}: {key[:3] if key else msg[:160]}")


# -- A: rank-3 scratch, unaligned extents, DMA in, full load, value tap slices
def probe_a():
    x = jnp.ones((4, TH + 2, W + 2, C), DT)
    w = jnp.ones((9 * C, C), DT)

    def kern(x_hbm, w_ref, o_ref, win, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[i], win, sem)
        cp.start(); cp.wait()
        v = win[:]  # full load (TH+2, W+2, C) — extents 18, 34, 64
        pieces = []
        for dy in range(3):
            for dx in range(3):
                pieces.append(v[dy:dy + TH, dx:dx + W, :].reshape(TH * W, C))
        lhs = jnp.concatenate(pieces, axis=1)
        o_ref[0] = jnp.dot(lhs, w_ref[:], preferred_element_type=jnp.float32).reshape(TH, W, C).astype(DT)

    f = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((9 * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, TH, W, C), DT),
        scratch_shapes=[pltpu.VMEM((TH + 2, W + 2, C), DT), pltpu.SemaphoreType.DMA],
    )
    return jax.jit(lambda: f(x, w))()


# -- B: aligned scratch (sublane mult 8), roll-based dx taps
def probe_b():
    WP = W + 8
    x = jnp.ones((4, TH + 8, WP, C), DT)
    w = jnp.ones((9 * C, C), DT)

    def kern(x_hbm, w_ref, o_ref, win, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[i], win, sem)
        cp.start(); cp.wait()
        pieces = []
        for dy in range(3):
            row = win[dy:dy + TH]           # dim0 slice: free
            for dx in range(3):
                sh = pltpu.roll(row, -dx, 1)   # sublane circular shift
                pieces.append(sh[:, :W, :].reshape(TH * W, C))
        lhs = jnp.concatenate(pieces, axis=1)
        o_ref[0] = jnp.dot(lhs, w_ref[:], preferred_element_type=jnp.float32).reshape(TH, W, C).astype(DT)

    f = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((9 * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, TH, W, C), DT),
        scratch_shapes=[pltpu.VMEM((TH + 8, WP, C), DT), pltpu.SemaphoreType.DMA],
    )
    return jax.jit(lambda: f(x, w))()


# -- C: stacked rank-4 scratch but aligned extents + pl.when slot select
def probe_c():
    WP = W + 8
    x = jnp.ones((4, TH + 8, WP, C), DT)

    def kern(x_hbm, o_ref, win, sem):
        i = pl.program_id(0)
        slot = i % 2
        cp = pltpu.make_async_copy(x_hbm.at[i], win.at[slot], sem.at[slot])
        cp.start(); cp.wait()
        v = win[slot]  # dynamic leading index of rank-4 aligned scratch
        o_ref[0] = v[:TH, :W, :]

    f = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, TH, W, C), DT),
        scratch_shapes=[pltpu.VMEM((2, TH + 8, WP, C), DT), pltpu.SemaphoreType.DMA((2,))],
    )
    return jax.jit(lambda: f(x))()


# -- D: lane concat of nine 64-wide values (alignment of lane concat)
def probe_d():
    xs = jnp.ones((9, 256, C), DT)

    def kern(x_ref, o_ref):
        pieces = [x_ref[k] for k in range(9)]
        o_ref[:] = jnp.concatenate(pieces, axis=-1)

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 9 * C), DT),
    )
    return jax.jit(lambda: f(xs))()


# -- E: sublane-unaligned static slice on a loaded rank-2 value
def probe_e():
    x = jnp.ones((40, 128), DT)

    def kern(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v[1:33, :]

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), DT),
    )
    return jax.jit(lambda: f(x))()


if __name__ == "__main__":
    run("A rank3-unaligned-valueslice", probe_a)
    run("B roll-aligned", probe_b)
    run("C rank4-aligned-dynslot", probe_c)
    run("D lane-concat-9x64", probe_d)
    run("E sublane-unaligned-value-slice", probe_e)
