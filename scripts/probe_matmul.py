"""Probe Mosaic matmul dtype support on this runtime (bf16 warp kernel fix).

The bf16 AugmentPipe failed AOT with: tpu.matmul (48x128 bf16, 128x128 bf16,
48x128 f32) -> 'Bad lhs type'. Isolate which operand/accumulator combos the
remote Mosaic build accepts.
"""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        r = fn()
        print(f"{name}: OK sum={float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32))):.3f}")
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "Mosaic" in l or "Bad" in l or "error:" in l]
        print(f"{name}: FAIL {key[:2] if key else msg[:140]}")


def mk(m, k, n, ldt, rdt, pref, dims=(((1,), (0,)), ((), ()))):
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=dims,
            preferred_element_type=pref,
        ).astype(o_ref.dtype)

    bshape = (k, n) if dims[0][1] == (0,) else (n, k)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), pref),
    )
    a = jnp.ones((m, k), ldt)
    b = jnp.ones(bshape, rdt)
    return lambda: jax.jit(f)(a, b)


if __name__ == "__main__":
    run("bf16xbf16->f32 48x128x128", mk(48, 128, 128, jnp.bfloat16, jnp.bfloat16, jnp.float32))
    run("bf16xbf16->f32 128x128x128", mk(128, 128, 128, jnp.bfloat16, jnp.bfloat16, jnp.float32))
    run("bf16xbf16->bf16 48x128x128", mk(48, 128, 128, jnp.bfloat16, jnp.bfloat16, jnp.bfloat16))
    run("f32xbf16->f32 48x128x128", mk(48, 128, 128, jnp.float32, jnp.bfloat16, jnp.float32))
    run("bf16xf32->f32 48x128x128", mk(48, 128, 128, jnp.bfloat16, jnp.float32, jnp.float32))
    run("f32xf32->f32 48x128x128 (ctl)", mk(48, 128, 128, jnp.float32, jnp.float32, jnp.float32))
    run("bf16xbf16->f32 rhsT 48x128", mk(48, 128, 128, jnp.bfloat16, jnp.bfloat16, jnp.float32,
                                         dims=(((1,), (1,)), ((), ()))))
    run("bf16xbf16->f32 16x128x128", mk(16, 128, 128, jnp.bfloat16, jnp.bfloat16, jnp.float32))
