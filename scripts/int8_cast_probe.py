"""Probe: can Mosaic (current jax) produce int8 IN-KERNEL on this target?

Round-1 note (rank_transform.py:11-13) says truncating to int8 inside a
Pallas kernel failed, forcing the transform to emit int32 + an XLA cast and
keeping transform/traversal as separate kernels. If any of these now
compile and match on chip, two levers unlock (VERDICT r4 #1):
  a) int8 one-hot digit matmuls in the transform (2x MXU rate), and
  b) fusing the transform into the traversal kernel (planes cast to int8
     in-kernel feed the int8 traversal dots directly) — overlapping the
     transform's MXU work with the traversal's VPU-bound fold.

Probes (each independent; failures reported, not fatal):
  1. store:   int32 value -> astype(int8) -> int8 out_ref
  2. dot_lhs: f32 compare -> astype(int8) -> int8 x int8 dot_general
  3. bitcast: pack 4 int8 into int32 lanes -> bitcast to int8 (fallback)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 900 python scripts/int8_cast_probe.py > /tmp/int8_probe.out 2>&1
"""
from __future__ import annotations

import json

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tahoe_tpu.ops.mosaic import compile_kwargs

    interpret = jax.default_backend() == "cpu"
    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    rng = np.random.default_rng(0)
    x32 = rng.integers(-100, 100, (256, 128)).astype(np.int32)
    w8 = rng.integers(-4, 4, (128, 128)).astype(np.int8)

    # --- probe 1: int8 store -------------------------------------------------
    def store_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int8)

    try:
        got = pl.pallas_call(
            store_kernel,
            in_specs=[pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int8),
            interpret=interpret, **compile_kwargs(interpret),
        )(jnp.asarray(x32))
        ok = bool(np.array_equal(np.asarray(got), x32.astype(np.int8)))
        out("int8_store", "OK exact" if ok else "COMPILED but wrong values")
    except Exception as e:  # noqa: BLE001
        out("int8_store", f"{type(e).__name__}: {str(e)[:200]}")

    # --- probe 2: in-kernel int8 cast feeding an int8 dot --------------------
    def dot_kernel(x_ref, w_ref, o_ref):
        a = (x_ref[:] > 0).astype(jnp.int8)  # int8 lhs born in-kernel
        o_ref[:] = jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        got = pl.pallas_call(
            dot_kernel,
            in_specs=[pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            interpret=interpret, **compile_kwargs(interpret),
        )(jnp.asarray(x32), jnp.asarray(w8))
        want = (x32 > 0).astype(np.int32) @ w8.astype(np.int32)
        ok = bool(np.array_equal(np.asarray(got), want))
        out("int8_dot_lhs", "OK exact" if ok else "COMPILED but wrong values")
    except Exception as e:  # noqa: BLE001
        out("int8_dot_lhs", f"{type(e).__name__}: {str(e)[:200]}")

    # --- probe 3: int32 values -> int8 via scratch store/load ----------------
    def scratch_kernel(x_ref, w_ref, o_ref, s_ref):
        s_ref[:] = x_ref[:].astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            s_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        got = pl.pallas_call(
            scratch_kernel,
            in_specs=[pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((256, 128), jnp.int8)],
            interpret=interpret, **compile_kwargs(interpret),
        )(jnp.asarray(x32), jnp.asarray(w8))
        want = x32.astype(np.int8).astype(np.int32) @ w8.astype(np.int32)
        ok = bool(np.array_equal(np.asarray(got), want))
        out("int8_scratch_dot", "OK exact" if ok else "COMPILED but wrong")
    except Exception as e:  # noqa: BLE001
        out("int8_scratch_dot", f"{type(e).__name__}: {str(e)[:200]}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
