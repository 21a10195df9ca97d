"""Shared Mosaic compile options for the Pallas kernels.

v5e has 128 MiB of VMEM per core, but Mosaic caps a kernel's scoped-VMEM
(stack) allocation at 16 MiB by default. Deep-forest table working sets
legitimately exceed that (observed compile failures: depth-12 rank split
mode needs 16.28 MiB, covtype-class VMEM_FOREST fold 16.64 MiB) even though
they fit the chip comfortably. Raise the cap so feasibility is governed by
the engines' calibrated vmem estimates plus the physical budget, not the
conservative default. 64 MiB leaves half the VMEM for the pipeline's
double-buffered input blocks.

(The reference's analog is the 0.8 * sharedMemPerBlock budget it checks
before launching smem-resident kernels, Struct.h:215-228.)
"""
from __future__ import annotations

VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def compile_kwargs(interpret: bool) -> dict:
    """Extra pl.pallas_call kwargs; empty under the CPU interpreter."""
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        )
    }
