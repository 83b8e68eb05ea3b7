"""Does the v5e VPU run bf16 elementwise faster than fp32?

Gates the "bf16 elementwise inside the 1024^2 decoder kernel" candidate
(docs/KERNEL_NOTES.md headroom #1): a Pallas kernel running the decoder
block's exact post-matmul chain shape — lrelu(x + s*n + b) twice over a
(rows, 128)-lane map — in fp32 vs bf16, interleaved same-process (shared
chip discipline, docs/STATUS.md). If bf16 is ~1x, the candidate is dead on
arrival; if ~2x, thread an elem_dtype option through decoder_block_packed.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, WB, L = 2048, 16, 128  # 1024^2-block tile shape x many tiles
REPS = 24  # chain the pass REPS times so the kernel is VPU-bound


def make(dtype):
    dt = jnp.dtype(dtype)

    def kernel(x_ref, n_ref, o_ref):
        x = x_ref[:]
        n = n_ref[:]
        b = dt.type(0.013)
        s = dt.type(0.31)
        lrelu = lambda v: jnp.where(v >= 0, v, dt.type(0.2) * v) * dt.type(
            1.4142135623730951
        )
        for _ in range(REPS):
            x = lrelu(x + s * n + b)
        o_ref[:] = x

    @jax.jit
    def run(x, n):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[
                pl.BlockSpec((ROWS // 8, WB, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS // 8, WB, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS // 8, WB, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, WB, L), dt),
        )(x, n)

    x = jnp.full((ROWS, WB, L), 0.5, dt)
    n = jnp.full((ROWS, WB, L), -0.25, dt)
    return run, x, n


def main():
    print("devices:", jax.devices(), flush=True)
    progs = {d: make(d) for d in ("float32", "bfloat16")}
    for d, (run, x, n) in progs.items():
        float(run(x, n).astype(jnp.float32).mean())  # compile
    results = {d: [] for d in progs}
    for rnd in range(6):
        for d, (run, x, n) in progs.items():
            t0 = time.perf_counter()
            float(run(x, n).astype(jnp.float32).mean())
            results[d].append(time.perf_counter() - t0)
    elems = ROWS * WB * L * REPS
    for d, v in results.items():
        best = min(v)
        print(
            f"{d}: med {np.median(v)*1e3:.3f} ms best {best*1e3:.3f} ms "
            f"-> {elems/best/1e9:.1f} Gelem/s (chain of {REPS})",
            flush=True,
        )


if __name__ == "__main__":
    main()
