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

ROWS, WB, L = 1024, 16, 128  # 1024^2-block tile shape x many tiles
REPS = 12  # elementwise passes per launch (VPU-bound kernel)
SCANS = 64  # kernel launches chained inside one program (RPC amortization)


def make(dtype):
    dt = jnp.dtype(dtype)

    def kernel(x_ref, n_ref, o_ref):
        x = x_ref[:]
        n = n_ref[:]
        b = dt.type(0.013)
        s = dt.type(0.31)
        # max-form lrelu: identical values to where(v>=0, v, 0.2v) and —
        # unlike the where-form — legal on bf16 vectors (Mosaic rejects
        # bf16 cmpf: "Target does not support this comparison")
        lrelu = lambda v: jnp.maximum(v, dt.type(0.2) * v) * dt.type(
            1.4142135623730951
        )
        for _ in range(REPS):
            x = lrelu(x + s * n + b)
        o_ref[:] = x

    def call(x, n):
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(x, n)

    # the ~33 ms host<->chip RPC dwarfs a single launch: scan SCANS
    # launches inside ONE program and fetch a checksum that depends on
    # all of them (docs/STATUS.md measurement hazard)
    @jax.jit
    def run(x, n):
        def body(c, _):
            y = call(x + c.astype(dt), n)
            return y.reshape(-1)[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            None, length=SCANS)
        return c

    x = jnp.full((ROWS, WB, L), 0.5, dt)
    n = jnp.full((ROWS, WB, L), -0.25, dt)
    return run, x, n


def main():
    print("devices:", jax.devices(), flush=True)
    progs = {d: make(d) for d in ("float32", "bfloat16")}
    for d, (run, x, n) in progs.items():
        import time as _t; t0 = _t.perf_counter()
        float(run(x, n))  # compile
        print(f"compiled {d} in {_t.perf_counter()-t0:.0f}s", flush=True)
    results = {d: [] for d in progs}
    for rnd in range(6):
        for d, (run, x, n) in progs.items():
            t0 = time.perf_counter()
            float(run(x, n))
            results[d].append(time.perf_counter() - t0)
    elems = ROWS * WB * L * REPS * SCANS
    for d, v in results.items():
        best = min(v)
        print(
            f"{d}: med {np.median(v)*1e3:.3f} ms best {best*1e3:.3f} ms "
            f"-> {elems/best/1e9:.1f} Gelem/s (chain of {REPS})",
            flush=True,
        )


if __name__ == "__main__":
    main()
