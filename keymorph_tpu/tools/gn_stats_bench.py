"""Microbench: per-channel GroupNorm statistics on (Z, C, Y, X) volumes.

fast_unet._gn_affine pays a full-volume read per SingleConv to get
per-channel mean / mean-square (PERF.md: ~19 ms of reduce fusions per
256^3 extraction, ~15x over the HBM roofline of ~1.2 ms). This compares:

  a) reduce:  jnp.mean over (Z, Y, X) — the shipped formulation
  b) matmul:  ones-vector contraction on the MXU — sum_n x[z,c,n] * 1
     (reductions ride the MXU instead of the VPU reduce fusion); the
     square for msq is a separate elementwise pass XLA may fuse.
  c) fp32 accumulate variants of both (bf16 inputs).

Usage: python -m keymorph_tpu.tools.gn_stats_bench
"""

from __future__ import annotations

import tempfile
import time

import numpy as np

SHAPES = [
    # (name, Z, C, Y, X) — the extraction's stat inputs at 256^3 flagship
    ("l1c2-in", 256, 16, 256, 256),
    ("l2c1-in", 128, 32, 128, 128),
    ("d2c2-in", 128, 64, 128, 128),
]


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    rng = np.random.default_rng(0)

    def reduce_stats(x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 2, 3))
        m2 = jnp.mean(jnp.square(xf), axis=(0, 2, 3))
        return m, m2

    def matmul_stats(x):
        Z, C, Y, X = x.shape
        n = Z * Y * X
        xr = x.reshape(Z, C, Y * X)
        ones = jnp.ones((Y * X,), jnp.float32)
        s = jax.lax.dot_general(
            xr.astype(jnp.float32), ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).sum(0)
        s2 = jax.lax.dot_general(
            jnp.square(xr.astype(jnp.float32)), ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).sum(0)
        return s / n, s2 / n

    for name, Z, C, Y, X in SHAPES:
        for label, fn in (("reduce", reduce_stats), ("matmul", matmul_stats)):
            f = jax.jit(fn)
            xs = [
                jnp.asarray(
                    rng.normal(size=(Z, C, Y, X)).astype(np.float32),
                    dtype=jnp.bfloat16,
                )
                for _ in range(3)
            ]
            t0 = time.time()
            m, m2 = f(xs[0])
            m.block_until_ready()
            td = tempfile.mkdtemp()
            jax.profiler.start_trace(td)
            for x in xs:
                a, b = f(x)
                a.block_until_ready()
                b.block_until_ready()
            jax.profiler.stop_trace()
            rows = summarize_trace(find_trace_file(td), 5)
            top = [r for r in rows if "jit" in r[0]]
            ms = top[0][1] / top[0][2] if top else float("nan")
            print(f"{name} {label}: {ms:.2f} ms (wall {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
