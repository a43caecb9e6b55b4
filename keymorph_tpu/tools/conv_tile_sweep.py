"""Sweep KM_CONV_TILES variants for selected conv shapes on the TPU.

Usage: python -m keymorph_tpu.tools.conv_tile_sweep
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

CASES = [
    # (name, Z, cin, cout, Y, X, [tiles...])
    ("l1c2", 256, 16, 32, 256, 256, ["4,16,16", "4,32,16", "8,16,16", "2,32,16"]),
    ("d2c1", 128, 192, 64, 128, 128, ["2,16,64", "2,8,96", "2,16,96", "4,8,64"]),
    ("d2c2", 128, 64, 64, 128, 128, ["2,16,64", "4,8,64", "2,8,64"]),
]


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    rng = np.random.default_rng(0)
    for name, Z, cin, cout, Y, X, variants in CASES:
        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32)
        ) * (27 * cin) ** -0.5
        for tiles in variants:
            os.environ["KM_CONV_TILES"] = tiles
            # fresh import state not needed: tiles read per call
            from keymorph_tpu.ops.pallas import conv3d

            fn = jax.jit(lambda x, w: conv3d.conv3x3_fused(x, w, relu=True))

            def mk():
                return jnp.asarray(
                    rng.normal(size=(Z, cin, Y, X)).astype(np.float32),
                    dtype=jnp.bfloat16,
                )

            t0 = time.time()
            try:
                out = fn(mk(), w)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                print(f"{name} {tiles}: FAIL {str(e)[:80]}")
                sys.stdout.flush()
                continue
            td = tempfile.mkdtemp()
            jax.profiler.start_trace(td)
            for _ in range(3):
                fn(mk(), w).block_until_ready()
            jax.profiler.stop_trace()
            rows = summarize_trace(find_trace_file(td), 5)
            top = [r for r in rows if "jit" in r[0]]
            ms = top[0][1] / top[0][2] if top else float("nan")
            print(f"{name} {tiles}: {ms:.2f} ms (wall {time.time()-t0:.0f}s)")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
