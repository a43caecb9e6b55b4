"""TPU benchmark: fused Pallas conv3x3 vs the XLA channel-last baseline.

Usage: python -m keymorph_tpu.tools.pallas_conv_bench [--size 256] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from keymorph_tpu.tools.conv_microbench import conv_flops, time_stage


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--stages", default="l1c1,l1c2,l2c1,l2c2,d2c1,d2c2")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.ops.pallas import conv3d
    from keymorph_tpu.tools.conv_microbench import flagship_stages

    rng = np.random.default_rng(0)
    wanted = set(args.stages.split(","))
    print(f"# backend={jax.default_backend()} size={args.size} (Pallas fused "
          "norm+conv+relu, (Z,C,Y,X) layout)")
    total = 0.0
    for name, cin, cout, spatial in flagship_stages(args.size):
        if name not in wanted:
            continue
        Z, Y, X = spatial

        w = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32)
        ) * (1.0 / np.sqrt(27 * cin))
        scale = jnp.abs(jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))) + 0.5
        shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32)) * 0.1

        fn = jax.jit(
            lambda x, w, a, b: conv3d.conv3x3_fused(x, w, scale=a, shift=b, relu=True)
        )

        def args_fn():
            x = jnp.asarray(
                rng.normal(size=(Z, cin, Y, X)).astype(np.float32),
                dtype=jnp.bfloat16,
            )
            return (x, w, scale, shift)

        t0 = time.time()
        try:
            ms = time_stage(fn, args_fn, args.reps)
        except Exception as e:  # noqa: BLE001
            print(f"{name:5s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        gflop = conv_flops(cin, cout, spatial) / 1e9
        tflops = gflop / ms if ms > 0 else float("nan")
        total += ms
        print(f"{name:5s} {cin:4d}->{cout:4d} @{Z}x{Y}x{X}: {ms:8.2f} ms "
              f"{gflop:8.1f} GFLOP {tflops:6.1f} TFLOPS (wall {time.time()-t0:.0f}s)")
        sys.stdout.flush()
    print(f"# total {total:.1f} ms")


if __name__ == "__main__":
    main()
