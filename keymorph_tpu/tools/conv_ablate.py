"""Attribute the Pallas conv kernel's per-cell time by ablation.

Times one stage (default l1c2, the kernel's worst roofline gap: 27 ms at
~17 TF where MXU-shape theory says ~5-7 ms) under timing-only kernel
ablations (KM_CONV_ABLATE — numerics intentionally wrong):

    full     the shipped kernel
    noroll   dx combine without the lane rolls/masks   -> roll cost
    nostack  skip the tap-stack VMEM copies            -> copy cost
    nomm     skip the matmul                           -> MXU cost

Each variant runs in a fresh jit (env read at trace time). Device-trace
timed; inputs re-randomized per rep (the tunnel memoizes dispatches).

Usage: python -m keymorph_tpu.tools.conv_ablate [--size 256] [--stage l1c2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--stage", default="l1c2")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.ops.pallas import conv3d
    from keymorph_tpu.tools.conv_microbench import (
        conv_flops,
        flagship_stages,
        time_stage,
    )

    stages = {n: (ci, co, sp) for n, ci, co, sp in flagship_stages(args.size)}
    cin, cout, spatial = stages[args.stage]
    Z, Y, X = spatial
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, (cin,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, (cin,)).astype(np.float32))
    gflop = conv_flops(cin, cout, spatial) / 1e9

    def args_fn():
        return (
            jnp.asarray(
                rng.normal(0, 1, (Z, cin, Y, X)).astype(np.float32)
            ).astype(jnp.bfloat16),
        )

    results = {}
    for variant in ("full", "noroll", "nostack", "nomm"):
        if variant == "full":
            os.environ.pop("KM_CONV_ABLATE", None)
        else:
            os.environ["KM_CONV_ABLATE"] = variant

        @jax.jit
        def run(x, _v=variant):  # _v forces a fresh trace per variant
            return conv3d._conv_pallas(
                x, w, scale, shift, None, True,
                jax.default_backend() == "cpu",
            )

        ms = time_stage(run, args_fn, args.reps)
        results[variant] = ms
        tf = gflop / ms if ms == ms and ms > 0 else float("nan")
        print(f"{args.stage} {variant:8s}: {ms:7.2f} ms  ({tf:5.1f} TF)")
        sys.stdout.flush()
    os.environ.pop("KM_CONV_ABLATE", None)

    full = results.get("full", float("nan"))
    for v in ("noroll", "nostack", "nomm"):
        if v in results and results[v] == results[v]:
            print(f"  {v[2:]:6s} cost ~= {full - results[v]:6.2f} ms")


if __name__ == "__main__":
    main()
