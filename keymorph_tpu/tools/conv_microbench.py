"""Per-op microbenchmarks for the backbone extraction stack.

Times each conv/GN/pool stage of the flagship TruncatedUNet (f_maps=32,
num_levels=4, bf16) at its real spatial size, one jitted op per trace, so the
extraction wall (PERF.md: 182 ms/volume at 256^3) can be attributed op by op
and each candidate Pallas kernel can be compared against its XLA baseline in
isolation.

Usage:
    python -m keymorph_tpu.tools.conv_microbench [--size 256] [--reps 3]
           [--stages l1c1,l1c2,...]

Device-trace timed (host wall-clock over the axon tunnel is unreliable);
inputs are re-randomized per rep (the tunnel memoizes identical dispatches).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def flagship_stages(size: int):
    """(name, Cin, Cout, spatial) for every conv of the flagship backbone."""
    s = size
    st = []
    # encoder: DoubleConv(gcr) per level, MaxPool(2) between levels
    st.append(("l1c1", 1, 16, (s, s, s)))
    st.append(("l1c2", 16, 32, (s, s, s)))
    st.append(("l2c1", 32, 32, (s // 2,) * 3))
    st.append(("l2c2", 32, 64, (s // 2,) * 3))
    st.append(("l3c1", 64, 64, (s // 4,) * 3))
    st.append(("l3c2", 64, 128, (s // 4,) * 3))
    st.append(("l4c1", 128, 128, (s // 8,) * 3))
    st.append(("l4c2", 128, 256, (s // 8,) * 3))
    # decoders (truncated=1): sum/concat joins then DoubleConv(decoder)
    st.append(("d1c1", 384, 128, (s // 4,) * 3))
    st.append(("d1c2", 128, 128, (s // 4,) * 3))
    st.append(("d2c1", 192, 64, (s // 2,) * 3))
    st.append(("d2c2", 64, 64, (s // 2,) * 3))
    st.append(("head", 64, 128, (s // 2,) * 3))  # 1x1 conv
    return st


def conv_flops(cin, cout, spatial, k=3):
    return 2 * int(np.prod(spatial)) * (k**3 if k == 3 else 1) * cin * cout


def time_stage(fn, args_fn, reps):
    """Compile, then trace `reps` calls with fresh inputs; return mean device
    ms per call (sum of device-lane events / reps)."""
    import jax

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace
    import tempfile

    out = fn(*args_fn())
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="convbench_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(reps):
        out = fn(*args_fn())
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    trace = find_trace_file(trace_dir)
    if trace is None:
        return float("nan")
    rows = summarize_trace(trace, top_n=200)
    total = sum(ms for name, ms, _ in rows)
    return total / reps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--stages", default=None, help="comma list; default all")
    p.add_argument("--mode", default="gcr", choices=["gcr", "conv", "gn"],
                   help="gcr = GroupNorm+conv+ReLU; conv = conv only; gn = GroupNorm only")
    p.add_argument("--stats", default="none", choices=["none", "fused", "split"],
                   help="append the next conv's per-channel (mean, msq) stats "
                        "epilogue (fast_unet._channel_stats): 'fused' lets XLA "
                        "fuse it into the conv (forces an f32 output layout — "
                        "the d1c1 33.7 TF suspect); 'split' puts an "
                        "optimization_barrier between conv and stats")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    wanted = set(args.stages.split(",")) if args.stages else None

    print(f"# backend={jax.default_backend()} dtype={dtype} size={args.size} "
          f"mode={args.mode}")
    results = {}
    for name, cin, cout, spatial in flagship_stages(args.size):
        if wanted and name not in wanted:
            continue
        k = 1 if name == "head" else 3
        groups = 1 if cin < 8 else 8

        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                if args.mode in ("gcr", "gn"):
                    x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype)(x)
                if args.mode == "gn":
                    return x
                x = nn.Conv(cout, kernel_size=(k,) * 3, padding=k // 2,
                            use_bias=False, dtype=dtype)(x)
                if args.mode == "gcr":
                    x = jax.nn.relu(x)
                return x

        mod = Stage()
        x0 = jnp.asarray(rng.normal(size=(1, *spatial, cin)).astype(np.float32),
                         dtype=dtype)
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)
        if args.stats == "none":
            fn = jax.jit(mod.apply)
        else:
            def apply_with_stats(p, x):
                out = mod.apply(p, x)
                if args.stats == "split":
                    out = jax.lax.optimization_barrier(out)
                of = out.astype(jnp.float32)
                axes = tuple(range(out.ndim - 1))
                return out, jnp.mean(of, axes), jnp.mean(jnp.square(of), axes)

            fn = jax.jit(apply_with_stats)

        def args_fn():
            x = jnp.asarray(
                rng.normal(size=(1, *spatial, cin)).astype(np.float32), dtype=dtype
            )
            return (params, x)

        t0 = time.time()
        ms = time_stage(fn, args_fn, args.reps)
        gflop = conv_flops(cin, cout, spatial, k) / 1e9
        tflops = gflop / ms if ms == ms and ms > 0 else float("nan")
        results[name] = ms
        print(f"{name:5s} {cin:4d}->{cout:4d} @{spatial[0]}^3 k={k}: "
              f"{ms:8.2f} ms  {gflop:8.1f} GFLOP  {tflops:6.1f} TFLOPS "
              f"(wall {time.time()-t0:.0f}s)")
        sys.stdout.flush()
    total = sum(results.values())
    print(f"# total {total:.1f} ms over {len(results)} stages")


if __name__ == "__main__":
    main()
