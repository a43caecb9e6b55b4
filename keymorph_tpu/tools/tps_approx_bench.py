"""Device-measure the approximate-TPS serving win at large keypoint counts.

The reference's ApproximateTPS intent (keypoint_aligners.py:468-590, a
commented-out experiment) is a serving lever for K >= 256 keypoints: fit
against only S RBF centers so the dense-flow contraction is O(S) per voxel
instead of O(K). This times the solve+flow stage (planes-native, the bench
serving path) at K keypoints, exact vs approximate, plus the flow parity
between them.

Usage: python -m keymorph_tpu.tools.tps_approx_bench [size] [K] [S,S,...]
Defaults: size=256, K=512, S=128,256. Timing: device trace, jit-span mean
over 3 varied inputs (the tunnel memoizes identical dispatches).
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models.keymorph import align_pair
    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    Ss = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else [128, 256])]
    spatial = (size, size, size)
    rng = np.random.default_rng(0)

    def make_points():
        pf = rng.uniform(-0.7, 0.7, (1, K, 3)).astype(np.float32)
        pm = pf + 0.05 * rng.normal(size=(1, K, 3)).astype(np.float32)
        return jnp.asarray(pf), jnp.asarray(pm)

    triples = [make_points() for _ in range(3)]
    lmbda = jnp.asarray([1.0])

    def solve_flow(tps_centers):
        def fn(pf, pm):
            return align_pair(
                pf, pm, "tps", spatial, lmbda=lmbda, num_chunks=8,
                compute_grid="planes", tps_centers=tps_centers,
            )["planes"]
        return jax.jit(fn)

    results = {}
    for label, S in [("exact", None)] + [(f"S={s}", s) for s in Ss]:
        fn = solve_flow(S)
        t0 = time.time()
        out = fn(*triples[0])
        out.block_until_ready()
        if label == "exact":
            ref = np.asarray(out)
        else:
            d = float(np.abs(np.asarray(out) - ref).max())
            print(f"# {label} flow max|d| vs exact: {d:.4f} (approximation error)")
        td = tempfile.mkdtemp()
        jax.profiler.start_trace(td)
        for pf, pm in triples:
            fn(pf, pm).block_until_ready()
        jax.profiler.stop_trace()
        rows = summarize_trace(find_trace_file(td), 5)
        top = [r for r in rows if "jit" in r[0]]
        ms = top[0][1] / top[0][2] if top else float("nan")
        results[label] = ms
        print(
            f"solve+flow {size}^3 K={K} {label}: {ms:.2f} ms "
            f"(wall {time.time()-t0:.0f}s)"
        )
        sys.stdout.flush()
    if "exact" in results:
        for label, ms in results.items():
            if label != "exact" and np.isfinite(ms):
                print(f"# speedup {label}: {results['exact']/ms:.2f}x")


if __name__ == "__main__":
    main()
