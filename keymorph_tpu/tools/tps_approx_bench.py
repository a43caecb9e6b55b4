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


def ranked_fidelity():
    """first-S vs mass-ranked-S center selection (VERDICT r4 #7).

    Extracts keypoints from a synthetic pair with a K-keypoint net twice —
    arbitrary channel order (KeyMorphNet.__call__) and heatmap-mass-ranked
    (pair_ranked_by_mass) — and measures the approximate-TPS flow
    discrepancy vs the exact K-center flow for both orderings.

    Usage: python -m keymorph_tpu.tools.tps_approx_bench --ranked \
               [size] [K] [S,S,...]   (defaults 128, 512, 64,128,256)
    """
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models import TruncatedUNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet, align_pair
    from keymorph_tpu.tools.weight_parity import make_subjects

    args = [a for a in sys.argv[2:]]
    size = int(args[0]) if len(args) > 0 else 128
    K = int(args[1]) if len(args) > 1 else 512
    Ss = [int(s) for s in (args[2].split(",") if len(args) > 2 else [64, 128, 256])]

    net = KeyMorphNet(
        backbone=TruncatedUNet3D(
            out_channels=K, f_maps=32, num_levels=4, num_truncated_layers=1,
            dtype=jnp.bfloat16,
        ),
        num_keypoints=K,
        compute_dtype=jnp.bfloat16,
    )
    imgs, _ = make_subjects(n_subjects=2, size=size, seed=3)
    img_f = jnp.asarray(imgs[0:1])
    img_m = jnp.asarray(imgs[1:2])
    params = net.init(jax.random.PRNGKey(0), img_f, img_m)

    first = jax.jit(lambda p, f, m: net.apply(p, f, m))(params, img_f, img_m)
    ranked = jax.jit(
        lambda p, f, m: net.apply(p, f, m, method=KeyMorphNet.pair_ranked_by_mass)
    )(params, img_f, img_m)
    spatial = (size,) * 3
    lmbda = jnp.asarray([1.0])

    def planes(pf, pm, S):
        return jax.jit(
            lambda a, b: align_pair(
                a, b, "tps", spatial, lmbda=lmbda, num_chunks=8,
                compute_grid="planes", tps_centers=S,
            )["planes"]
        )(pf, pm)

    # seg fidelity: hard Dice between the approx-flow-warped moving seg and
    # the exact-flow-warped one — "how much does the approximation change
    # the registration output", independent of absolute weight quality
    from keymorph_tpu.metrics import fast_dice
    from keymorph_tpu.ops.resample import align_planes

    _, segs = make_subjects(n_subjects=2, size=size, seed=3)
    seg_m = jnp.asarray(segs[1:2], jnp.float32)
    warp = jax.jit(lambda pl, s: align_planes(pl, s, mode="nearest"))

    def _hard_dice(a, b):  # label maps -> one-hot, fast_dice's contract
        labs = np.union1d(a, b)
        oh_a = np.stack([a == l for l in labs])[None].astype(np.float32)
        oh_b = np.stack([b == l for l in labs])[None].astype(np.float32)
        return float(fast_dice(oh_a, oh_b))

    exact_pl = planes(first[0], first[1], None)
    exact = np.asarray(exact_pl)
    seg_exact = np.asarray(warp(exact_pl, seg_m))[0, 0]
    print(f"# ranked-fidelity {size}^3 K={K} (exact flow from all K centers)")
    for S in Ss:
        for label, (pf, pm, _) in (("first", first), ("ranked", ranked)):
            pl = planes(pf, pm, S)
            d = np.abs(np.asarray(pl) - exact)
            seg_a = np.asarray(warp(pl, seg_m))[0, 0]
            dice = _hard_dice(seg_a, seg_exact)
            print(
                f"S={S:4d} {label:6s}: max|d| {d.max():.5f}  "
                f"mean|d| {d.mean():.6f} (grid units)  "
                f"dice-vs-exact {dice:.5f}"
            )
            sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ranked":
        ranked_fidelity()
    else:
        main()
