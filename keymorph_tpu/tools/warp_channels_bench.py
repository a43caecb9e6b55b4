"""Device-measure the multi-channel warp (one-hot segmentations, C = 5-50).

Answers the round-3 advisor question (ADVICE.md #1): at Xp=256 the group
band scratch is ~2.6 MiB/channel, so `_max_band_channels` chunks the group
path to cb=1 — one pallas_call per channel, each re-tiling planes and
re-running the `_group_starts` prepass. Does that chunk overhead beat the
per-sub-tile path (cb~3, 8x more DMAs each 8x smaller), and does raising
the budget (cb=2 per call) win?

Configs timed per (S, C):
  group    — shipped default (group DMA + 4 MiB budget)
  group8   — group DMA with KM_BAND_VMEM_MB=8 (cb doubles)
  nogroup  — KM_NO_WARP_GROUP=1 (per-sub-tile band DMAs)

Usage: python -m keymorph_tpu.tools.warp_channels_bench [S] [C,C,...] [deg scale]
Defaults: S=256, C=1,6,14, smooth flow (4 deg, 1.04 — the small rung, like
real bench TPS flows). Timing: device trace, jit-span mean over 3 varied
inputs (the tunnel memoizes identical dispatches).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

CONFIGS = [
    ("group", {}),
    ("group8", {"KM_BAND_VMEM_MB": "8"}),
    ("nogroup", {"KM_NO_WARP_GROUP": "1"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace
    from keymorph_tpu.tools.warp_tile_sweep import _rot_scale_planes

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    Cs = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else [1, 6, 14])]
    deg = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    scale = float(sys.argv[4]) if len(sys.argv) > 4 else 1.04
    rng = np.random.default_rng(0)
    planes = jnp.asarray(_rot_scale_planes(S, deg, scale))

    from keymorph_tpu.ops.pallas import resample3d as _r

    assert bool(_r._tile_spans_fit(planes[0], (S, S, S), nearest=False)), (
        "flow exceeds the kernel windows: this would time the XLA fallback"
    )

    for C in Cs:
        srcs = [
            jnp.asarray(rng.random((1, C, S, S, S), dtype=np.float32))
            for _ in range(3)
        ]
        ref = None
        for name, env in CONFIGS:
            for k in ("KM_BAND_VMEM_MB", "KM_NO_WARP_GROUP"):
                os.environ.pop(k, None)
            os.environ.update(env)
            cb_g = _r._max_band_channels((S, S, S), group_win=_r._GROUP_WIN)
            fn = jax.jit(lambda im, pe: _r.warp_planes(im, pe))
            t0 = time.time()
            try:
                out = fn(srcs[0], planes)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                print(f"C={C} {name}: FAIL {str(e)[:160]}")
                sys.stdout.flush()
                continue
            if ref is None:
                ref = np.asarray(out)
            else:
                d = float(np.abs(np.asarray(out) - ref).max())
                assert d < 1e-5, f"C={C} {name}: result mismatch {d}"
            td = tempfile.mkdtemp()
            jax.profiler.start_trace(td)
            for im in srcs:
                fn(im, planes).block_until_ready()
            jax.profiler.stop_trace()
            rows = summarize_trace(find_trace_file(td), 5)
            top = [r for r in rows if "jit" in r[0]]
            ms = top[0][1] / top[0][2] if top else float("nan")
            print(
                f"C={C} {name}: {ms:.2f} ms (group-cb={cb_g}, "
                f"wall {time.time()-t0:.0f}s)"
            )
            sys.stdout.flush()
        for k in ("KM_BAND_VMEM_MB", "KM_NO_WARP_GROUP"):
            os.environ.pop(k, None)


if __name__ == "__main__":
    main()
