"""Sweep KM_WARP_TILES variants for the Pallas warp kernel on the TPU.

Times a 256^3 single-channel trilinear warp under a representative worst
case registration flow (15 deg oblique rotation + 1.15 scale — the spans
the windows were originally sized against) and reports whether the
exactness prepass accepts the config (fits=False means the config would
fall back to the XLA gather on such flows, i.e. it is unusable as a
default no matter how fast the kernel is).

Usage: python -m keymorph_tpu.tools.warp_tile_sweep [S]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

CONFIGS = [
    "4,8,32,16,40,64",   # shipped BIG ladder rung (round-2 default)
    "4,8,32,8,24,64",    # shipped SMALL ladder rung (smooth flows)
    "4,8,32,16,32,64",   # YW 40->32
    "4,8,32,8,16,64",    # even smaller y window (spans permitting)
    "8,8,16,16,24,32",   # cubier tile: R and XW both shrink
    "4,16,16,16,32,32",
]


def _rot_scale_planes(S: int, deg: float = 14.0, scale: float = 1.10) -> np.ndarray:
    """(1, 3, S, S, S) ij-ordered normalized sample coords for an oblique
    rotation + uniform scale about the volume center.

    The defaults (14 deg, 1.10) give per-tile spans (15, 20, 36) — just
    inside the shipped (16, 40, 64) windows at every S, so the kernel path
    (not the XLA fallback) is what gets timed. 15 deg + 1.15 has a z-span
    of 17 and silently falls back."""
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    A = scale * (rz @ ry)
    ax = np.linspace(-1 + 1 / S, 1 - 1 / S, S, dtype=np.float64)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([zz, yy, xx], 0).reshape(3, -1)
    return (A @ pts).reshape(1, 3, S, S, S).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    deg = float(sys.argv[2]) if len(sys.argv) > 2 else 14.0
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.10
    rng = np.random.default_rng(0)
    # pick the flow to match the rung under test: 14/1.10 exercises the big
    # windows; 4/1.04 fits the small (8, 24, 64) rung (bench-like flows)
    planes_np = _rot_scale_planes(S, deg, scale)
    srcs = [
        jnp.asarray(rng.random((1, 1, S, S, S), dtype=np.float32))
        for _ in range(3)
    ]  # varied inputs: the tunnel memoizes repeated identical dispatches

    for cfg in CONFIGS:
        os.environ["KM_WARP_TILES"] = cfg
        from keymorph_tpu.ops.pallas import resample3d

        planes = jnp.asarray(planes_np)
        fits = bool(resample3d._tile_spans_fit(planes[0], (S, S, S), nearest=False))
        fn = jax.jit(lambda im, pe: resample3d.warp_planes(im, pe))
        t0 = time.time()
        try:
            fn(srcs[0], planes).block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"{cfg}: FAIL {str(e)[:100]}")
            sys.stdout.flush()
            continue
        td = tempfile.mkdtemp()
        jax.profiler.start_trace(td)
        for im in srcs:
            fn(im, planes).block_until_ready()
        jax.profiler.stop_trace()
        rows = summarize_trace(find_trace_file(td), 5)
        top = [r for r in rows if "jit" in r[0]]
        ms = top[0][1] / top[0][2] if top else float("nan")
        print(f"{cfg}: fits={fits} {ms:.2f} ms (wall {time.time()-t0:.0f}s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
