"""Attribute the Pallas warp kernel's device time via KM_WARP_ABLATE.

Times the 256^3 single-channel warp (same representative flow as
warp_tile_sweep) under each ablation mode; deltas vs the baseline localize
the cost between the band DMAs, the one-hot weight build, the x-window
roll, and the trilerp matmul. Most modes compute WRONG results — this is a
timing tool only. Exception: `fatoh` (correct: the pre-round-3 full (R, B)
hat build; the separable build is now the default after it measured 6.4 ms
faster at the 256^3 small rung).

Usage: python -m keymorph_tpu.tools.warp_ablate [S] [mode,mode,...] [deg scale]

Flow presets: the default (14 deg, 1.10) spans (15, 20, 36) per tile — the
BIG window rung. `deg scale` = `4 1.04` spans (8, 17, 35) — fits the SMALL
(8, 24, 64) rung, like real bench TPS flows (measured (7, 18, 33) at 256^3).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

MODES = ["", "fatoh", "nooh", "noroll", "nomm", "nodma"]


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace
    from keymorph_tpu.tools.warp_tile_sweep import _rot_scale_planes

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else MODES
    deg = float(sys.argv[3]) if len(sys.argv) > 3 else 14.0
    scale = float(sys.argv[4]) if len(sys.argv) > 4 else 1.10
    rng = np.random.default_rng(0)
    planes = jnp.asarray(_rot_scale_planes(S, deg, scale))

    from keymorph_tpu.ops.pallas import resample3d as _r

    assert bool(
        _r._tile_spans_fit(planes[0], (S, S, S), nearest=False)
    ), "flow exceeds the kernel windows: this would time the XLA fallback"
    spans = _r._tile_spans(planes[0], (S, S, S), nearest=False)
    for w in _r._tile_config()[1]:
        eff = _r._effective_win(w, (S, S, S))
        if bool(jnp.all(spans <= jnp.asarray(eff, jnp.float32))):
            print(f"# flow spans {np.asarray(spans)} -> window rung {eff}")
            break
    srcs = [
        jnp.asarray(rng.random((1, 1, S, S, S), dtype=np.float32))
        for _ in range(3)
    ]

    from keymorph_tpu.ops.pallas import resample3d

    for mode in modes:
        os.environ["KM_WARP_ABLATE"] = mode
        fn = jax.jit(lambda im, pe: resample3d.warp_planes(im, pe))
        t0 = time.time()
        try:
            fn(srcs[0], planes).block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"{mode or 'baseline'}: FAIL {str(e)[:160]}")
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
        print(f"{mode or 'baseline'}: {ms:.2f} ms (wall {time.time()-t0:.0f}s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
