"""Trace keypoint extraction at a given resolution and print per-op times.

Attributes KeyMorphNet.get_keypoints (fast_extract on/off via
KM_NO_FAST_CONV / flag) at the flagship config so extraction work beyond
the conv kernels — norm stats, pools, layout copies, the CoM head — is
visible per fusion.

Usage: python -m keymorph_tpu.tools.extract_trace [S] [top_n]
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models import TruncatedUNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet
    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    net = KeyMorphNet(
        backbone=TruncatedUNet3D(
            out_channels=128, f_maps=32, num_levels=4, num_truncated_layers=1,
            dtype=jnp.bfloat16,
        ),
        num_keypoints=128,
        compute_dtype=jnp.bfloat16,
        fast_extract=True,
    )
    rng = np.random.default_rng(0)
    shape = (1, 1, S, S, S)
    imgs = [
        jnp.asarray(rng.uniform(0, 1, size=shape).astype(np.float32))
        for _ in range(3)
    ]
    params = net.init(jax.random.PRNGKey(0), imgs[0], imgs[0])
    fn = jax.jit(
        lambda p, im: net.apply(p, im, method=KeyMorphNet.get_keypoints)
    )
    t0 = time.time()
    fn(params, imgs[0]).block_until_ready()
    print(f"compile {time.time() - t0:.0f}s")
    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    for im in imgs:
        fn(params, im).block_until_ready()
    jax.profiler.stop_trace()
    total = 0.0
    for name, ms, count in summarize_trace(find_trace_file(td), top_n):
        total += ms
        print(f"{ms / 3:9.2f} ms  x{count:<4d} {name[:110]}")
    print(f"(top-{top_n} per-call total {total / 3:.1f} ms)")


if __name__ == "__main__":
    main()
