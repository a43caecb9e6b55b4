"""Per-op device attribution of the canonical 128^3 training step.

Runs the jitted train step under a profiler trace and prints the top device
ops — the training analog of extract_trace.py. Use it to find where the
~400 ms/step goes (extraction fwd/bwd, warp VJP gathers, flow VJP, Adam).

Usage: python -m keymorph_tpu.tools.train_step_trace [S] [top_n] [fast01]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if len(sys.argv) > 3:
        os.environ["KM_TRAIN_FAST_EXTRACT"] = sys.argv[3]

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models import TruncatedUNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet
    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace
    from keymorph_tpu.training.config import Config
    from keymorph_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    net = KeyMorphNet(
        backbone=TruncatedUNet3D(
            out_channels=128, f_maps=32, num_levels=4, num_truncated_layers=1,
            dtype=jnp.bfloat16,
        ),
        num_keypoints=128,
        compute_dtype=jnp.bfloat16,
    )
    config = Config(
        num_keypoints=128,
        transform_type="tps_loguniform",
        loss_fn="mse",
        max_train_keypoints=64,
    )
    rng = np.random.default_rng(0)
    shape = (1, 1, S, S, S)
    img_f = jnp.asarray(rng.uniform(0, 1, size=shape).astype(np.float32))
    imgs_m = [
        jnp.asarray(rng.uniform(0, 1, size=shape).astype(np.float32))
        for _ in range(3)
    ]
    params = net.init(jax.random.PRNGKey(0), img_f, imgs_m[0])
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, m = step(state, key, img_f, imgs_m[0], None, None, jnp.float32(1.0))
    jax.block_until_ready(m)
    print(f"compile {time.time() - t0:.0f}s")

    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    for im in imgs_m:
        key, sub = jax.random.split(key)
        state, m = step(state, sub, img_f, im, None, None, jnp.float32(1.0))
        jax.block_until_ready(m)
    jax.profiler.stop_trace()
    total = 0.0
    for name, ms, count in summarize_trace(find_trace_file(td), top_n):
        if "jit" in name and count <= 3:
            print(f"{'':9}        -- {name[:110]}: {ms / 3:.1f} ms/step")
            continue
        total += ms
        print(f"{ms / 3:9.2f} ms  x{count:<4d} {name[:110]}")
    print(f"(top-{top_n} per-step total {total / 3:.1f} ms)")


if __name__ == "__main__":
    main()
