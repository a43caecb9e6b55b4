"""Device-time the canonical 128^3 training step, flax vs fused extraction.

The training factories default to the flax (channel-last) extraction path
(`models.keymorph.train_extract_net`): the fused conv kernel only
accelerates the forward, and its custom-VJP backward runs XLA convs in the
kernel's (Z, C, Y, X) layout, whose backward layouts are untuned. This
measures the actual trade on the canonical half-res training config
(truncatedunet f_maps=32, tps_loguniform, on-device augmentation,
64-keypoint subsample, Adam) so the KM_TRAIN_FAST_EXTRACT default is an
informed choice.

Usage: python -m keymorph_tpu.tools.train_step_bench [S]
Env: KM_TSB_KP (keypoints, default 128; the 256^3 flagship is 256 —
     reference README.md:187-199), KM_TSB_MODES ("flax,fast" default;
     "fast" alone for the big configs), KM_TSB_REMAT=1 (U-Net gradient
     checkpointing, the HBM lever at 256^3).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


def run_one(S: int, fast: bool):
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

    os.environ["KM_TRAIN_FAST_EXTRACT"] = "1" if fast else "0"
    kp = int(os.environ.get("KM_TSB_KP", "128"))
    remat = os.environ.get("KM_TSB_REMAT") == "1"
    net = KeyMorphNet(
        backbone=TruncatedUNet3D(
            out_channels=kp, f_maps=32, num_levels=4, num_truncated_layers=1,
            dtype=jnp.bfloat16, use_checkpoint=remat,
        ),
        num_keypoints=kp,
        compute_dtype=jnp.bfloat16,
    )
    config = Config(
        num_keypoints=kp,
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
    compile_s = time.time() - t0

    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    for i, im in enumerate(imgs_m):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, img_f, im, None, None, jnp.float32(1.0))
        jax.block_until_ready(m)
    jax.profiler.stop_trace()
    rows = summarize_trace(find_trace_file(td), 5)
    top = [r for r in rows if "jit" in r[0]]
    ms = top[0][1] / top[0][2] if top else float("nan")
    print(
        f"fast_extract={fast}: {ms:.1f} ms/step (compile {compile_s:.0f}s, "
        f"loss {float(m['loss']):.4f})"
    )
    sys.stdout.flush()


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    modes = os.environ.get("KM_TSB_MODES", "flax,fast").split(",")
    for mode in modes:
        run_one(S, mode.strip() == "fast")


if __name__ == "__main__":
    main()
