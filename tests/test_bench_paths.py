"""bench.py's two register builders (planes-native primary, grid-path
fallback) must compute the same registration — the self-degrading fallback
(bench.py main) swaps them when the newest kernels fail to compile."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_bench_register_planes_matches_grid():
    import bench
    from keymorph_tpu.models import TruncatedUNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet

    net = KeyMorphNet(
        backbone=TruncatedUNet3D(
            out_channels=16, f_maps=8, num_levels=3, num_truncated_layers=1,
            dtype=jnp.bfloat16,
        ),
        num_keypoints=16,
        compute_dtype=jnp.bfloat16,
    )
    shape = (1, 1, 16, 16, 32)
    img_f = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32)
    img_m = jax.random.uniform(jax.random.PRNGKey(1), shape, jnp.float32)
    params = net.init(jax.random.PRNGKey(2), img_f, img_m)

    out_p = bench.build_register(net, num_chunks=4, planes=True)(
        params, img_f, img_m
    )
    out_g = bench.build_register(net, num_chunks=4, planes=False)(
        params, img_f, img_m
    )
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_g, np.float32), atol=5e-4
    )
