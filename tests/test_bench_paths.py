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


def _tiny_net_and_inputs():
    import jax
    import jax.numpy as jnp

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
    return net, params, img_f, img_m


def test_bench_degrade_is_reported(monkeypatch):
    """A full-config compile failure must (a) fall back to the proven config
    and (b) come back flagged degraded with its kill-switches recorded —
    a Mosaic regression must not silently publish fallback perf as the
    full-kernel number."""
    import bench

    net, params, img_f, img_m = _tiny_net_and_inputs()
    for k in bench.KILL_SWITCH_ENVS:
        monkeypatch.delenv(k, raising=False)

    real_build = bench.build_register
    calls = []

    def failing_build(net_, num_chunks, planes=True):
        calls.append(planes)
        if planes:
            raise RuntimeError("simulated Mosaic lowering failure")
        return real_build(net_, num_chunks, planes=planes)

    monkeypatch.setattr(bench, "build_register", failing_build)
    register, degraded, planes = bench.build_register_with_degrade(
        net, params, img_f, img_m, num_chunks=4
    )
    assert degraded is True and planes is False
    assert calls == [True, False]
    switches = bench.active_kill_switches()
    assert switches.get("KM_NO_WARP_GROUP") == "1"
    assert "KM_WARP_TILES" in switches
    # the degraded register fn still registers
    out = register(params, img_f, img_m)
    assert out.shape == img_m.shape


def test_bench_no_degrade_when_full_config_compiles(monkeypatch):
    import bench

    net, params, img_f, img_m = _tiny_net_and_inputs()
    for k in bench.KILL_SWITCH_ENVS:
        monkeypatch.delenv(k, raising=False)
    register, degraded, planes = bench.build_register_with_degrade(
        net, params, img_f, img_m, num_chunks=4
    )
    assert degraded is False and planes is True
    assert bench.active_kill_switches() == {}


def test_bench_stage_builders_cover_register():
    """extract+solve_flow+warp composed == the fused register program."""
    import jax.numpy as jnp

    import bench

    net, params, img_f, img_m = _tiny_net_and_inputs()
    extract, solve_flow, warp = bench.build_stages(net, 4, planes=True)
    pts_f = extract(params, img_f)
    pts_m = extract(params, img_m)
    flow = solve_flow(pts_f, pts_m, tuple(img_f.shape[2:]))
    out_stages = warp(flow, img_m)
    out_fused = bench.build_register(net, num_chunks=4, planes=True)(
        params, img_f, img_m
    )
    np.testing.assert_allclose(
        np.asarray(out_stages, np.float32),
        np.asarray(out_fused, np.float32),
        atol=2e-5,
    )
