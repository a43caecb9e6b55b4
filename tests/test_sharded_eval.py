"""Multi-chip eval fan-out: pairs sharded over the mesh must reproduce
single-device registration results exactly."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from keymorph_tpu.models import UNet3D
from keymorph_tpu.models.keymorph import KeyMorphNet, align_pair
from keymorph_tpu.parallel import make_mesh, make_sharded_register_fn
from keymorph_tpu.parallel.sharded import make_sharded_groupwise_fn
from keymorph_tpu.training.config import Config


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    net = KeyMorphNet(
        backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2), num_keypoints=8
    )
    imgs_f = jnp.asarray(rng.normal(size=(8, 1, 12, 12, 12)).astype(np.float32))
    imgs_m = jnp.asarray(rng.normal(size=(8, 1, 12, 12, 12)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), imgs_f[:1], imgs_m[:1])
    return net, params, imgs_f, imgs_m


def test_sharded_register_matches_single(setup):
    net, params, imgs_f, imgs_m = setup
    config = Config(num_keypoints=8, transform_type="affine")
    mesh = make_mesh(num_devices=8, space=1)
    fn = make_sharded_register_fn(net, config, mesh)
    grid_sh, pf_sh, pm_sh = fn(params, imgs_f, imgs_m)

    # single-device reference, pair by pair
    for i in range(8):
        pf, pm, _ = net.apply(params, imgs_f[i : i + 1], imgs_m[i : i + 1])
        out = align_pair(pf, pm, "affine", imgs_f.shape[2:], compute_grid=True)
        # batched (B=8) vs single (B=1) conv reductions differ in the last
        # ulps; the closed-form fit amplifies slightly
        np.testing.assert_allclose(
            np.asarray(grid_sh[i]), np.asarray(out["grid"][0]), atol=5e-4
        )


def test_sharded_register_tps(setup):
    net, params, imgs_f, imgs_m = setup
    config = Config(num_keypoints=8, transform_type="tps_0.5")
    mesh = make_mesh(num_devices=4, space=2)
    fn = make_sharded_register_fn(net, config, mesh)
    grid_sh, _, _ = fn(params, imgs_f, imgs_m)
    assert grid_sh.shape == (8, 12, 12, 12, 3)
    assert np.isfinite(np.asarray(grid_sh)).all()


def test_run_eval_fanout_matches_sequential(setup, tmp_path):
    """The harness-level fan-out (run_eval with a mesh, VERDICT item 3) must
    produce the same metric dict and per-pair artifacts as the sequential
    per-pair path."""
    from keymorph_tpu.cli.eval_pairwise import run_eval
    from keymorph_tpu.models.keymorph import KeyMorph
    from keymorph_tpu.models import UNet3D

    rng = np.random.default_rng(3)
    model = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2), num_keypoints=8
    )
    model.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 1, 12, 12, 12)))
    model.eval()

    def make_loader():
        items = []
        for i in range(5):  # odd count: exercises the padded partial flush
            f = {
                "img": rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32),
                "seg": rng.integers(0, 3, size=(1, 1, 12, 12, 12)),
                "affine": np.eye(4, dtype=np.float32)[None],
                "modality": ["T1"],
            }
            m = {
                "img": rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32),
                "seg": rng.integers(0, 4, size=(1, 1, 12, 12, 12)),
                "affine": np.eye(4, dtype=np.float32)[None],
                "modality": ["T1"],
            }
            items.append((f, m))
        return items

    items = make_loader()

    class A:
        early_stop_eval_subjects = None
        skip_if_completed = False
        seg_available = True
        dim = 3

    metrics = ["mse", "harddice", "jdstd"]
    names = [("T1", "T1")]
    augs = ["rot0"]
    aligns = ["affine", "tps_1"]

    a_seq = A()
    a_seq.model_eval_dir = tmp_path / "seq"
    model.seed_rng(0)
    seq = run_eval(items, model, metrics, names, augs, aligns, a_seq)

    a_fan = A()
    a_fan.model_eval_dir = tmp_path / "fan"
    mesh = make_mesh(num_devices=4, space=1)
    model.seed_rng(0)
    fan = run_eval(items, model, metrics, names, augs, aligns, a_fan, mesh=mesh)

    assert set(seq.keys()) == set(fan.keys())
    for k in seq:
        np.testing.assert_allclose(
            np.asarray(seq[k], np.float64),
            np.asarray(fan[k], np.float64),
            atol=5e-4,
            err_msg=k,
        )

    # artifact parity: same file set per pair dir, same grids
    import os

    for sub in sorted(os.listdir(a_seq.model_eval_dir / "eval")):
        seq_dir = a_seq.model_eval_dir / "eval" / sub
        fan_dir = a_fan.model_eval_dir / "eval" / sub
        assert sorted(os.listdir(seq_dir)) == sorted(os.listdir(fan_dir))
        for f in os.listdir(seq_dir):
            if f.startswith("grid_"):
                np.testing.assert_allclose(
                    np.load(seq_dir / f), np.load(fan_dir / f), atol=5e-4
                )


def test_batch_score_fn_matches_metrics_for_pair(tmp_path):
    """The one-dispatch batched scorer reproduces the sequential per-pair
    metric suite (_metrics_for_pair) on every metric, incl. host Hausdorff
    from the shipped ch0 masks and per-pair channel masking (n_cls 3 vs 5)."""
    from keymorph_tpu.cli.eval_pairwise import (
        _metrics_for_pair,
        make_batch_score_fn,
    )
    from keymorph_tpu.ops.resample import align_img
    from keymorph_tpu import metrics as M

    rng = np.random.default_rng(7)
    B, S = 2, 10
    img_f = jnp.asarray(rng.normal(size=(B, 1, S, S, S)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(B, 1, S, S, S)).astype(np.float32))
    n_cls = [3, 5]
    n_max = 5
    lab_f = np.stack(
        [rng.integers(0, n, size=(1, S, S, S)) for n in n_cls]
    )
    lab_m = np.stack(
        [rng.integers(0, n, size=(1, S, S, S)) for n in n_cls]
    )
    from keymorph_tpu import utils as U

    seg_f = U.one_hot(jnp.asarray(lab_f, jnp.int32), n_max)
    seg_m = U.one_hot(jnp.asarray(lab_m, jnp.int32), n_max)
    # a mild random smooth grid around identity
    from keymorph_tpu.ops.coords import uniform_norm_grid

    base = uniform_norm_grid((S, S, S))[..., ::-1][None]  # xy order like grids
    base = np.broadcast_to(base, (B,) + base.shape[1:])
    grids = tuple(
        jnp.asarray(
            (base + 0.05 * rng.normal(size=base.shape)).astype(np.float32)
        )
        for _ in range(2)
    )
    metric_names = [
        "mse", "softdice", "harddice", "harddiceroi", "hausd", "jdstd",
        "jdlessthan0",
    ]
    ch_mask = jnp.asarray(
        np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.float32)
    )
    score = make_batch_score_fn(
        ["a0", "a1"], metric_names, True, 3, align_img, False
    )
    scored, ch0_f, _ = score(grids, img_f, img_m, seg_f, seg_m, ch_mask)
    scored = jax.device_get(scored)
    ch0_f = np.asarray(ch0_f)

    class A:
        dim = 3

    for ai, align in enumerate(["a0", "a1"]):
        g = grids[ai]
        img_a = align_img(g, img_m)
        seg_a = align_img(g, seg_m)
        for j in range(B):
            sl = slice(j, j + 1)
            nc = n_cls[j]
            ref = _metrics_for_pair(
                metric_names, A(), True, img_f[sl], img_a[sl],
                seg_f[sl, :nc], seg_a[sl, :nc], g[sl],
            )
            e = scored[align]
            assert float(e["mse"][j]) == pytest.approx(ref["mse"], abs=1e-6)
            assert float(e["softdiceloss"][j]) == pytest.approx(
                ref["softdiceloss"], abs=1e-5
            )
            assert float(e["harddice"][j]) == pytest.approx(
                ref["harddice"], abs=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(e["harddiceroi"][j][: nc - 1]),
                np.asarray(ref["harddiceroi"]),
                atol=1e-5,
            )
            hausd = M.hausdorff_from_ch0_masks(
                e["ch0_a"][sl], ch0_f[sl]
            )
            assert float(hausd) == pytest.approx(ref["hausd"], abs=1e-5)
            assert float(e["jdstd"][j]) == pytest.approx(ref["jdstd"], abs=1e-5)
            assert float(e["jdlessthan0"][j]) == pytest.approx(
                ref["jdlessthan0"], abs=1e-6
            )


def test_run_eval_fanout_skip_if_completed(setup, tmp_path):
    """In fan-out mode, pairs whose metric JSONs already exist are loaded
    (not recomputed) while the rest still register — mixed batches."""
    import os

    from keymorph_tpu.cli.eval_pairwise import run_eval
    from keymorph_tpu.models.keymorph import KeyMorph
    from keymorph_tpu.models import UNet3D

    rng = np.random.default_rng(7)
    model = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2), num_keypoints=8
    )
    model.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 1, 12, 12, 12)))
    model.eval()

    items = []
    for i in range(3):
        mk = lambda: {
            "img": rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32),
            "affine": np.eye(4, dtype=np.float32)[None],
            "modality": ["T1"],
        }
        items.append((mk(), mk()))

    class A:
        early_stop_eval_subjects = None
        seg_available = False
        dim = 3

    a = A()
    a.skip_if_completed = False
    a.model_eval_dir = tmp_path
    mesh = make_mesh(num_devices=4, space=1)
    first = run_eval(items, model, ["mse"], [("T1", "T1")], ["rot0"], ["affine"],
                     a, mesh=mesh)

    # second run with skip_if_completed: everything loads from disk
    a.skip_if_completed = True
    second = run_eval(items, model, ["mse"], [("T1", "T1")], ["rot0"], ["affine"],
                      a, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(first["mse:T1:T1:rot0:affine"]),
        np.asarray(second["mse:T1:T1:rot0:affine"]),
    )

    # mixed batch: delete one pair's metrics; only that pair recomputes
    victim_dir = tmp_path / "eval" / "1_T1_T1"
    os.remove(victim_dir / "metrics-rot0-affine.json")
    third = run_eval(items, model, ["mse"], [("T1", "T1")], ["rot0"], ["affine"],
                     a, mesh=mesh)
    # loaded pairs append before the recomputed one, so compare as sets
    np.testing.assert_allclose(
        np.sort(np.asarray(first["mse:T1:T1:rot0:affine"])),
        np.sort(np.asarray(third["mse:T1:T1:rot0:affine"])),
        atol=1e-6,
    )
    assert (victim_dir / "metrics-rot0-affine.json").exists()


def test_groupwise_register_mesh_matches_unsharded():
    """KeyMorph.groupwise_register with a mesh (subject fan-out over 'data')
    must reproduce the single-device result."""
    from keymorph_tpu.models.keymorph import KeyMorph
    from keymorph_tpu.models import UNet3D

    rng = np.random.default_rng(11)
    model = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2), num_keypoints=8
    )
    model.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 1, 12, 12, 12)))
    model.eval()
    imgs = rng.uniform(0, 1, (6, 1, 12, 12, 12)).astype(np.float32)

    model.seed_rng(0)
    ref = model.groupwise_register(imgs, transform_type=["affine"], num_iters=3)
    mesh = make_mesh(num_devices=4, space=1)
    model.seed_rng(0)
    out = model.groupwise_register(
        imgs, transform_type=["affine"], num_iters=3, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(out["affine"]["grouppoints_a"]),
        np.asarray(ref["affine"]["grouppoints_a"]),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["affine"]["groupgrids"]),
        np.asarray(ref["affine"]["groupgrids"]),
        atol=5e-4,
    )


def test_sharded_groupwise_matches_single(setup):
    """Sharded groupwise must reproduce the unsharded computation — the
    meaningful property of a sharding test (convergence on untrained noise
    keypoints is not guaranteed for affine fits)."""
    net, params, imgs_f, _ = setup
    config = Config(num_keypoints=8)
    mesh = make_mesh(num_devices=8, space=1)
    fn = make_sharded_groupwise_fn(net, config, mesh, transform_type="affine", num_iters=3)
    pts, aligned = fn(params, imgs_f)
    assert aligned.shape == (8, 8, 3)

    # unsharded reference: same mean-registration loop on one device
    ref_pts = net.apply(params, imgs_f, method=type(net).get_keypoints)
    curr = ref_pts
    for _ in range(3):
        mean_b = jnp.broadcast_to(jnp.mean(curr, axis=0, keepdims=True), curr.shape)
        curr = align_pair(
            mean_b, curr, "affine", (), compute_grid=False,
            compute_aligned_points=True,
        )["points_a"]
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ref_pts), atol=5e-4)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(curr), atol=5e-3)


def test_spatial_register_matches_single(setup):
    """The single-pair SP latency path (volumes sharded over 'space',
    GSPMD conv halos + shard_map'd warp slabs) must reproduce the
    unsharded registration."""
    from keymorph_tpu.ops.resample import align_img
    from keymorph_tpu.parallel.sharded import make_spatial_register_fn

    net, params, imgs_f, imgs_m = setup
    config = Config(num_keypoints=8, transform_type="tps_1.0")
    mesh = make_mesh(num_devices=4, data=1, space=4)  # 12 % 4 == 0
    fn = make_spatial_register_fn(net, config, mesh)
    img_a, grid, pf, pm = fn(params, imgs_f[:1], imgs_m[:1])

    pf0, pm0, _ = net.clone(fast_extract=False).apply(
        params, imgs_f[:1], imgs_m[:1]
    )
    out = align_pair(
        pf0, pm0, "tps", imgs_f.shape[2:], lmbda=jnp.ones((1,)),
        compute_grid=True,
    )
    ref = align_img(out["grid"], imgs_m[:1])
    # sharded conv reductions reorder fp accumulation; ~1e-5 keypoint
    # deltas amplify through the closed-form TPS solve (grid magnitudes
    # are O(5) on random nets whose points nearly collapse)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pf0), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(out["grid"]), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(ref), atol=1e-2)


def test_gspmd_mesh_paths_gate_pallas(monkeypatch):
    """VERDICT r4 #2: with Pallas kernels FORCED eligible, the GSPMD mesh
    paths (model.forward on 'data'-sharded batches, groupwise
    _groupwise_grids) must not trace any tpu_custom_call — and must still
    match the unsharded registration. The kernel entry points are
    monkeypatched to explode so a regression is a hard failure, not a
    silent per-chip replication on real hardware."""
    from keymorph_tpu.models import fast_unet
    from keymorph_tpu.models.keymorph import KeyMorph
    from keymorph_tpu.models import UNet3D
    from keymorph_tpu.ops.pallas import tpsflow

    rng = np.random.default_rng(11)
    size = (16, 16, 8)  # 2048 grid points -> tps_flow_eligible is True

    def _make_model():
        m = KeyMorph(
            backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2),
            num_keypoints=8,
            num_subgrids=2,
        )
        m.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 1, *size)))
        return m.eval()

    imgs_f = rng.normal(size=(8, 1, *size)).astype(np.float32)
    imgs_m = rng.normal(size=(8, 1, *size)).astype(np.float32)

    # unsharded reference FIRST (kernels allowed; interpret mode on CPU)
    ref = _make_model()(jnp.asarray(imgs_f), jnp.asarray(imgs_m), "tps_1")
    ref_grid = np.asarray(ref["tps_1"]["grid"])

    # force extraction + flow kernel eligibility, then blow up every Pallas
    # entry point the gated program must avoid
    monkeypatch.setenv("KM_FORCE_FAST_CONV", "1")

    def boom(*a, **k):
        raise AssertionError("Pallas kernel traced inside a GSPMD program")

    monkeypatch.setattr(tpsflow, "tps_flow", boom)
    monkeypatch.setattr(tpsflow, "tps_planes", boom)
    monkeypatch.setattr(fast_unet, "fast_unet_forward", boom)

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(num_devices=8, space=1)
    sh = NamedSharding(mesh, P("data"))
    model = _make_model()
    model.set_allow_pallas(False)  # what run_eval does when mesh is not None
    res = model(
        jax.device_put(imgs_f, sh), jax.device_put(imgs_m, sh), "tps_1"
    )
    grid = np.asarray(res["tps_1"]["grid"])
    assert np.isfinite(grid).all()
    np.testing.assert_allclose(grid, ref_grid, atol=5e-4)

    # groupwise with mesh auto-gates (sticky set_allow_pallas(False)) even
    # on a model the caller never toggled
    gw_model = _make_model()
    out = gw_model.groupwise_register(
        imgs_f, transform_type="tps_1", num_iters=2, mesh=mesh,
        kp_batch=8, grid_batch=8,
    )["tps_1"]
    assert not gw_model.allow_pallas
    assert np.isfinite(np.asarray(out["groupgrids"])).all()


def test_dcn_mesh_train_step(setup):
    """Two-level ('dcn','data','space') mesh: gradient DP across a simulated
    second slice must produce the same step as the single-level mesh."""
    from keymorph_tpu.parallel import make_sharded_train_step
    from keymorph_tpu.training.train import TrainState, make_optimizer

    net, params, imgs_f, imgs_m = setup
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    tx = make_optimizer(config)
    dummy = jnp.zeros((1,), jnp.float32)
    key = jax.random.PRNGKey(7)

    flat = make_mesh(num_devices=4, space=1)
    s1, m1 = make_sharded_train_step(net, config, flat, tx)(
        TrainState.create(params, tx), key, imgs_f[:4], imgs_m[:4],
        dummy, dummy, jnp.float32(1.0),
    )

    dmesh = make_mesh(num_devices=8, dcn=2, space=2)
    assert dmesh.axis_names == ("dcn", "data", "space")
    s2, m2 = make_sharded_train_step(net, config, dmesh, tx)(
        TrainState.create(params, tx), key, imgs_f[:4], imgs_m[:4],
        dummy, dummy, jnp.float32(1.0),
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
