"""Master CLI: train / pretrain / eval.

Mirrors the reference's scripts/run.py flow: parse flags -> create run dirs +
args.json dump -> seed -> build data/model/optimizer -> optional checkpoint
resume -> dispatch on run_mode (reference run.py:265-658).

Usage:
    python -m keymorph_tpu.cli.run --run_mode train --num_keypoints 128 \
        --loss_fn mse --transform_type affine --data_path data.csv \
        --train_dataset csv
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path

import numpy as np

from keymorph_tpu.training.config import Config


def parse_args(argv=None) -> Config:
    parser = argparse.ArgumentParser("keymorph_tpu")
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(name, action="store_true", default=default)
            if default is True:  # True-default bools need an off switch
                parser.add_argument(
                    f"--no_{f.name}", dest=f.name, action="store_false"
                )
        elif f.name == "max_random_affine_augment_params":
            parser.add_argument(name, nargs=4, type=float, default=default)
        elif f.name == "img_size":
            parser.add_argument(name, nargs=3, type=int, default=default)
        elif f.name == "wandb_kwargs":
            parser.add_argument(name, nargs="*", default={})
        elif default is None:
            parser.add_argument(name, default=None)
        else:
            parser.add_argument(name, type=type(default), default=default)
    ns = parser.parse_args(argv)
    kw = vars(ns)
    if isinstance(kw.get("wandb_kwargs"), list):
        kw["wandb_kwargs"] = dict(kv.split("=", 1) for kv in kw["wandb_kwargs"])
    for key in ("max_random_affine_augment_params", "img_size"):
        kw[key] = tuple(kw[key])
    for key in ("max_train_keypoints", "max_train_seg_channels",
                "early_stop_eval_subjects", "num_devices"):
        if kw.get(key) is not None and not isinstance(kw[key], int):
            kw[key] = int(kw[key])
    return Config(**kw)


def get_data(config: Config):
    """Dataset factory (reference run.py:316-336)."""
    from keymorph_tpu.data import CSVDataset, IXIDataset, Preprocessor

    transform = Preprocessor(size=tuple(config.img_size))
    if config.train_dataset == "ixi":
        dataset = IXIDataset(config.data_path)
    elif config.train_dataset == "csv":
        dataset = CSVDataset(config.data_path)
    else:
        raise ValueError(f"Unknown dataset {config.train_dataset}")
    from keymorph_tpu.cli.hyperparameters import EVAL_UNI_NAMES, EVAL_MULTI_NAMES

    loaders = dataset.get_loaders(
        config.batch_size,
        config.num_workers,
        config.mix_modalities,
        transform,
        EVAL_UNI_NAMES + EVAL_MULTI_NAMES,
    )
    return dataset, loaders


def main(argv=None):
    config = parse_args(argv)
    if config.debug_mode:
        config.steps_per_epoch = 3
        config.early_stop_eval_subjects = 1

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.cli import script_utils as su
    from keymorph_tpu.training import checkpoint as ckpt
    from keymorph_tpu.training.config import build_model
    from keymorph_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
        run_train,
    )

    # run dirs + args dump (run.py:265-307)
    model_dir = Path(config.model_dir)
    ckpt_dir = model_dir / "checkpoints"
    eval_dir = model_dir / "eval"
    for d in (model_dir, ckpt_dir, eval_dir):
        os.makedirs(d, exist_ok=True)
    config.save(str(model_dir / "args.json"))

    # seeding (run.py:310-313)
    np.random.seed(config.seed)
    rng_key = jax.random.PRNGKey(config.seed)

    dataset, (pretrain_loader, train_loader, test_loader) = get_data(config)
    config_seg_available = getattr(dataset, "seg_available", False)

    model = build_model(config)
    model.seed_rng(config.seed)
    example = jnp.zeros((config.batch_size, 1, *config.img_size), jnp.float32)
    rng_key, init_key = jax.random.split(rng_key)
    model.init_params(init_key, example)
    su.summary(model.params)

    tx = make_optimizer(config)
    state = TrainState.create(model.params, tx)
    start_epoch = 1
    ref_points = None

    # checkpoint load / resume (run.py:441-456)
    load_path = config.load_path
    if config.resume_latest:
        load_path = ckpt.latest_epoch_checkpoint(str(ckpt_dir))
    if load_path:
        payload = ckpt.load_checkpoint(load_path, state_template=state)
        if config.load_weights_only:
            # pretrain -> train handoff: params only, fresh optimizer/step
            # (reference script_utils.py:59-81 loads backbone weights only)
            state = TrainState.create(payload["params"], tx)
        else:
            state = TrainState(
                params=payload["params"],
                opt_state=payload["opt_state"],
                step=jnp.asarray(payload["step"]),
            )
        model.params = state.params
        if config.resume or config.resume_latest:
            start_epoch = int(payload["epoch"]) + 1
        if "ref_points" in payload:
            ref_points = jnp.asarray(payload["ref_points"])
        print(f"Loaded checkpoint {load_path} (epoch {int(payload['epoch'])})")

    wandb = su.initialize_wandb(config) if config.use_wandb else None

    if config.run_mode == "train":
        from keymorph_tpu.training.train import (
            make_kpconsistency_step,
            make_train_step_sameres,
        )

        net = model.net
        if config.train_same_resolution:
            step_fn = make_train_step_sameres(net, config, tx)
        else:
            step_fn = make_train_step(net, config, tx)
        kp_step_fn = None
        modality_datasets = None
        if config.kpconsistency_coeff > 0:
            kp_step_fn = make_kpconsistency_step(net, config, tx)
            from keymorph_tpu.data import Preprocessor
            from keymorph_tpu.data.datasets import SingleDataset

            subs = dataset.get_subjects(train=True)
            if isinstance(subs, dict):
                transform = Preprocessor(size=tuple(config.img_size))
                modality_datasets = {
                    mod: SingleDataset(lst, transform) for mod, lst in subs.items()
                }
        from keymorph_tpu.data import ThreadPrefetcher

        # overlap NIfTI decode with device compute (single-core host)
        train_loader = ThreadPrefetcher(train_loader, depth=2)
        epochs = config.epochs if not config.debug_mode else 2
        for epoch in range(start_epoch, epochs + 1):
            state, stats, rng_key = run_train(
                train_loader, state, step_fn, config, epoch, rng_key,
                kp_step_fn=kp_step_fn, modality_datasets=modality_datasets,
            )
            print(f"Epoch {epoch}/{epochs}:", stats)
            # persistent loss trajectory (wandb is optional in this env)
            with open(model_dir / "train_log.jsonl", "a") as fh:
                fh.write(json.dumps({"epoch": epoch, **{
                    k: float(v) for k, v in stats.items()
                }}) + "\n")
            if wandb:
                wandb.log(stats)
            if config.visualize and (
                epoch % config.log_interval == 0 or epoch in (1, epochs)
            ):
                # moving/fixed/aligned panel on one training batch
                # (reference train.py:223-291)
                from keymorph_tpu.viz import render_registration_panels

                model.params = state.params
                b_f, b_m = next(iter(train_loader))
                seg_kw = {}
                if config.loss_fn == "dice":
                    seg_kw = {"seg_f": np.asarray(b_f["seg"]),
                              "seg_m": np.asarray(b_m["seg"])}
                paths = render_registration_panels(
                    model,
                    jnp.asarray(b_f["img"], jnp.float32),
                    jnp.asarray(b_m["img"], jnp.float32),
                    config.transform_type,
                    str(model_dir / "img"),
                    f"epoch{epoch}",
                    dim=config.dim,
                    **seg_kw,
                )
                print("-> visualize:", ", ".join(paths))
            if epoch % config.log_interval == 0 or epoch == epochs:
                model.params = state.params
                ckpt.save_checkpoint(str(ckpt_dir), epoch, state)
    elif config.run_mode == "pretrain":
        from keymorph_tpu.training.pretrain import (
            make_pretrain_step,
            pick_reference_subject,
            run_pretrain,
        )

        net = model.net
        rw = bool(getattr(config, "align_keypoints_in_real_world_coords", False))
        aff = None
        if ref_points is None:
            img, ref_points, aff = pick_reference_subject(
                pretrain_loader, config, seed=config.seed
            )
        else:
            batch = next(iter(pretrain_loader))
            img = jnp.asarray(np.asarray(batch["img"], np.float32)[:1])
            if rw:
                a = batch.get("affine")
                a = (
                    np.eye(config.dim + 1, dtype=np.float32)
                    if a is None
                    else np.asarray(a, np.float32)
                )
                aff = jnp.asarray(a[None] if a.ndim == 2 else a)[:1]
        step_fn = make_pretrain_step(net, config, tx)
        epochs = config.epochs if not config.debug_mode else 2
        for epoch in range(start_epoch, epochs + 1):
            state, stats, rng_key = run_pretrain(
                img, ref_points, state, step_fn, config, epoch, rng_key, aff=aff
            )
            print(f"Pretrain epoch {epoch}/{epochs}:", stats)
            with open(model_dir / "train_log.jsonl", "a") as fh:
                fh.write(json.dumps({"epoch": epoch, **{
                    k: float(v) for k, v in stats.items()
                }}) + "\n")
            if wandb:
                wandb.log(stats)
            if epoch % config.log_interval == 0 or epoch == epochs:
                ckpt.save_checkpoint(str(ckpt_dir), epoch, state, ref_points=ref_points)
    elif config.run_mode == "eval":
        from keymorph_tpu.cli import hyperparameters as hp
        from keymorph_tpu.cli.eval_pairwise import run_eval

        model.params = state.params
        model.eval()

        class EvalArgs:
            pass

        ea = EvalArgs()
        ea.model_eval_dir = eval_dir
        ea.visualize = config.visualize
        ea.early_stop_eval_subjects = config.early_stop_eval_subjects
        ea.skip_if_completed = config.skip_if_completed
        ea.save_eval_artifacts = config.save_eval_artifacts
        ea.seg_available = config_seg_available
        ea.dim = config.dim
        aligns = (
            hp.EVAL_KP_ALIGNS if not config.debug_mode else ["affine"]
        )
        metrics = hp.EVAL_METRICS if config_seg_available else ["mse", "jdstd", "jdlessthan0"]
        augs = hp.EVAL_AUGS if not config.debug_mode else ["rot0"]

        def _summarize(raw):
            return {
                k: (float(np.mean([np.mean(x) for x in v])) if v else None)
                for k, v in raw.items()
            }

        # fan pairs out over all chips (SURVEY §2.5's highest-value DP axis)
        # and pipeline the NIfTI decode behind device compute
        from keymorph_tpu.data import ThreadPrefetcher

        eval_loader = ThreadPrefetcher(test_loader, depth=2)
        mesh = None
        if jax.device_count() > 1:
            from keymorph_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(space=1)

        # unimodal + multimodal suites (reference run.py:458-508)
        for suite, names in (
            ("unimodal", hp.EVAL_UNI_NAMES),
            ("multimodal", hp.EVAL_MULTI_NAMES),
        ):
            raw = run_eval(
                eval_loader, model, metrics, names, augs, aligns, ea,
                save_dir_prefix=f"eval_{suite}", mesh=mesh,
            )
            out_path = eval_dir / f"summary_{suite}.json"
            su.save_dict_as_json(_summarize(raw), out_path)
            print("Eval summary written to", out_path)
    else:
        raise ValueError(f"Unknown run_mode {config.run_mode}")


if __name__ == "__main__":
    main()
