"""Training entry point — counterpart of the reference `train_mul.py`.

The reference configures via ~30 hardcoded variables (`train_mul.py:22-110`);
here the same knobs are argparse flags with identical defaults, plus the typed
configs in `dcfa_yolo_tpu.config`.  Distribution needs no flags: the train step
is compiled over every visible device (DP over a 1-D mesh); on a multi-host
slice call `jax.distributed.initialize()` first (env-driven, like the
reference's DDP env-var init at `train_mul.py:115-127`).
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train DCFA-YOLO (TPU-native)")
    p.add_argument("--classes-path", default="model_data/voc_classes.txt")
    p.add_argument("--train-annotation", default="2007_train.txt")
    p.add_argument("--val-annotation", default="2007_val.txt")
    p.add_argument("--model-path", default="", help="checkpoint to load (.ckpt/.pth/.npz)")
    p.add_argument("--pretrained", action="store_true",
                   help="load the pretrained yolov8 backbone into BOTH modal "
                        "branches (strict=False partial load, reference "
                        "nets/yolo_mul.py:283-293 + train_mul.py:136-141); "
                        "resolves model_data/yolov8_{phi}_backbone_weights.pth "
                        "via utils.general.download_weights (no egress here — "
                        "place the file manually)")
    p.add_argument("--model-dir", default="model_data",
                   help="where pretrained backbone weights live")
    p.add_argument("--resume", default="",
                   help="full training checkpoint to resume from (restores "
                        "params, BN stats, EMA, optimizer state and epoch — "
                        "an improvement over the reference's weights-only "
                        "model_path+Init_Epoch restart)")
    p.add_argument("--init-type", default="normal",
                   choices=["normal", "xavier", "kaiming", "orthogonal"],
                   help="weight init when training from scratch "
                        "(reference weights_init)")
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--phi", default="n", choices=list("nsmlx"))
    p.add_argument("--init-epoch", type=int, default=0)
    p.add_argument("--freeze-epoch", type=int, default=0)
    p.add_argument("--unfreeze-epoch", type=int, default=200)
    p.add_argument("--freeze-train", action="store_true")
    p.add_argument("--batch-size", type=int, default=16,
                   help="unfreeze-phase batch size (reference Unfreeze_batch_size)")
    p.add_argument("--val-batch-size", type=int, default=0,
                   help="validation batch (0 = same as --batch-size); the eval "
                        "graph holds full-resolution activations with no remat, "
                        "so very large train batches (b128 640^2 beside a "
                        "--device-aug staged dataset) need a smaller val batch")
    p.add_argument("--freeze-batch-size", type=int, default=0,
                   help="batch size during the frozen-backbone phase "
                        "(reference Freeze_batch_size; 0 = same as --batch-size)")
    p.add_argument("--frozen-bifpn", action="store_true",
                   help="strict reference behavior: leave the BiFPN fusion "
                        "weights untrained (they fall in no optimizer param "
                        "group in the reference, train_mul.py:246-259)")
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--init-lr", type=float, default=1e-2)
    p.add_argument("--min-lr-ratio", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.937)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--lr-decay-type", default="cos", choices=["cos", "step"])
    p.add_argument("--no-mosaic", action="store_true")
    p.add_argument("--no-mixup", action="store_true")
    p.add_argument("--mosaic-prob", type=float, default=0.5)
    p.add_argument("--mixup-prob", type=float, default=0.5)
    p.add_argument("--special-aug-ratio", type=float, default=0.7)
    p.add_argument("--max-boxes", type=int, default=64)
    p.add_argument("--save-period", type=int, default=20)
    p.add_argument("--eval-period", type=int, default=20)
    p.add_argument("--eval-map-batch-size", type=int, default=1,
                   help="EvalCallback device batch (>1 groups same-sized val "
                        "pairs into one fused-pipeline dispatch; identical "
                        "txt outputs)")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--save-dir", default="logs")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--device-aug", action="store_true",
                   help="TPU-resident data pipeline: stage the decoded "
                        "dataset into device HBM once and run ALL "
                        "augmentation (mosaic/jitter/flip/HSV/mixup + box "
                        "transforms) as a jitted on-device program; per-step "
                        "host->device traffic drops from ~150 MB of images "
                        "to ~KB of geometry scalars (data/device_aug.py)")
    p.add_argument("--device-aug-stage", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="staging resolution for --device-aug (default: "
                        "input shape); lower it to fit big datasets in HBM")
    p.add_argument("--device-aug-hbm-gb", type=float, default=8.0,
                   help="HBM budget for the resident dataset")
    p.add_argument("--device-aug-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="resampling-matmul operand dtype for --device-aug; "
                        "bf16 rides the MXU ~1.6x faster with bit-identical "
                        "box geometry and sub-LSB pixel error vs float32")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fold-shuffle", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="train in the shuffle-folded space: the backbones' "
                        "channel_shuffles (pure permutations = HBM relayout "
                        "copies on TPU, fwd AND bwd, every step) are removed "
                        "from the graph and absorbed into consumer weights "
                        "(reparam.fold_shuffle_variables). The optimizer/EMA "
                        "are elementwise, so the trajectory is EXACTLY the "
                        "unfolded one (up to conv FP summation order); "
                        "checkpoints are unfolded back to the canonical "
                        "layout on save and re-folded on --resume. Default ON "
                        "since the on-chip win (95.96 -> 92.82 ms/step b16 "
                        "640^2, tools/train_stem_ab.py); --no-fold-shuffle "
                        "reverts")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the backbones in backward (jax.checkpoint):"
                        " ~15%% extra FLOPs for the activation memory that lets "
                        "b128 640^2 fit HBM beside the --device-aug staged dataset")
    p.add_argument("--train-stem", default="xla", choices=["xla", "pallas"],
                   help="stem backend for the train graph: 'pallas' fuses "
                        "each backbone's conv+BN+ReLU+maxpool stem into ONE "
                        "kernel pass (ops/pallas_stem_train.py) so the "
                        "full-resolution conv output never touches HBM; "
                        "checkpoint-identical to 'xla' (phi=n, single-device "
                        "or split step mode)")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace of the first epoch here")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator/rank from env, like the reference's DDP "
                        "env-var init at train_mul.py:115-127); the same pjit "
                        "program then spans all hosts' devices")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import random as py_random

    from dcfa_yolo_tpu.config import ModelConfig, TrainConfig
    from dcfa_yolo_tpu.data.loader import BatchLoader, PairedDetectionDataset
    from dcfa_yolo_tpu.infer.predictor import YOLOPredictor, get_classes
    from dcfa_yolo_tpu.models.yolo import DCFAYolo, init_model
    from dcfa_yolo_tpu.train.schedule import get_lr_scheduler
    from dcfa_yolo_tpu.train.trainer import Trainer
    from dcfa_yolo_tpu.utils.callbacks import EvalCallback, LossHistory
    from dcfa_yolo_tpu.utils.checkpoint import load_variables, save_checkpoint

    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    if args.distributed:
        jax.distributed.initialize()
        print(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.device_count()} global devices")
    py_random.seed(args.seed)
    np.random.seed(args.seed)

    class_names, num_classes = get_classes(args.classes_path)
    cfg = ModelConfig(num_classes=num_classes, phi=args.phi,
                      input_shape=tuple(args.input_shape),
                      compute_dtype=args.compute_dtype, remat=args.remat,
                      train_stem_backend=args.train_stem)
    tc = TrainConfig(
        seed=args.seed, init_epoch=args.init_epoch, freeze_epoch=args.freeze_epoch,
        unfreeze_epoch=args.unfreeze_epoch, freeze_train=args.freeze_train,
        batch_size=args.batch_size, optimizer_type=args.optimizer,
        init_lr=args.init_lr, min_lr_ratio=args.min_lr_ratio,
        momentum=args.momentum, weight_decay=args.weight_decay,
        lr_decay_type=args.lr_decay_type, max_boxes=args.max_boxes,
        mosaic=not args.no_mosaic, mosaic_prob=args.mosaic_prob,
        mixup=not args.no_mixup, mixup_prob=args.mixup_prob,
        special_aug_ratio=args.special_aug_ratio, save_period=args.save_period,
        eval_period=args.eval_period, save_dir=args.save_dir)

    model, variables = init_model(cfg, jax.random.PRNGKey(args.seed))
    resume_payload = None
    if args.resume:
        from dcfa_yolo_tpu.utils.checkpoint import load_checkpoint

        print(f"Resume from {args.resume}.")
        resume_payload = load_checkpoint(args.resume)
        variables = {"params": resume_payload["params"],
                     "batch_stats": resume_payload["batch_stats"]}
    elif args.model_path:
        print(f"Load weights {args.model_path}.")
        variables = load_variables(args.model_path, variables)
    elif args.pretrained:
        # reference: download_weights(phi) then Backbone strict=False partial
        # load into both modal branches; weights_init is skipped when
        # pretrained (`nets/yolo_mul.py:393-394`)
        from dcfa_yolo_tpu.models.torch_import import (
            import_state_dict,
            load_torch_checkpoint,
        )
        from dcfa_yolo_tpu.utils.general import download_weights

        path = download_weights(args.phi, args.model_dir)
        sd = load_torch_checkpoint(path)
        # the release file holds the Backbone module's own key space; prefix
        # it so the importer's single→dual surgery fills backbone_rgb/_nir
        sd = {f"backbone.{k}": v for k, v in sd.items()}
        variables, report = import_state_dict(sd, variables, strict=False)
        print(f"Load pretrained backbone {path}: {len(report['matched'])} "
              f"tensors into both branches, {len(report['skipped'])} skipped.")
    else:
        from dcfa_yolo_tpu.train.init_weights import reference_weights_init

        variables = dict(variables)
        variables["params"] = reference_weights_init(
            variables["params"], seed=args.seed, init_type=args.init_type)

    fold_spec = None
    if args.fold_shuffle:
        from dcfa_yolo_tpu.models.reparam import (
            apply_shuffle_spec, fold_opt_state, fold_shuffle_variables,
            shuffle_fold_spec)

        fold_spec = shuffle_fold_spec(variables["params"])
        variables = jax.jit(fold_shuffle_variables)(variables)
        model = DCFAYolo(cfg, fold_shuffle=True)

    with open(args.train_annotation, encoding="utf-8") as f:
        train_lines = f.readlines()
    with open(args.val_annotation, encoding="utf-8") as f:
        val_lines = f.readlines()
    num_train, num_val = len(train_lines), len(val_lines)

    freeze_bs = args.freeze_batch_size or args.batch_size

    def phase_batch_size(epoch: int) -> int:
        # reference: Freeze_batch_size during the frozen phase, then
        # Unfreeze_batch_size (`train_mul.py:238, 305-340`); a shape change
        # just triggers one extra jit compile here
        return freeze_bs if (tc.freeze_train and epoch < tc.freeze_epoch) \
            else args.batch_size

    epoch_step = num_train // args.batch_size
    epoch_step_val = max(num_val // (args.val_batch_size or args.batch_size), 1)
    if epoch_step == 0:
        raise ValueError("dataset too small for this batch size")

    train_ds = PairedDetectionDataset(
        train_lines, cfg.input_shape, train=True, mosaic=tc.mosaic,
        mosaic_prob=tc.mosaic_prob, mixup=tc.mixup, mixup_prob=tc.mixup_prob,
        special_aug_ratio=tc.special_aug_ratio, epoch_length=tc.unfreeze_epoch)
    val_ds = PairedDetectionDataset(val_lines, cfg.input_shape, train=False,
                                    mosaic=False, mixup=False)

    from dcfa_yolo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()

    if args.device_aug:
        from dcfa_yolo_tpu.data.device_aug import DeviceAugLoader

        stage_hw = tuple(args.device_aug_stage or cfg.input_shape)
        import jax.numpy as jnp

        _staged_cache = {}  # reuse staged arrays + HBM copy across bs switches
        # XLA:CPU cannot lower bf16 x bf16 -> f32 dots; fall back to f32 there
        _rdt = (jnp.bfloat16 if args.device_aug_dtype == "bfloat16"
                and jax.default_backend() != "cpu" else None)

        def make_loaders(bs: int):
            t0 = time.perf_counter()
            tl = DeviceAugLoader(
                train_lines, cfg.input_shape, bs, mesh, train=True,
                max_boxes=tc.max_boxes, stage_hw=stage_hw, mosaic=tc.mosaic,
                mosaic_prob=tc.mosaic_prob, mixup=tc.mixup,
                mixup_prob=tc.mixup_prob,
                special_aug_ratio=tc.special_aug_ratio,
                epoch_length=tc.unfreeze_epoch, shuffle=True, seed=args.seed,
                max_hbm_gb=args.device_aug_hbm_gb,
                resample_dtype=_rdt,
                out_dtype=(jnp.bfloat16
                           if cfg.compute_dtype == "bfloat16" else None),
                staged=_staged_cache.get("train"),
                dev_data=_staged_cache.get("train_dev"))
            vl = DeviceAugLoader(
                val_lines, cfg.input_shape, args.val_batch_size or bs, mesh,
                train=False,
                max_boxes=tc.max_boxes, stage_hw=stage_hw, shuffle=False,
                # keep the ragged tail (padded): a val set smaller than the
                # batch must still produce one eval batch
                drop_last=False,
                seed=args.seed,
                # the budget is for BOTH staged datasets: charge what the
                # train set already resident consumed
                max_hbm_gb=(args.device_aug_hbm_gb
                            - tl.host_ds.images.nbytes / 1e9),
                out_dtype=(jnp.bfloat16
                           if cfg.compute_dtype == "bfloat16" else None),
                staged=_staged_cache.get("val"),
                dev_data=_staged_cache.get("val_dev"))
            if "train" not in _staged_cache:
                print(f"[device-aug] staged {num_train}+{num_val} pairs at "
                      f"{stage_hw} into HBM in {time.perf_counter()-t0:.1f}s "
                      f"({(tl.host_ds.images.nbytes + vl.host_ds.images.nbytes)/1e6:.0f} MB)",
                      flush=True)
            _staged_cache.update(
                train=tl.host_ds, val=vl.host_ds,
                train_dev=(tl.dev_images, tl.dev_boxes, tl.dev_nbox),
                val_dev=(vl.dev_images, vl.dev_boxes, vl.dev_nbox))
            return tl, vl
    else:
        def make_loaders(bs: int):
            return (
                BatchLoader(train_ds, bs, tc.max_boxes, shuffle=True,
                            num_workers=args.num_workers, seed=args.seed),
                # drop_last=False: a val set smaller than the batch must
                # still produce one (padded-tail) eval batch, else val_loss
                # silently reads 0.0 and best-checkpointing is meaningless
                BatchLoader(val_ds, args.val_batch_size or bs, tc.max_boxes,
                            shuffle=False, drop_last=False,
                            num_workers=args.num_workers, seed=args.seed),
            )

    current_bs = phase_batch_size(args.init_epoch)
    train_loader, val_loader = make_loaders(current_bs)
    epoch_step = num_train // current_bs
    epoch_step_val = max(num_val // (args.val_batch_size or current_bs), 1)

    time_str = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    log_dir = os.path.join(args.save_dir, "loss_" + time_str)
    loss_history = LossHistory(log_dir)

    def predictor_factory(vars_, conf, nms_iou, max_boxes):
        # under --fold-shuffle the trainer's EMA variables arrive pre-folded,
        # matching the predictor's fold_shuffle graph (its contract: caller
        # -supplied variables must match the chosen graph)
        return YOLOPredictor(class_names=class_names, input_shape=cfg.input_shape,
                             phi=args.phi, confidence=conf, nms_iou=nms_iou,
                             max_det=max_boxes, variables=vars_,
                             compute_dtype=args.compute_dtype,
                             fold_shuffle=args.fold_shuffle)

    eval_cb = EvalCallback(predictor_factory, class_names, val_lines, log_dir,
                           eval_flag=not args.no_eval, period=args.eval_period,
                           batch_size=args.eval_map_batch_size)

    init_epoch = args.init_epoch
    if resume_payload is not None:
        init_epoch = int(resume_payload.get("epoch", args.init_epoch))
        ema_updates = int(resume_payload.get("ema_updates", epoch_step * init_epoch))
    else:
        ema_updates = epoch_step * init_epoch

    trainer = Trainer(model, variables, tc, mesh=mesh,
                      ema_updates=ema_updates,
                      train_bifpn=not args.frozen_bifpn)
    if resume_payload is not None:
        from dcfa_yolo_tpu.train.ema import EMAState
        from dcfa_yolo_tpu.train.trainer import TrainState
        from dcfa_yolo_tpu.utils.checkpoint import restore_into

        rp_params = resume_payload["params"]
        rp_ema = resume_payload["ema"]
        rp_opt = resume_payload["opt_state"]
        if args.fold_shuffle:
            # checkpoints are canonical (unfolded); re-enter the folded space
            rp_params = apply_shuffle_spec(rp_params, fold_spec)
            rp_ema = dict(rp_ema)
            rp_ema["params"] = apply_shuffle_spec(rp_ema["params"], fold_spec)
            rp_opt = fold_opt_state(rp_opt, fold_spec)
        st = trainer.state
        trainer.state = TrainState(
            params=restore_into(st.params, rp_params),
            batch_stats=restore_into(st.batch_stats, resume_payload["batch_stats"]),
            opt_state=restore_into(st.opt_state, rp_opt),
            ema=EMAState(
                variables=restore_into(st.ema.variables, rp_ema),
                updates=st.ema.updates),
        )

    init_lr_fit, min_lr_fit = tc.scaled_lrs()
    lr_fn = get_lr_scheduler(tc.lr_decay_type, init_lr_fit, min_lr_fit,
                             tc.unfreeze_epoch)

    best_val = float("inf")
    for epoch in range(init_epoch, tc.unfreeze_epoch):
        if phase_batch_size(epoch) != current_bs:
            current_bs = phase_batch_size(epoch)
            print(f"switching to batch size {current_bs} (unfreeze phase)")
            train_loader, val_loader = make_loaders(current_bs)
            epoch_step = num_train // current_bs
            epoch_step_val = max(num_val // (args.val_batch_size or current_bs), 1)
        # set_epoch AFTER any loader swap so the freshly built loader gets the
        # true epoch (mosaic epoch-gate + per-epoch RNG stream), not a stale
        # or reset one
        train_ds.set_epoch(epoch)
        train_loader.set_epoch(epoch)  # pins the per-epoch RNG stream
        lr = lr_fn(epoch)
        freeze = tc.freeze_train and epoch < tc.freeze_epoch

        # losses stay on device during the epoch: a host sync per step
        # serializes async dispatch (very costly on remote platforms)
        from dcfa_yolo_tpu.utils.profiling import StepTimer, trace as profile_trace

        timer = StepTimer()
        step_losses = []
        n_steps = 0
        fetch_wait = 0.0
        running = []  # sparse host-synced loss samples for the progress line
        epoch_t0 = time.perf_counter()
        with profile_trace(args.profile_dir if epoch == init_epoch else None):
            it_loader = iter(train_loader)
            for it in range(epoch_step):
                t0 = time.perf_counter()
                hb = next(it_loader, None)
                fetch_wait += time.perf_counter() - t0
                if hb is None:
                    break
                # device-aug batches are already device-resident and sharded
                batch = hb if args.device_aug else trainer.put_batch(
                    hb.rgb, hb.nir, hb.gt_boxes, hb.gt_labels, hb.gt_mask)
                timer.start()
                lb = trainer.train_step(batch, lr, freeze_backbone=freeze)
                timer.stop()
                step_losses.append(lb.total)
                n_steps += 1
                if it % 50 == 0:
                    # ONE host sync per 50 steps: cheap (~30 ms RTT) and keeps
                    # dispatch async (the reference shows a per-step tqdm
                    # running loss, `utils/utils_fit_mul.py:15,62-63`)
                    running.append(float(lb.total))
                    print(f"epoch {epoch + 1}/{tc.unfreeze_epoch} it {it}/{epoch_step} "
                          f"loss {running[-1]:.3f} "
                          f"(run-mean {np.mean(running):.3f}) lr {lr:.5f}",
                          flush=True)
            it_loader.close()  # shuts the worker pool down cleanly
        epoch_wall = time.perf_counter() - epoch_t0
        if timer.summary():
            s = timer.summary()
            step_rate = n_steps / epoch_wall if epoch_wall else 0.0
            cap = train_loader.throughput()
            cap_s = f"{cap:.2f} batches/s" if cap is not None else "n/a"
            # starved when the loader cannot match the PURE compute rate
            # (achieved step_rate is itself capped by the loader, so comparing
            # cap against step_rate could never fire)
            compute_rate = 1000.0 / s["mean_ms"] if s["mean_ms"] else 0.0
            starved = (f" (STARVED: waited {fetch_wait:.1f}s on data)"
                       if cap is not None and cap < compute_rate else "")
            print(f"step timing: mean {s['mean_ms']:.1f} ms p50 {s['p50_ms']:.1f} "
                  f"p95 {s['p95_ms']:.1f} over {s['steps']} steps | "
                  f"step rate {step_rate:.2f}/s, loader capacity {cap_s}"
                  + starved, flush=True)
        if train_loader.overflow_items:
            print(f"[loader] {train_loader.overflow_items} items exceeded "
                  f"max_boxes={tc.max_boxes}; {train_loader.overflow_dropped} "
                  f"smallest-area boxes dropped", flush=True)
        # reduce the epoch's device scalars in ONE dispatch + ONE fetch: a
        # float(x) per step would cost a ~30 ms RTT each on remote platforms
        import jax.numpy as _jnp

        train_loss = float(_jnp.mean(_jnp.stack(step_losses))) if n_steps else 0.0

        val_losses = []
        for it, hb in enumerate(val_loader):
            if it >= epoch_step_val:
                break
            lb = trainer.eval_step(
                hb if args.device_aug else trainer.put_batch(
                    hb.rgb, hb.nir, hb.gt_boxes, hb.gt_labels, hb.gt_mask))
            val_losses.append(lb.total)
        val_loss = float(_jnp.mean(_jnp.stack(val_losses))) if val_losses else 0.0

        print(f"Epoch {epoch + 1}/{tc.unfreeze_epoch}  "
              f"Total Loss: {train_loss:.3f} || Val Loss: {val_loss:.3f}")
        loss_history.append_loss(epoch + 1, train_loss, val_loss)

        # materialize the train state ONCE per epoch (per-leaf device reads —
        # and, with the flat tail, the unravel program — are expensive on
        # remote platforms; eval + best/last/periodic all reuse this copy)
        st = trainer.state
        eval_cb.on_epoch_end(epoch + 1, st.ema.variables)
        host_state = jax.device_get(
            {"params": st.params, "batch_stats": st.batch_stats,
             "ema": st.ema.variables, "opt_state": st.opt_state})
        if args.fold_shuffle:
            # checkpoints stay canonical: a folded tree has identical shapes,
            # so it would silently load into the standard graph and compute
            # the wrong function — unfold every params-shaped subtree (host
            # numpy; np.take per permuted leaf, a few ms)
            host_state["params"] = apply_shuffle_spec(
                host_state["params"], fold_spec, inverse=True)
            host_state["ema"] = dict(host_state["ema"])
            host_state["ema"]["params"] = apply_shuffle_spec(
                host_state["ema"]["params"], fold_spec, inverse=True)
            host_state["opt_state"] = fold_opt_state(
                host_state["opt_state"], fold_spec, inverse=True)
        payload = {
            **host_state,
            "ema_updates": int(st.ema.updates),
            "epoch": epoch + 1,
        }
        if (epoch + 1) % tc.save_period == 0 or epoch + 1 == tc.unfreeze_epoch:
            save_checkpoint(os.path.join(
                log_dir, f"ep{epoch + 1:03d}-loss{train_loss:.3f}-"
                f"val_loss{val_loss:.3f}.ckpt"), payload)
        if val_loss <= best_val:
            best_val = val_loss
            print("Save best model to best_epoch_weights.ckpt")
            save_checkpoint(os.path.join(log_dir, "best_epoch_weights.ckpt"), payload)
        save_checkpoint(os.path.join(log_dir, "last_epoch_weights.ckpt"), payload)


if __name__ == "__main__":
    main()
