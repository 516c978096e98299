"""Train a single-task network (encoder pretraining / fine-tuning).

Arg-compatible with the reference `train_single_task.py` (same flags,
`:22-135`; same output-dir grammar, `:138-186`; same log-line / snapshot /
checkpoint contract, `:303-329`). The loop body is one fused jit program:
device-side augmentation + forward + task loss + Adam update.
"""
from __future__ import annotations

import argparse
import logging
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .. import compat
from ..data import AugmentConfig, augment_batch, images_from_wire, images_to_wire
from ..losses import CoordLossConfig, DepthLossConfig, NormalLossConfig, get_nodata_value
from ..train import TrainBatch, TrainState, create_train_state, make_optimizer, make_train_step
from ..utils import config_log, read_training_log
from . import common


def config_parser(description="Initialize a scene coordinate regression network."):
    """Reference argparse surface (`train_single_task.py:22-135`)."""
    parser = argparse.ArgumentParser(
        description=description, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("scene", help="name of a scene in the dataset folder")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--grayscale", "-grayscale", action="store_true")
    parser.add_argument("--real_data_domain", type=str, default="in_place")
    parser.add_argument("--real_data_chunk", type=float, default=1.0)
    parser.add_argument("--real_only", action="store_true")
    parser.add_argument("--sim_data_chunk", type=float, default=1.0)
    parser.add_argument("--task", type=str, required=True)
    parser.add_argument("--epoch_plus", "-epoch_plus", action="store_true")
    parser.add_argument("--network_in", type=str, default=None)
    parser.add_argument("--tiny", "-tiny", action="store_true")
    parser.add_argument("--fullsize", "-fullsize", action="store_true")
    parser.add_argument("--epochs", "-e", type=int, default=50)
    parser.add_argument("--learningrate", "-lr", type=float, default=0.0002)
    parser.add_argument("--no_lr_scheduling", action="store_true")
    parser.add_argument("--session", "-sid", default="")
    parser.add_argument("--ckpt_dir", type=str, default="")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--inittolerance", "-itol", type=float, default=50.0)
    parser.add_argument("--mindepth", "-mind", type=float, default=0.1)
    parser.add_argument("--softclamp", "-sc", type=float, default=100)
    parser.add_argument("--hardclamp", "-hc", type=float, default=1000)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--uncertainty", "-uncertainty", default=None, type=str)
    parser.add_argument("--datasets_dir", type=str, default="./datasets",
                        help="dataset root directory (framework extension)")
    parser.add_argument("--image_height", type=int, default=480,
                        help="standard input image height (framework extension)")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="data-parallel device count over a jax Mesh "
                             "(framework extension; reference is single-GPU)")
    parser.add_argument("--zero", action="store_true",
                        help="ZeRO/FSDP: shard parameters AND Adam moments "
                             "over the data-parallel mesh axis (out-channel "
                             "sharding, parallel.shard_params) instead of "
                             "replicating them; XLA GSPMD inserts the "
                             "per-layer weight all-gathers. Requires "
                             "--num_devices > 1 or a multi-host run, with "
                             "the device count dividing 32 (framework "
                             "extension; numerically equivalent to "
                             "replicated DP — tests/test_train.py)")
    parser.add_argument("--e2e_pose_loss", action="store_true",
                        help="DSAC end-to-end training: minimize the expected "
                             "pose loss through the differentiable RANSAC "
                             "solver (capability of the reference plugin's "
                             "backward_rgb, dsacstar.cpp:200-483, which no "
                             "reference script wires up; coord task only)")
    parser.add_argument("--e2e_warmup_epochs", type=int, default=0,
                        help="epochs of proxy reprojection-loss training "
                             "before switching to the expected pose loss "
                             "(DSAC* initialization practice)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 mixed-precision: conv compute in bfloat16, "
                             "params/GroupNorm statistics/model outputs in "
                             "f32 (framework extension; adds a '-bf16' naming "
                             "token; ~MXU-rate speedup on TPU)")
    parser.add_argument("--stem_s2d", type=str, default="auto",
                        choices=["auto", "on", "off"],
                        help="space-to-depth stems (exact re-expression of "
                             "the strided stem convs, models/layers.py::"
                             "stem_s2d_apply; ~3-4%% faster end-to-end on "
                             "TPU). 'auto' = on iff running on TPU; weights "
                             "are unchanged, so checkpoints stay "
                             "interchangeable either way")
    parser.add_argument("--ckpt_backend", type=str, default="none",
                        choices=["none", "msgpack", "orbax"],
                        help="full-state checkpointing beside each .net "
                             "snapshot: exact Adam/step resume on "
                             "--auto_resume/--epoch_plus (framework "
                             "extension; the reference persists weights only "
                             "and resets optimizer state on resume, "
                             "utils/io.py:114-208)")
    parser.add_argument("--snapshot_every_epochs", type=int, default=1,
                        help="write the per-epoch model.net snapshot every N "
                             "epochs instead of every epoch (framework "
                             "extension; default 1 = exact reference "
                             "cadence). Each snapshot pulls the full "
                             "parameter set device->host (~120 MB for the "
                             "FULL net), which on a bandwidth-constrained "
                             "host link costs more wall time than the "
                             "epoch's compute; the final epoch always "
                             "writes. ckpt_iter_*.net and full-state "
                             "checkpoints keep their own cadence. N>1 "
                             "coarsens --auto_resume granularity to the "
                             "last written snapshot")
    return parser


def normalize_opt(opt):
    if isinstance(opt.uncertainty, str):
        if opt.uncertainty.lower() == "none":
            opt.uncertainty = None
        elif opt.uncertainty.lower() == "mle":
            opt.uncertainty = "MLE"
    assert opt.uncertainty in (None, "MLE"), f"--uncertainty {opt.uncertainty} is not supported!"
    assert opt.real_data_domain in ("in_place", "out_of_place")
    if opt.real_only:
        assert opt.sim_data_chunk == 0
    if getattr(opt, "e2e_pose_loss", False) and opt.task != "coord":
        raise ValueError("--e2e_pose_loss requires --task coord (pose is only "
                         "defined for scene-coordinate regression)")
    return opt


def get_output_path(opt, project_dir=None):
    name = compat.train_output_name(
        opt.scene, opt.task, session=opt.session, grayscale=opt.grayscale,
        uncertainty=opt.uncertainty, fullsize=opt.fullsize, epochs=opt.epochs,
        learning_rate=opt.learningrate, real_data_chunk=opt.real_data_chunk,
        sim_data_chunk=opt.sim_data_chunk, real_data_domain=opt.real_data_domain,
        real_only=opt.real_only, tiny=opt.tiny, network_in=opt.network_in,
        debug=opt.debug, e2e=getattr(opt, "e2e_pose_loss", False),
        bf16=getattr(opt, "bf16", False),
    )
    project_dir = project_dir or os.getcwd()
    return os.path.abspath(os.path.join(project_dir, "output", name))


def select_labels(batch: dict, task: str):
    if task == "semantics":
        return batch["semantics"][..., None].astype(np.float32)
    return batch[task]


def _process_topology():
    """(process_index, process_count) — separated so tests can exercise the
    multi-host wiring single-process by monkeypatching."""
    return jax.process_index(), jax.process_count()


def run_training(opt, output_dir, ckpt_output_dir, model=None, init_params=None):
    """The training loop shared by train/finetune entry points."""
    common.select_device_from_env()
    common.enable_compilation_cache()
    nodata_value = get_nodata_value(opt.scene)

    # Multi-host: opt.batch_size is the GLOBAL batch; each process loads its
    # 1/world slice and the global array is assembled over a DCN-aware mesh
    # (the reference is single-GPU, SURVEY.md §2.3). Only process 0 writes
    # snapshots/logs/FLAG files.
    rank, world = _process_topology()
    is_main = rank == 0
    if world > 1 and opt.batch_size % world != 0:
        raise ValueError(
            f"--batch_size {opt.batch_size} must be divisible by the "
            f"process count {world} (it is the global batch)")
    local_batch = opt.batch_size // world if world > 1 else opt.batch_size

    trainset, loader, mean = common.build_train_loader(
        opt.scene, opt.task, opt.grayscale, opt.real_data_domain, opt.real_data_chunk,
        opt.sim_data_chunk, opt.fullsize, local_batch, opt.real_only, opt.datasets_dir,
        opt.image_height, shard=(rank, world),
    )
    if len(loader) == 0:
        raise ValueError(
            f"batch_size {opt.batch_size} exceeds dataset size {len(trainset)}: "
            "no full batch can be formed (drop_last); reduce --batch_size"
        )
    steps_per_epoch = len(loader)

    if model is None:
        s2d_mode = getattr(opt, "stem_s2d", "auto")
        use_s2d = s2d_mode == "on" or (
            s2d_mode == "auto" and jax.default_backend() == "tpu"
        )
        model = common.build_network(
            opt.scene, opt.task, opt.tiny, opt.grayscale, opt.uncertainty,
            opt.fullsize, mean,
            dtype=jnp.bfloat16 if getattr(opt, "bf16", False) else None,
            stem_s2d=use_s2d,
        )
    tx = make_optimizer(opt.learningrate, steps_per_epoch, opt.no_lr_scheduling)

    sample = trainset.collate([0])
    example = jnp.asarray(sample["image"][:1])
    if opt.grayscale:
        from ..data import to_grayscale

        example = to_grayscale(example)
    state = create_train_state(model, tx, example)
    if init_params is not None:
        state = state._replace(params=init_params)

    # snapshot naming parity (`utils/learning.py:310-320`): runs initialized
    # from --network_in snapshot to model_{auto_,epoch_plus_}resume.net and
    # save the just-loaded weights immediately; fresh runs use model.net
    if opt.network_in is not None:
        state = state._replace(params=compat.load_net(opt.network_in, model))
        logging.info("Successfully loaded %s." % opt.network_in)
        if opt.auto_resume:
            model_path = os.path.join(output_dir, "model_auto_resume.net")
        elif opt.epoch_plus:
            model_path = os.path.join(output_dir, "model_epoch_plus_resume.net")
        else:
            model_path = os.path.join(output_dir, "model_resume.net")
        if is_main:
            compat.save_net(model_path, jax.device_get(state.params), model)
    else:
        model_path = os.path.join(output_dir, "model.net")
    save_period = 1 if opt.task == "semantics" else 5

    # --fullsize trains against full-resolution labels: the reference flips
    # OUTPUT_SUBSAMPLE 8->1 globally for ANY task (`dataloader/dataloader.py:
    # 61,165`) and the loss grid follows (`utils/learning.py:29-32`);
    # semantics is the exception (its labels are always full-res via DUC and
    # its scene dirs carry no '-fullsize' suffix, `utils/learning.py:197-200`)
    subsample = 1 if (opt.fullsize and opt.task != "semantics") else 8
    aug_cfg = AugmentConfig(
        grayscale=opt.grayscale, nodata_value=nodata_value, subsample=subsample,
        # bf16 corner gather on TPU only (f32 accumulation; ~32% faster
        # resample — data/augment.py); CPU runs keep full-f32 sampling so
        # the CPU test suite exercises the reference-parity arithmetic
        image_gather_bf16=jax.default_backend() == "tpu",
    )
    coord_cfg = CoordLossConfig(
        min_depth=opt.mindepth, soft_clamp=opt.softclamp, hard_clamp=opt.hardclamp,
        init_tolerance=opt.inittolerance, nodata_value=nodata_value,
        subsample=subsample,
    )
    depth_cfg = DepthLossConfig(
        min_depth=opt.mindepth, hard_clamp=opt.hardclamp, nodata_value=nodata_value
    )
    normal_cfg = NormalLossConfig(hard_clamp=opt.hardclamp, nodata_value=nodata_value)
    train_step = make_train_step(
        model, tx, opt.task, opt.uncertainty, nodata_value, coord_cfg, depth_cfg, normal_cfg
    )

    # data parallelism: batch sharded over the "data" mesh axis; XLA emits
    # the gradient all-reduce (the reference is single-GPU, SURVEY.md 2.3)
    mesh = None
    global_feed = False
    if world > 1:
        from .. import parallel

        # global DP mesh over every process's devices: "data" spans DCN,
        # gradients all-reduce once per step; batches are assembled from each
        # host's local slice via make_array_from_process_local_data
        mesh = parallel.make_global_mesh(data=jax.device_count(), spatial=1)
        global_feed = True
        state = (parallel.shard_params(mesh, state, axis="data")
                 if getattr(opt, "zero", False)
                 else parallel.replicate(mesh, state))
        logging.info(
            "Multi-host data-parallel training: %d processes x %d local devices "
            "(global batch %d, local %d)%s",
            world, jax.local_device_count(), opt.batch_size, local_batch,
            " with ZeRO parameter sharding" if getattr(opt, "zero", False) else "")
    elif getattr(opt, "num_devices", 1) > 1:
        from .. import parallel

        devices = jax.devices()[: opt.num_devices]
        if len(devices) < opt.num_devices:
            raise ValueError(f"requested {opt.num_devices} devices, found {len(devices)}")
        if opt.batch_size % opt.num_devices != 0:
            raise ValueError("batch_size must be divisible by num_devices")
        mesh = parallel.make_mesh(devices, data=opt.num_devices, spatial=1)
        state = (parallel.shard_params(mesh, state, axis="data")
                 if getattr(opt, "zero", False)
                 else parallel.replicate(mesh, state))
        logging.info("Data-parallel training over %d devices%s", opt.num_devices,
                     " with ZeRO parameter sharding" if getattr(opt, "zero", False)
                     else "")

    zero = getattr(opt, "zero", False)
    if zero and mesh is None:
        raise ValueError("--zero requires a device mesh: set --num_devices > 1 "
                         "or run multi-host (CROSSLOC_COORDINATOR et al.)")

    def to_host(tree):
        # ZeRO-sharded leaves are all-gathered on device first: the
        # .net/.state artifacts are written replicated, and jax.device_get
        # on an array sharded across processes is not fully addressable
        if zero:
            from .. import parallel

            tree = parallel.gather_tree(mesh, tree)
        return jax.device_get(tree)

    # donate the train state (params + Adam moments, ~3x params of HBM):
    # the old state is dead after each call, so XLA can update in place
    # instead of copying. CPU ignores donation with a warning, so gate it.
    donate = (0,) if jax.default_backend() != "cpu" else ()

    @partial(jax.jit, donate_argnums=donate)
    def fused_step(state: TrainState, images, labels, poses, focal, key):
        # images arrive in the uint8 wire format (4x less host->device
        # traffic, exact round trip — data/pipeline.py::images_to_wire)
        images = images_from_wire(images)
        images, labels, poses, focal, pp_shift = augment_batch(
            images, labels, poses, focal, key, aug_cfg, semantics=opt.task == "semantics"
        )
        return train_step(
            state,
            TrainBatch(images=images, poses=poses, labels=labels, focal=focal,
                       pp_shift=pp_shift),
        )

    fused_e2e_step = None
    if getattr(opt, "e2e_pose_loss", False):
        if opt.uncertainty is not None:
            # the expected pose loss consumes only the coord channels
            # (train/dsac_step.py); an MLE head keeps training but its
            # uncertainty channel receives zero gradient from the pose loss
            logging.warning(
                "--e2e_pose_loss with --uncertainty %s: the uncertainty "
                "channel gets NO gradient from the pose loss (only the "
                "coord channels feed the solver)", opt.uncertainty,
            )
        from ..train import make_dsac_train_step

        dsac_step = make_dsac_train_step(model, tx, subsample=subsample)

        @partial(jax.jit, donate_argnums=donate)
        def fused_e2e_step(state: TrainState, images, labels, poses, focal, key):
            images = images_from_wire(images)
            k_aug, k_solver = jax.random.split(key)
            # same device-side augmentation; the crop window's principal-
            # point shift (up to ~(W-1)/2·(s-1) ≈ 120 px at s=1.5) rides
            # TrainBatch.pp_shift into the solver camera, exactly like the
            # proxy loss path (train/step.py)
            images, labels, poses, focal, pp_shift = augment_batch(
                images, labels, poses, focal, k_aug, aug_cfg
            )
            state, metrics = dsac_step(
                state,
                TrainBatch(images=images, poses=poses, labels=labels, focal=focal,
                           pp_shift=pp_shift),
                k_solver,
            )
            # valid_rate has no e2e analog (no per-pixel validity gate); keep
            # the reference log-line contract with a constant 100%
            metrics = dict(metrics, valid_rate=jnp.asarray(1.0))
            return state, metrics

    def shard(arrays):
        if mesh is None:
            return arrays
        from .. import parallel

        if global_feed:
            return parallel.global_batch_from_local(mesh, arrays)
        return parallel.shard_batch(mesh, arrays)

    # full-state checkpointing (framework extension; VERDICT r2 #2): the
    # `.net` snapshot contract is untouched — the `.state`/orbax artifact
    # adds exact Adam/step resume where the reference's log-parse resume
    # silently resets optimizer moments
    ckpt_backend = getattr(opt, "ckpt_backend", "none") or "none"
    manager = None
    if ckpt_backend != "none":
        from ..train import CheckpointManager

        manager = CheckpointManager(output_dir, backend=ckpt_backend)

    # resume bookkeeping (`train_single_task.py:220-233`)
    if opt.auto_resume or opt.epoch_plus:
        iteration, start_epoch = read_training_log(
            os.path.join(os.path.dirname(opt.network_in), "output.log"), len(trainset)
        )
        save_counter = (start_epoch + 1) * len(trainset)
        epoch_de_facto = start_epoch
        last_ckpt_iteration = (start_epoch // 5 * 5) * len(trainset)
        state = state._replace(step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32))
        if manager is not None:
            # prefer a full-state checkpoint from the resumed-from directory
            # (an -eN sibling under --epoch_plus); fall back to the log-parse
            # bookkeeping above when none exists
            src_dir = os.path.dirname(os.path.abspath(opt.network_in))
            src_mgr = manager
            if os.path.abspath(src_dir) != os.path.abspath(output_dir):
                from ..train import CheckpointManager as _CM

                src_mgr = _CM(src_dir, backend=ckpt_backend)
            restored = src_mgr.restore_latest(to_host(state))
            if restored is not None:
                state = restored
                if mesh is not None:
                    from .. import parallel

                    state = (parallel.shard_params(mesh, state, axis="data")
                             if zero else parallel.replicate(mesh, state))
                # the log-parse path conservatively RE-RUNS the last logged
                # epoch (its state is weights-only); the restored state is
                # exact at an epoch boundary, so resume AFTER it — no epoch
                # double-applied, trajectory identical to an uninterrupted run
                start_epoch = int(state.step) // steps_per_epoch
                save_counter = (start_epoch + 1) * len(trainset)
                epoch_de_facto = start_epoch
                logging.info(
                    "Restored full train state (step %d): exact optimizer "
                    "resume from epoch %d.", int(state.step), start_epoch,
                )
            else:
                logging.info("No full-state checkpoint found; log-parse resume "
                             "(optimizer state reset).")
    else:
        iteration, start_epoch, save_counter, epoch_de_facto, last_ckpt_iteration = 0, 0, 0, 0, 0

    snap_every = max(1, int(getattr(opt, "snapshot_every_epochs", 1) or 1))
    if snap_every > 1 and opt.auto_resume:
        logging.warning(
            "--snapshot_every_epochs %d with --auto_resume: a resume can "
            "only restart from the last WRITTEN snapshot (up to %d epochs "
            "behind the log)", snap_every, snap_every - 1)

    base_key = jax.random.PRNGKey(2021)
    for epoch in range(opt.epochs):
        if epoch < start_epoch:
            continue
        logging.info("=== Epoch: %d ======================================" % epoch)
        # epoch-keyed determinism (exact-resume contract): data order and
        # augmentation keys are pure functions of the epoch, not of how many
        # epochs this process has run
        loader.set_epoch(epoch)
        epoch_key = jax.random.fold_in(base_key, epoch)
        batch_idx = 0
        step_fn = fused_step
        if fused_e2e_step is not None and epoch >= opt.e2e_warmup_epochs:
            step_fn = fused_e2e_step
        # uint8 wire format: pack images on the producer side so the
        # host->device link moves 1 byte/channel instead of 4 (exact —
        # the fused steps undo it on device; images_to_wire docstring)
        iterator = map(images_to_wire, iter(loader))
        if mesh is None:
            # overlap host->device transfer with device compute (single-
            # device path only: mesh paths re-place arrays with shardings)
            from ..data import device_prefetch

            pf_keys = ("image", "pose") + (
                () if opt.task == "semantics" else (opt.task,))
            iterator = device_prefetch(iterator, keys=pf_keys)
        for batch in iterator:
            start_time = time.time()
            labels = select_labels(batch, opt.task)
            sub = jax.random.fold_in(epoch_key, batch_idx)
            batch_idx += 1
            sharded = shard(
                (jnp.asarray(batch["image"]), jnp.asarray(labels), jnp.asarray(batch["pose"]))
            )
            state, metrics = step_fn(
                state, *sharded, jnp.asarray(batch["focal"][0]), sub
            )
            loss = float(metrics["loss"])
            valid_rate = float(metrics["valid_rate"])

            # iteration counts GLOBAL samples (the local batch times the
            # process count in a multi-host run)
            batch_size = batch["image"].shape[0] * (world if global_feed else 1)
            time_avg = (time.time() - start_time) / batch_size
            iteration += batch_size
            logging.info(
                "Iteration: %7d, Epoch: %3d, Total loss: %.2f, Valid: %.1f%%, Avg Time: %.3fs"
                % (iteration, epoch, loss, valid_rate * 100, time_avg)
            )

            # de-facto-epoch snapshot (reference site; can fire mid-epoch
            # when batch sizes straddle the epoch boundary) and periodic
            # ckpt can fire on the SAME step. Weights-only: the full-state
            # `.state` is written ONLY at true epoch boundaries below —
            # restore floors to an epoch start, so a mid-epoch `.state`
            # would re-apply the tail batches of its epoch and break the
            # exact-resume contract. The save CONDITIONS are rank-symmetric
            # (iteration counts global samples identically everywhere), and
            # with --zero the host copy is a COLLECTIVE all-gather every
            # rank must join — gathered ONCE here and reused across both
            # save sites; only the file writes stay rank-0-gated.
            fire_snapshot = iteration > save_counter
            fire_ckpt = (
                iteration > last_ckpt_iteration + save_period * len(trainset)
                or last_ckpt_iteration == 0
            )
            # --snapshot_every_epochs N>1 skips the WRITE (and with it the
            # expensive device->host parameter pull) on de-facto epochs that
            # are not multiples of N; the fire bookkeeping stays identical
            # so resume epoch accounting is unchanged. Conditions are
            # rank-symmetric (epoch_de_facto advances identically everywhere)
            snap_write = fire_snapshot and (epoch_de_facto + 1) % snap_every == 0
            if (snap_write or fire_ckpt) and (is_main or zero):
                host_params = to_host(state.params)
            if fire_snapshot:
                if is_main and snap_write:
                    logging.info("Saving snapshot of the network to %s." % model_path)
                    compat.save_net(model_path, host_params, model)
                save_counter = iteration + len(trainset)
                epoch_de_facto += 1
            if fire_ckpt:
                if is_main:
                    compat.save_net(
                        os.path.join(ckpt_output_dir, "ckpt_iter_{:07d}.net".format(iteration)),
                        host_params,
                        model,
                    )
                last_ckpt_iteration = iteration

        # epoch boundary: state.step is exactly (epoch+1)*steps_per_epoch,
        # so restore's epoch bookkeeping is exact. Orbax saves are
        # collective in a multi-host run (train/checkpoint.py:64) — every
        # process must enter them, not just rank 0; the msgpack file is
        # written by rank 0 alone. The --zero host gather is likewise
        # collective, so every rank computes host_state even when only
        # rank 0 writes the msgpack file. When the full state is gathered
        # anyway, the .net snapshot reuses its params instead of running a
        # second all-gather (conditions stay rank-symmetric).
        host_state = None
        if manager is not None and (is_main or manager.backend == "orbax" or zero):
            host_state = to_host(state)
        # --snapshot_every_epochs: skip the boundary pull+write off-cadence
        # (final epoch always writes); epoch-based condition is rank-symmetric
        boundary_write = (epoch + 1) % snap_every == 0 or epoch == opt.epochs - 1
        if host_state is not None:
            host_params = host_state.params
        elif (is_main or zero) and boundary_write:
            host_params = to_host(state.params)
        if is_main and boundary_write:
            logging.info("Saving snapshot of the network to %s." % model_path)
            compat.save_net(model_path, host_params, model)
        if host_state is not None and (is_main or manager.backend == "orbax"):
            manager.save(host_state)

    logging.info("Done without errors.")
    if manager is not None:
        manager.flush()  # commit any in-flight async checkpoint write
    if is_main:
        for d in (output_dir, ckpt_output_dir):
            with open(os.path.join(d, "FLAG_training_done.nodata"), "w") as f:
                f.write("")
    return state


def main(argv=None):
    opt = normalize_opt(config_parser().parse_args(argv))
    # Multi-host: joins the job iff CROSSLOC_COORDINATOR / JAX_* env is set
    # (no-op single-host). Must precede first device use.
    from ..parallel import initialize_distributed

    initialize_distributed()
    output_dir, ckpt_output_dir = config_log(
        opt, get_output_path(opt), file_logging=_process_topology()[0] == 0
    )
    run_training(opt, output_dir, ckpt_output_dir)


if __name__ == "__main__":
    main()
