"""Training engine: epochs, validation, LR plateau, early stop, test sweep.

TPU-native rebuild of ref /root/reference/train.py:48-580.  Differences by
design (everything else mirrors the reference's observable behavior):

  * the whole split lives in device HBM, sharded over the data mesh axis;
    an epoch is one jitted ``lax.scan`` — no DataLoader, no AMP/GradScaler,
  * data parallelism is GSPMD over a ``('data',)`` mesh instead of
    ``nn.DataParallel`` (train.py:91-93),
  * full-resume checkpointing is first-class every epoch (the reference
    only has it in the MM-Fi variant, wiflow.py:1253-1283),
  * crashes the reference ships are fixed: augmentation actually imported
    and applied on-device (SURVEY §8.2), weight_decay honored (§8.6).

Behavior kept: effective/physical batch + grad accumulation, drop_last on
train AND val/test (affects reported metrics, §8.8), val batch = batch//2
(train.py:145), ReduceLROnPlateau on val MPE, early stop patience 5,
best-checkpoint on val MPE improvement, test PCK@{0.1..0.5} + MPJPE.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wiflow_tpu.core.checkpoint import (
    load_checkpoint, save_best_model, save_checkpoint,
)
from wiflow_tpu.core.config import Config
from wiflow_tpu.models.wiflow import WiFlowPoseModel
from wiflow_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate,
)
from wiflow_tpu.train.optim import (
    EarlyStopping, ReduceLROnPlateau, epoch_schedule_lr, get_learning_rate,
    make_optimizer, set_learning_rate,
)
from wiflow_tpu.train.steps import (
    TEST_THRESHOLDS, TrainState, create_train_state, make_batch_indices,
    make_step_fns,
)

HISTORY_KEYS = (
    "train_loss", "val_loss", "train_position_loss", "train_bone_loss",
    "train_mpe", "val_mpe", "train_pck", "val_pck",
    "train_pck50", "val_pck50", "lr",
)


def scaled_patience(epochs: int, steps: Optional[int],
                    steps_per_epoch: int) -> int:
    """Effective epoch-counted patience for a steps-expressed budget.

    The torch-faithful BN eval-lag warmup is step-counted, so an
    epoch-counted patience mis-scales at demo size (VERDICT r4 item 5:
    a 46-step epoch cut lr to the floor before the running stats
    warmed).  ``max(epochs, ceil(steps / steps_per_epoch))`` — at the
    reference recipe's 3937 steps/epoch the defaults collapse to the
    reference's raw epoch counts.  ``steps`` None/0 disables scaling.
    """
    if not steps:
        return epochs
    return max(epochs, -(-steps // steps_per_epoch))


@dataclasses.dataclass
class TrainResult:
    variables: Dict[str, Any]          # best {'params', 'batch_stats'}
    history: Dict[str, list]
    test_metrics: Dict[str, float]     # loss, mpe, pck@0.1..0.5
    predictions: np.ndarray            # [n_test_eval, K, D]
    targets: np.ndarray
    best_epoch: int
    epochs_run: int
    wall_clock_sec: float


def _stage(mesh, arrays: Tuple[np.ndarray, np.ndarray],
           data_dtype=jnp.float32):
    """Stage (x, y) to HBM sharded over the data axis.

    Storage is zero-padded to a multiple of the mesh size (sharded
    device_put requires divisibility); batch index tables are built over
    the *real* sample count, so pad rows are never gathered.  CSI storage
    honours ``data_dtype`` — bf16 halves HBM (360k x 540x20 fp32 = 15.5 GB
    -> 7.8 GB, SURVEY §7); labels stay fp32.  Returns (x_dev, y_dev,
    n_real).
    """
    sh = batch_sharding(mesh)
    x, y = arrays
    n = len(x)
    pad = (-n) % mesh.size
    # already-on-device arrays (e.g. on-device synthetic data) with the
    # right dtype need no copy on a 1-device mesh — a device_put would
    # transiently double HBM (measured OOM at 360k windows)
    if (pad == 0 and mesh.size == 1 and isinstance(x, jax.Array)
            and isinstance(y, jax.Array) and x.dtype == data_dtype
            and y.dtype == jnp.float32):
        return x, y, n
    if pad:
        x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
        y = np.concatenate([y, np.zeros((pad, *y.shape[1:]), y.dtype)])
    return (jax.device_put(jnp.asarray(x, data_dtype), sh),
            jax.device_put(jnp.asarray(y, jnp.float32), sh), n)


def _segment_sizes(n_steps: int, k_max: int) -> list:
    """Split ``n_steps`` into scan segments of at most ``k_max`` steps,
    preferring one uniform size (a single compiled program shape): the
    largest divisor of ``n_steps`` that is <= k_max, if one exists above
    k_max/2; otherwise near-even sizes (two program shapes)."""
    for d in range(k_max, max(1, k_max // 2), -1):
        if n_steps % d == 0:
            return [d] * (n_steps // d)
    n_seg = -(-n_steps // k_max)
    base, extra = divmod(n_steps, n_seg)
    return [base + 1] * extra + [base] * (n_seg - extra)


def train_pose_model(
    train_data: Tuple[np.ndarray, np.ndarray],
    val_data: Tuple[np.ndarray, np.ndarray],
    test_data: Tuple[np.ndarray, np.ndarray],
    cfg: Config = Config(),
    output_dir: str = "outputs",
    model=None,
    resume: bool = True,
    connections=None,
    pck_fn=None,
    mpe_fn=None,
    loss_fn=None,
    to_keypoints=None,
    monitor: str = "mpe",
    init_variables: Optional[Dict[str, Any]] = None,
    frozen_params: Optional[Tuple[str, ...]] = None,
    verbose: bool = True,
) -> TrainResult:
    """Train, validate with early stopping, then test with the best model.

    ``init_variables``: pretrained {'params', 'batch_stats'} subtrees
    merged over the fresh init (e.g. a trained denoiser encoder).
    ``frozen_params``: top-level param subtree names excluded from
    optimization (ref HPE-Li frozen AE encoders).
    """
    t_start = time.time()
    os.makedirs(output_dir, exist_ok=True)
    tc = cfg.train

    mesh = make_mesh(cfg.mesh.num_devices)
    if model is None:
        model = WiFlowPoseModel(cfg.model)
    tx = make_optimizer(tc.optim, frozen_subtrees=frozen_params)

    # --- stage data in HBM, sharded over the data axis ------------------
    ddt = jnp.dtype(tc.data_dtype)
    train_x, train_y, n_train = _stage(mesh, train_data, ddt)
    val_x, val_y, n_val = _stage(mesh, val_data, ddt)
    test_x, test_y, n_test = _stage(mesh, test_data, ddt)

    batch = min(tc.batch_size, n_train)
    eval_batch = max(1, batch // 2)            # ref train.py:145
    accum = max(1, tc.grad_accum_steps)

    # monitor: 'mpe' = min val MPE (trunk, train.py:361); 'pck' = max val
    # PCK (MM-Fi variant, wiflow.py:1227)
    assert monitor in ("mpe", "pck"), monitor
    mode = "min" if monitor == "mpe" else "max"

    train_epoch, eval_epoch = make_step_fns(
        model, tx, tc.loss, mesh=mesh,
        use_augmentation=tc.use_augmentation, grad_accum_steps=accum,
        connections=connections, pck_fn=pck_fn, mpe_fn=mpe_fn,
        loss_fn=loss_fn, to_keypoints=to_keypoints, scan=tc.scan_epochs)

    # --- init / resume ---------------------------------------------------
    state = create_train_state(model, tx, train_x[:1], seed=tc.seed)
    if init_variables is not None:
        params = dict(state.params)
        stats = dict(state.batch_stats)
        for k, v in init_variables.get("params", {}).items():
            params[k] = v
        for k, v in init_variables.get("batch_stats", {}).items():
            stats[k] = v
        state = state._replace(params=params, batch_stats=stats,
                               opt_state=tx.init(params))
    state = TrainState(*replicate(mesh, tuple(state)))

    # steps-aware patience (VERDICT r4 item 5): see scaled_patience
    steps_per_epoch = max(1, (n_train // batch) // accum)
    plateau_patience = scaled_patience(tc.optim.plateau_patience,
                                       tc.optim.plateau_patience_steps,
                                       steps_per_epoch)
    stop_patience = scaled_patience(tc.patience, tc.patience_steps,
                                    steps_per_epoch)
    scheduler = ReduceLROnPlateau.from_config(tc.optim, mode=mode)
    scheduler.patience = plateau_patience
    stopper = EarlyStopping(patience=stop_patience, mode=mode)
    if verbose and (plateau_patience != tc.optim.plateau_patience
                    or stop_patience != tc.patience):
        print(f"[patience] {steps_per_epoch} steps/epoch -> plateau "
              f"patience {plateau_patience} epochs, early-stop "
              f"{stop_patience} (steps-scaled; see "
              f"OptimConfig.plateau_patience_steps)")
    history: Dict[str, list] = {k: [] for k in HISTORY_KEYS}
    best_variables = None
    start_epoch = 0

    ckpt_path = os.path.join(output_dir, "latest_checkpoint.pkl")
    if resume:
        ckpt = load_checkpoint(ckpt_path)
        if ckpt is not None:
            state = TrainState(*replicate(mesh, (
                ckpt["params"], ckpt["batch_stats"], ckpt["opt_state"])))
            scheduler.load_state_dict(ckpt["scheduler"])
            stopper.load_state_dict(ckpt["early_stopping"])
            history = ckpt["history"]
            best_variables = ckpt.get("best_variables")
            start_epoch = ckpt["epoch"] + 1
            if verbose:
                print(f"[resume] continuing from epoch {start_epoch} "
                      f"(best val {monitor} {stopper.best:.4f} @ epoch "
                      f"{stopper.best_epoch + 1})")

    base_key = jax.random.key(tc.seed, impl=tc.rng_impl)
    val_idx = make_batch_indices(n_val, eval_batch)
    test_idx = make_batch_indices(n_test, eval_batch)

    if verbose:
        print(f"[train] {n_train} samples, batch {batch} (accum {accum}), "
              f"{mesh.size} device(s), {tc.num_epochs} epochs")

    epochs_run = start_epoch
    if n_val == 0 and start_epoch < tc.num_epochs:
        print("[train] WARNING: empty val split — 'val_*' history columns, "
              "early stopping, plateau LR and best-checkpoint selection "
              "all monitor TRAIN-epoch metrics (dropout/augmentation "
              "active) for this run")
    for epoch in range(start_epoch, tc.num_epochs):
        lr_used = get_learning_rate(state.opt_state)
        ekey = jax.random.fold_in(base_key, epoch)
        perm = jax.random.permutation(jax.random.fold_in(ekey, 0), n_train)
        batch_idx = make_batch_indices(n_train, batch, perm)

        t0 = time.time()
        aug = tc.use_augmentation and epoch > 0
        if tc.max_steps_per_call and \
                batch_idx.shape[0] > tc.max_steps_per_call:
            # bounded scan segments (see TrainConfig.max_steps_per_call);
            # each segment gets its own RNG stream, metrics are
            # step-weighted means
            sizes = _segment_sizes(batch_idx.shape[0],
                                   tc.max_steps_per_call)
            seg_ms, off = [], 0
            for si, sz in enumerate(sizes):
                state, m = train_epoch(state, train_x, train_y,
                                       batch_idx[off:off + sz],
                                       jax.random.fold_in(ekey, 1 + si),
                                       aug)
                seg_ms.append(jax.device_get(m))
                off += sz
            tm = {k: float(np.average([m[k] for m in seg_ms],
                                      weights=sizes))
                  for k in seg_ms[0]}
        else:
            state, tm = train_epoch(state, train_x, train_y, batch_idx,
                                    jax.random.fold_in(ekey, 1), aug)
            tm = jax.device_get(tm)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if n_val > 0:
            vm, _ = eval_epoch(variables, val_x, val_y, val_idx)
            vm = jax.device_get(vm)
        else:
            # tiny datasets can produce an empty val split (the reference
            # splitter assigns whole files; run.py:49-57) — monitor the
            # train-epoch metrics instead of crashing on an empty scan
            vm = tm
        dt = time.time() - t0

        history["train_loss"].append(float(tm["loss"]))
        history["val_loss"].append(float(vm["loss"]))
        history["train_position_loss"].append(float(tm["position"]))
        history["train_bone_loss"].append(float(tm["bone"]))
        history["train_mpe"].append(float(tm["mpe"]))
        history["val_mpe"].append(float(vm["mpe"]))
        history["train_pck"].append(float(tm["pck"]))
        history["val_pck"].append(float(vm["pck"]))
        history["train_pck50"].append(float(tm["pck50"]))
        history["val_pck50"].append(float(vm["pck50"]))
        history["lr"].append(lr_used)

        val_mpe = float(vm["mpe"])
        monitored = val_mpe if monitor == "mpe" else float(vm["pck"])
        if verbose:
            print(f"Epoch {epoch + 1}/{tc.num_epochs} [{dt:.2f}s] "
                  f"train loss {float(tm['loss']):.4f} mpe {float(tm['mpe']):.4f} "
                  f"pck20 {float(tm['pck']):.4f} | val loss {float(vm['loss']):.4f} "
                  f"mpe {val_mpe:.4f} pck20 {float(vm['pck']):.4f} "
                  f"| lr {lr_used:.6f}")

        prev_lr = scheduler.lr
        if tc.optim.schedule == "plateau":
            new_lr = scheduler.step(monitored)
        else:
            new_lr = epoch_schedule_lr(tc.optim, epoch + 1)
            scheduler.lr = new_lr
        if new_lr != prev_lr:
            state = state._replace(
                opt_state=set_learning_rate(state.opt_state, new_lr))
            if verbose:
                print(f"  [plateau] lr -> {new_lr:.6f}")

        if stopper.update(monitored, epoch):
            best_variables = jax.device_get(variables)
            # .pth export only for the reference architecture (the torch
            # spec has no analog for e.g. the conv2d-encoder ablation)
            exportable = (isinstance(model, WiFlowPoseModel)
                          and cfg.model.encoder_kind == "wiflow")
            save_best_model(output_dir, best_variables,
                            cfg.model if exportable else None)
            if verbose:
                print(f"  [best] val {monitor} {monitored:.4f} -> saved "
                      f"best_pose_model.*")

        epochs_run = epoch + 1
        if tc.checkpoint_every_epoch:
            save_checkpoint(ckpt_path, {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "scheduler": scheduler.state_dict(),
                "early_stopping": stopper.state_dict(),
                "history": history,
                "best_variables": best_variables,
                "epoch": epoch,
            })

        if stopper.should_stop:
            if verbose:
                print(f"[early-stop] after epoch {epoch + 1}; best epoch "
                      f"{stopper.best_epoch + 1}")
            break

    # --- test with best weights -----------------------------------------
    if best_variables is None:
        best_variables = jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats})
    best_dev = replicate(mesh, best_variables)
    test_m, (preds, targets) = eval_epoch(best_dev, test_x, test_y, test_idx)
    test_m = jax.device_get(test_m)
    preds = np.asarray(jax.device_get(preds))
    targets = np.asarray(jax.device_get(targets))

    curve = np.asarray(test_m["pck_curve"], np.float64)
    test_metrics = {"loss": float(test_m["loss"]),
                    "mpe": float(test_m["mpe"])}
    for thr, v in zip(TEST_THRESHOLDS, curve):
        test_metrics[f"pck@{thr}"] = float(v)

    if verbose:
        pcks = " ".join(f"PCK@{int(t*100)}={test_metrics[f'pck@{t}']*100:.2f}%"
                        for t in TEST_THRESHOLDS)
        print(f"[test] loss {test_metrics['loss']:.4f} "
              f"MPJPE {test_metrics['mpe']:.4f} m | {pcks}")

    return TrainResult(
        variables=best_variables, history=history, test_metrics=test_metrics,
        predictions=preds, targets=targets, best_epoch=stopper.best_epoch,
        epochs_run=epochs_run, wall_clock_sec=time.time() - t_start)
