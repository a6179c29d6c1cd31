"""Reference-scale convergence demonstration (VERDICT r1 item 4).

Trains WiFlow for the reference's full recipe — 360k windows, batch 256,
AdamW lr 1e-4 wd 5e-5, ReduceLROnPlateau(0.5, patience 3) on val MPE,
early stop patience 5, best-checkpoint, test sweep, full artifact dump
(ref /root/reference/train.py:48-580) — on synthetic data with the same
structure as data/synthetic.py (smooth pose trajectories + velocity
through a random mixing map + noise), generated ON DEVICE so the axon
tunnel's host->device bandwidth doesn't bound the run.

The real dataset is not redistributable; the point here is a measured
end-to-end run at reference scale showing the plateau scheduler and
early stopping behave as train.py:112-121,361-384 do, with the wall
clock recorded.

Usage:
  python -m wiflow_tpu.cli.convergence_demo --windows 360000 --epochs 50 \
      --output_dir measured/convergence
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def synth_windows(n: int, seed: int, num_subcarriers: int = 540,
                  window: int = 20, keypoints: int = 15,
                  chunk: int = 15_000, mix_seed: int = 7,
                  subject: int = 0, mode: str = "linear",
                  n_paths: int = 48):
    """On-device [n, 540, 20] CSI windows + [n, 15, 2] last-frame poses.

    Mirrors data/synthetic.py's generative structure: per-window smooth
    pose trajectories (sums of random sinusoids), then a CSI observation
    model selected by ``mode``:

    * ``'linear'`` (default, rounds 1-4): one global LINEAR mixing map of
      [pose, velocity] into subcarrier space + noise.  Instantaneously
      invertible per frame — a plain per-frame encoder can solve it, so
      this mode cannot reward temporal or cross-subcarrier modeling.
    * ``'multipath'`` (VERDICT r4 item 6): motion-modulated multipath.
      Each of P scatter paths has a pose-dependent delay
      tau_p(t) = w_p . kp(t); subcarrier c observes
      sum_p A_p(t) cos(omega_c tau_p(t) + phi_p) with per-subcarrier
      wavenumbers omega_c and Doppler-style amplitude modulation
      A_p(t) = 1 + g (u_p . vel(t)).  The per-frame observation is a
      WRAPPED (cosine) projection of the pose — many-to-one per
      subcarrier — so position must be disambiguated by combining
      subcarriers of different omega_c (cross-subcarrier structure, the
      axial-attention/grouped-conv axis) and by the temporal smoothness
      of tau_p(t) (the TCN axis).  This is the WiFi-CSI physics the
      reference architecture was designed for (ref README.md:13-27).

      ``n_paths`` must be >= 2*keypoints for the pose to be recoverable
      AT ALL: the CSI observes kp(t) only through the P-dim projections
      tau = kp . w_path and dop = vel . u_path, so with P < 30 the
      orthogonal complement of span(w_path) is invisible to every model
      — the r5 first-cut table (measured/ablations_r05 at P=8) had all
      five variants pinned within noise of the mean-pose floor
      (MPJPE 0.234-0.25 vs floor 0.25) for exactly this reason.  The
      default P=48 makes kp -> tau injective w.h.p. while keeping the
      per-subcarrier observation wrapped and many-to-one.

    ``subject`` (1..5, 0 = generic) gives each subject a distinct style —
    shifted movement amplitude/frequency distributions and a CSI gain —
    over the SAME shared CSI<->pose physics, so LOSO folds (Setting 2,
    ref README.md:122-188) see genuine cross-subject distribution shift.
    """
    import functools

    import jax
    import jax.numpy as jnp

    assert mode in ("linear", "multipath"), mode
    k2 = keypoints * 2
    # the CSI<->pose mapping must be IDENTICAL across splits and subjects
    # (everyone moves in the same radio world); only trajectories vary
    kmix = jax.random.key(mix_seed)
    mix = jax.random.normal(kmix, (2 * k2, num_subcarriers), jnp.float32)
    kp_, ku_, ka_, kph_ = jax.random.split(jax.random.fold_in(kmix, 1), 4)
    # path-delay projections: tau_p ~ N(0, (0.2)^2)-ish over the pose range
    w_path = jax.random.normal(kp_, (k2, n_paths)) / jnp.sqrt(k2)
    u_path = jax.random.normal(ku_, (k2, n_paths)) / jnp.sqrt(k2)
    a_path = 0.7 + 0.6 * jax.random.uniform(ka_, (n_paths,))
    phi = jax.random.uniform(kph_, (n_paths, num_subcarriers),
                             maxval=2 * jnp.pi)
    # wavenumbers: omega tau spans ~[-1, -4]..[1, 4] rad over subcarriers
    # -> high subcarriers wrap (ambiguous alone), low ones anchor
    omega = jnp.linspace(4.0, 16.0, num_subcarriers)
    s = subject
    amp_scale = 0.08 * (1.0 + 0.25 * ((s % 3) - 1)) if s else 0.08
    freq_lo = 0.05 + (0.03 * (s - 1) if s else 0.0)
    freq_hi = 0.4 + (0.06 * ((s % 2) * 2 - 1) if s else 0.0)
    csi_gain = 1.0 + (0.06 * (s - 3) if s else 0.0)

    @jax.jit
    def gen_chunk(key):
        k1, k2_, k3, k4, k5 = jax.random.split(key, 5)
        m = chunk
        t = jnp.arange(window, dtype=jnp.float32)[None, :, None]
        base = 0.2 * jax.random.normal(k1, (m, 1, k2))
        amp = amp_scale * jax.random.normal(k2_, (m, 1, k2))
        freq = jax.random.uniform(k3, (m, 1, k2), minval=freq_lo,
                                  maxval=freq_hi)
        phase = jax.random.uniform(k4, (m, 1, k2), minval=0.0,
                                   maxval=2 * jnp.pi)
        kp = base + amp * jnp.sin(freq * t + phase)        # [m, T, 30]
        vel = jnp.diff(kp, axis=1, prepend=kp[:, :1])
        if mode == "multipath":
            tau = jnp.einsum("mtf,fp->mtp", kp, w_path)    # [m, T, P]
            dop = jnp.einsum("mtf,fp->mtp", 8.0 * vel, u_path)
            gain = a_path[None, None, :] * (1.0 + jnp.tanh(dop))
            # accumulate per path with lax.scan: a single [m, T, P, C]
            # intermediate would be gigabytes at chunk scale, and a
            # Python loop would unroll P copies of the body into the jit
            # (fine at P=8, compile bloat at P=48+)
            path_scale = csi_gain / (n_paths / 8.0) ** 0.5  # variance-
            # preserving: CSI std stays what the P=8 recipes were tuned on

            def add_path(csi, xs):
                tau_p, gain_p, phi_p = xs                  # [m,T],[m,T],[C]
                ang = tau_p[..., None] * omega[None, None, :] \
                    + phi_p[None, None, :]                 # [m, T, C]
                return csi + path_scale * gain_p[..., None] * jnp.cos(ang), None

            csi, _ = jax.lax.scan(
                add_path,
                0.05 * jax.random.normal(
                    k5, (m, window, num_subcarriers)) + 1.0,
                (jnp.moveaxis(tau, -1, 0), jnp.moveaxis(gain, -1, 0), phi))
        else:
            feats = jnp.concatenate([kp, 5.0 * vel], axis=-1)  # [m, T, 60]
            csi = csi_gain * jnp.einsum("mtf,fc->mtc", feats, mix) \
                + 0.05 * jax.random.normal(
                    k5, (m, window, num_subcarriers)) + 1.0
        x = jnp.transpose(csi, (0, 2, 1)).astype(jnp.bfloat16)
        y = (kp[:, -1, :].reshape(m, keypoints, 2) + 0.5) \
            .astype(jnp.float32)                            # ~[0, 1] m
        return x, y

    # fill preallocated buffers with donation — a concat of chunk lists
    # would double peak HBM (measured OOM at 360k windows on 16 GB)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def write_chunk(xbuf, ybuf, xc, yc, offset):
        return (jax.lax.dynamic_update_slice(xbuf, xc, (offset, 0, 0)),
                jax.lax.dynamic_update_slice(ybuf, yc, (offset, 0, 0)))

    xbuf = jnp.zeros((n, num_subcarriers, window), jnp.bfloat16)
    ybuf = jnp.zeros((n, keypoints, 2), jnp.float32)
    key = jax.random.key(seed + 1)
    done = 0
    while done < n:
        key, sub = jax.random.split(key)
        xc, yc = gen_chunk(sub)
        m = min(chunk, n - done)
        xbuf, ybuf = write_chunk(xbuf, ybuf, xc[:m], yc[:m],
                                 jnp.int32(done))
        done += m
    jax.block_until_ready((xbuf, ybuf))
    return xbuf, ybuf


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="reference-scale convergence run")
    p.add_argument("--windows", type=int, default=360_000)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)       # train.py:105
    p.add_argument("--output_dir", type=str,
                   default="measured/convergence")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_videos", action="store_true")
    p.add_argument("--use_augmentation", action="store_true",
                   help="train.py:187-193 on-device augmentation policy")
    p.add_argument("--patience", type=int, default=5)   # train.py:382
    p.add_argument("--resume", action="store_true",
                   help="continue from latest_checkpoint.pkl in "
                        "--output_dir (kill/resume demos)")
    args = p.parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from wiflow_tpu.core.config import Config, MeshConfig, OptimConfig, TrainConfig
    from wiflow_tpu.eval.artifacts import write_all_artifacts
    from wiflow_tpu.train.loop import train_pose_model

    t0 = time.time()
    n = args.windows
    n_tr, n_va = int(n * 0.7), int(n * 0.15)
    # per-split buffers: slicing one big array would transiently double
    # HBM while the parent is alive
    train = synth_windows(n_tr, args.seed)
    val = synth_windows(n_va, args.seed + 101)
    test = synth_windows(n - n_tr - n_va, args.seed + 202)
    gen_sec = time.time() - t0
    print(f"[data] {n} windows generated on-device in {gen_sec:.1f}s "
          f"(train {n_tr} / val {n_va} / test {n - n_tr - n_va})")

    cfg = Config(
        train=TrainConfig(batch_size=args.batch_size, num_epochs=args.epochs,
                          patience=args.patience, seed=args.seed,
                          use_augmentation=args.use_augmentation,
                          data_dtype="bfloat16",   # 360k fp32 would OOM
                          optim=OptimConfig(lr=args.lr, weight_decay=5e-5)),
        mesh=MeshConfig(num_devices=1), output_dir=args.output_dir)

    t1 = time.time()
    result = train_pose_model(train, val, test, cfg, args.output_dir,
                              resume=args.resume)
    train_sec = time.time() - t1
    paths = write_all_artifacts(result, args.output_dir,
                                make_videos=not args.no_videos)

    summary = {
        "windows": n,
        "epochs_requested": args.epochs,
        "epochs_run": result.epochs_run,
        "best_epoch": result.best_epoch + 1,
        "early_stopped": result.epochs_run < args.epochs,
        "train_wall_clock_sec": round(train_sec, 1),
        "data_gen_sec": round(gen_sec, 1),
        "test_metrics": {k: round(float(v), 6)
                         for k, v in result.test_metrics.items()},
        "final_lr": float(result.history["lr"][-1]),
        "lr_reductions": sorted({float(v) for v in result.history["lr"]},
                                reverse=True),
        "val_mpe_trajectory": [round(float(v), 5)
                               for v in result.history["val_mpe"]],
        "val_pck20_trajectory": [round(float(v), 5)
                                 for v in result.history["val_pck"]],
        "artifacts": sorted(os.path.basename(p) for p in paths.values()),
    }
    out = os.path.join(args.output_dir, "run_summary.json")
    with open(out, "w", encoding="utf-8") as fd:
        json.dump(summary, fd, indent=2)
    print(f"[done] {result.epochs_run} epochs in {train_sec / 60:.1f} min "
          f"| test PCK@20 {result.test_metrics['pck@0.2'] * 100:.2f}% "
          f"MPJPE {result.test_metrics['mpe']:.4f} m | summary -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
