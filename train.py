#!/usr/bin/env python
"""Training CLI for the LSSVC two-layer codec (the reference ships no
training loop — only cluster command scaffolding; this is the TPU-native
counterpart).

Data-parallel over all attached devices: batch sharded on a 1-D mesh,
parameters replicated, gradient all-reduce inserted by XLA.  Frame pairs
come from directories of YUV sequences (random temporal pairs + spatial
crops) or a synthetic generator for smoke runs.

Example:
  python train.py --steps 1000 --lmbda 0.01 --crop 256 --data synthetic
  python train.py --data /data/vimeo --resume ckpt.npz
"""

import argparse
import glob
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="synthetic",
                   help="directory of .yuv sequences, or 'synthetic'")
    p.add_argument("--width", type=int, default=448,
                   help="source YUV width (for --data dirs)")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--crop", type=int, default=256,
                   help="EL crop size (must be divisible by 128 for x2)")
    p.add_argument("--batch-per-device", type=int, default=1)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lmbda", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--out", type=str, default="checkpoints/lssvc")
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--freeze", type=str, default=None,
                   choices=[None, "prediction", "other"],
                   help="freeze the motion-prediction subnets or everything "
                        "else (reference's selective-freeze training stages)")
    p.add_argument("--loss", type=str, default="pair",
                   choices=["pair", "warp", "spynet", "cascade", "intra"],
                   help="pair = single P-frame RD; warp = motion-stage loss "
                        "(distortion on the warped prediction); cascade = "
                        "multi-frame DPB-chain RD (error accumulation); "
                        "intra = IntraSS two-layer RD + quantile aux loss")
    p.add_argument("--precision", type=str, default="high",
                   choices=["fp32", "high", "bf16"],
                   help="training compute precision: fp32 = 6-pass exact "
                        "matmuls; high (default) = f32 activations with "
                        "3-pass bf16 matmuls (~2x, near-fp32 grads); bf16 = "
                        "bf16 conv operands/outputs (fastest; params and "
                        "optimizer state stay f32 either way)")
    p.add_argument("--frames", type=int, default=4,
                   help="chain length T for --loss cascade (frame 0 is the "
                        "uncompressed reference, T-1 frames are coded)")
    p.add_argument("--stage", type=str, default=None,
                   choices=[None, "spynet", "mv", "full", "cascade"],
                   help="reference-style staged recipe preset: spynet = "
                        "unsupervised photometric flow pretrain (the "
                        "reference inherits a pretrained SpyNet); mv = "
                        "freeze non-motion ('other'), warp loss; full = "
                        "pair loss, nothing frozen; cascade = multi-frame "
                        "loss. Overrides --loss/--freeze.")
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="if >0, cosine-decay the LR to lr/100 over this "
                        "many steps")
    p.add_argument("--skip-if-done", action="store_true",
                   help="exit 0 immediately when {out}_step{steps}.npz "
                        "already exists (orchestrator retry path: a stage "
                        "whose weights landed but whose process died — "
                        "e.g. wedged on the optimizer-state transfer — "
                        "must not retrain on retry)")
    p.add_argument("--scan-steps", type=int, default=0,
                   help="optimizer steps chained per device program via "
                        "lax.scan (amortizes host->device dispatch latency, "
                        "which dominates at training crop sizes through the "
                        "remote-device tunnel); 1 = one dispatch per step; "
                        "0 = auto (8, but 2 for --stage cascade: compile "
                        "memory scales with frames x chained steps and the "
                        "8x 3-frame cascade graph OOM-kills the remote "
                        "compile helper)")
    args = p.parse_args()
    if args.scan_steps <= 0:
        args.scan_steps = 8  # scan body is traced ONCE; length is free
    args.cascade_warm = 0
    if args.stage == "cascade":
        # the 3-frame FULL-GRADIENT cascade body (3 two-layer forwards +
        # 3-frame backward, ~1.48 MB MLIR) deterministically OOM-kills
        # the chipless AOT compile helper on this box; only `cap` frames
        # get gradients (LSSVC_CASCADE_FRAMES to raise).  Frames beyond
        # the cap become forward-only DPB WARM-UP steps rather than
        # being dropped: a chain truncated to T=2 never trains the
        # steady-state 48ch-feature P-frame path, and eval reconstruction
        # collapses from the second P-frame on (round-4 probe: 18.9 dB
        # at frame 1 -> 6-8 dB at frames 2+; rd_loss_cascade docstring).
        cap = int(os.environ.get("LSSVC_CASCADE_FRAMES", "2"))
        if args.frames > cap:
            args.cascade_warm = args.frames - cap
            print(f"cascade: {args.cascade_warm} forward-only DPB warm-up "
                  f"step(s) + {cap - 1} gradient step(s) (grad-frame cap "
                  f"{cap}: compile-helper memory; set LSSVC_CASCADE_FRAMES "
                  f"to raise)", flush=True)
    return args


def resume_policy(tag: str, step0: int, out: str, steps: int) -> str:
    """Classify a --resume with an existing sibling .state.npz.

    'crash' = same-stage crash resume: restore Adam moments, LR-schedule
    position, and the step counter.  'stage' = cross-stage handoff:
    params only, fresh optimizer, step 0.

    The out_tag written by save_train_state is authoritative (every RD
    stage uses a distinct --out).  Untagged legacy states fall back to a
    heuristic: a restored step >= this run's --steps can only be a
    *finished other* stage (a same-stage crash resume is by construction
    mid-run), so it is a stage handoff — the round-3 RD pipeline
    deadlocked exactly here, resuming a 1200-step cascade stage at the
    full stage's step 2400, running zero iterations and saving nothing.
    """
    if tag and tag != out:
        return "stage"
    if not tag and step0 >= steps:
        return "stage"
    return "crash"


class SyntheticPairs:
    """Correlated frame pairs / sequences: translated smooth textures with
    per-sequence constant velocity (smoke + convergence training)."""

    def __init__(self, crop, seed=0):
        self.crop = crop
        self.rng = np.random.default_rng(seed)

    def _smooth_texture(self, n, h, w):
        """Low-frequency random texture (white noise is incompressible and
        unwarpable — useless as a training signal)."""
        small = self.rng.random((n, h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
        try:  # bicubic-ish upsample via separable repeat + box blur
            from scipy.ndimage import zoom

            up = np.stack([zoom(s, (8, 8, 1), order=1)[:h, :w] for s in small])
        except ImportError:
            up = np.repeat(np.repeat(small, 8, 1), 8, 2)[:, :h, :w]
        return np.clip(up, 0, 1)

    def next_sequences(self, n, t, max_v=3):
        """(n, t, crop, crop, 3) sequences, constant per-sequence motion."""
        c = self.crop
        m = max_v * (t - 1) + 1
        base = self._smooth_texture(n, c + 2 * m, c + 2 * m)
        out = np.empty((n, t, c, c, 3), dtype=np.float32)
        for i in range(n):
            vx, vy = self.rng.integers(-max_v, max_v + 1, 2)
            for j in range(t):
                y0, x0 = m + vy * j, m + vx * j
                out[i, j] = base[i, y0:y0 + c, x0:x0 + c]
        out += 0.01 * self.rng.standard_normal(out.shape).astype(np.float32)
        return np.clip(out, 0, 1)

    def next_batch(self, n):
        seq = self.next_sequences(n, 2)
        return seq[:, 0], seq[:, 1]


class YUVPairs:
    """Random (ref, cur) frame pairs with aligned random crops from a
    directory of .yuv files."""

    def __init__(self, root, width, height, crop, seed=0):
        from lssvc_tpu.utils.io import YUVReader

        self.files = sorted(glob.glob(os.path.join(root, "**", "*.yuv"),
                                      recursive=True))
        frame_bytes = width * height * 3 // 2
        short = [f for f in self.files
                 if os.path.getsize(f) < frame_bytes]
        if short:
            print(f"YUVPairs: skipping {len(short)} file(s) shorter than "
                  f"one {width}x{height} frame, e.g. {short[0]}")
            self.files = [f for f in self.files if f not in set(short)]
        if not self.files:
            raise FileNotFoundError(
                f"no usable .yuv under {root} (>= one frame at "
                f"{width}x{height})")
        self.width = width
        self.height = height
        self.crop = crop
        self.rng = np.random.default_rng(seed)
        self._reader_cls = YUVReader

    def _read_frames(self, path, t):
        from lssvc_tpu.utils.color import ycbcr420_to_rgb

        # frame count from file size (YUV420 8-bit)
        frame_bytes = self.width * self.height * 3 // 2
        n_frames = os.path.getsize(path) // frame_bytes
        t0 = int(self.rng.integers(0, max(n_frames - t + 1, 1)))
        r = self._reader_cls(path, self.width, self.height, skip_frame=t0)
        frames = []
        for _ in range(t):
            y, uv = r.read_one_frame()
            if y is None:
                if not frames:
                    raise ValueError(
                        f"{path}: no complete frame at {self.width}x"
                        f"{self.height} (truncated file or wrong --width/"
                        "--height)")
                frames.append(frames[-1])
            else:
                frames.append(ycbcr420_to_rgb(y, uv).transpose(1, 2, 0))
        r.close()
        return frames

    def next_sequences(self, n, t):
        c = self.crop
        out = []
        for _ in range(n):
            path = self.files[int(self.rng.integers(len(self.files)))]
            frames = self._read_frames(path, t)
            h, w, _ = frames[0].shape
            y = int(self.rng.integers(0, max(h - c, 1)))
            x = int(self.rng.integers(0, max(w - c, 1)))
            out.append(np.stack([f[y:y + c, x:x + c] for f in frames]))
        return np.stack(out)

    def next_batch(self, n):
        seq = self.next_sequences(n, 2)
        return seq[:, 0], seq[:, 1]


def main():
    args = parse_args()

    if args.skip_if_done:
        done = f"{args.out}_step{args.steps}.npz"
        if os.path.exists(done):
            print(f"{done} exists; --skip-if-done -> nothing to do")
            return

    # must run before first jax use: the deployment sitecustomize registers
    # the TPU backend at interpreter start and the env var alone is ignored
    from lssvc_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()

    # Wedge diagnostics: the tunneled remote compile can block silently
    # (observed round-4/5: >25 min, zero CPU, epoll-idle).  Dump all
    # thread stacks every 10 min so the orchestrator log shows WHERE a
    # stalled stage is stuck instead of an unexplained cap kill.
    import faulthandler

    faulthandler.enable()
    faulthandler.dump_traceback_later(600, repeat=True)

    # persistent compile cache: the staged RD recipe launches train.py once
    # per (stage, lambda); without the cache every invocation recompiles
    # its train-step graph from scratch (~7 min fixed overhead per
    # invocation on the tunneled chip, ~1 h on CPU)
    from lssvc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from lssvc_tpu.checkpoint import (load_params, load_train_state,
                                      read_ckpt_meta, save_params,
                                      save_train_state)
    from lssvc_tpu.models.init import init_intra_ss, init_lssvc
    from lssvc_tpu.parallel.mesh import make_mesh
    from lssvc_tpu.parallel.train import (make_sharded_train_scan,
                                          make_sharded_train_step)
    from lssvc_tpu.utils.resize import imresize

    # reference-style staged recipe presets (`dmc_net.py:283-350`): MV
    # stage first (motion subnets only), then full single-frame RD, then
    # cascaded multi-frame fine-tuning
    if args.stage == "spynet":
        args.loss, args.freeze = "spynet", None
    elif args.stage == "mv":
        # warp loss: distortion on the motion-compensated prediction — the
        # recon path is frozen at init in this stage and its MSE is noise
        args.loss, args.freeze = "warp", "other"
    elif args.stage == "full":
        args.loss, args.freeze = "pair", None
    elif args.stage == "cascade":
        args.loss, args.freeze = "cascade", None

    # training compute precision (default 'high': f32 activations with
    # 3-pass bf16 matmuls — near-fp32 gradients at ~2x the step rate of
    # the exact 6-pass mode; params/optimizer state stay f32 regardless)
    from lssvc_tpu.ops import set_precision_mode

    set_precision_mode(args.precision)

    n_dev = len(jax.devices())
    batch = args.batch_per_device * n_dev
    crop = args.crop
    assert crop % 128 == 0, "EL crop must be divisible by 64*ratio (=128)"

    if args.resume:
        params, _ = load_params(args.resume)
        print(f"resumed from {args.resume}")
    elif args.loss == "intra":
        params = init_intra_ss(seed=args.seed)
    else:
        params = init_lssvc(seed=args.seed)

    if args.lr_decay_steps > 0:
        lr = optax.cosine_decay_schedule(args.lr, args.lr_decay_steps,
                                         alpha=0.01)
    else:
        lr = args.lr
    optimizer = optax.adam(lr)
    if args.freeze:
        # reference-style selective freeze (`dmc_net.py:283-290`): zero
        # updates for one partition (canonical list in models/base.py)
        from lssvc_tpu.models.base import label_params

        labels = label_params(params)
        optimizer = optax.multi_transform(
            {"prediction": (optax.set_to_zero()
                            if args.freeze == "prediction" else optax.adam(lr)),
             "other": (optax.set_to_zero()
                       if args.freeze == "other" else optax.adam(lr))},
            labels)
    opt_state = optimizer.init(params)

    # full-state resume: a sibling .state.npz (written at every save)
    # restores Adam moments + the LR-schedule position + the step counter;
    # without it a crash-resume restarts the cosine schedule at full LR
    # with zeroed moments and renumbers checkpoints from 1.
    #
    # Same-stage vs cross-stage is decided by the state file's out_tag
    # (the --out prefix of the run that wrote it): only a tag match is a
    # crash resume.  A different tag — every stage transition in the RD
    # recipe — gets a fresh optimizer and step 0.  All video stages share
    # the optimizer STRUCTURE, so the old structure-mismatch-exception
    # heuristic silently restored a stale step across stages and a later
    # stage with fewer --steps ran zero iterations (the round-3 RD
    # deadlock).  Legacy state files without a tag fall back to the
    # step >= --steps heuristic.
    step0 = 0
    if args.resume:
        state_path = (args.resume if args.resume.endswith(".state.npz")
                      else args.resume[:-len(".npz")] + ".state.npz")
        if os.path.exists(state_path):
            meta = read_ckpt_meta(state_path)
            tag = str(meta.get("out_tag", ""))
            saved_step = int(meta.get("step", 0))
            policy = resume_policy(tag, saved_step, args.out, args.steps)
            if policy == "stage":
                print(f"state {state_path} (stage '{tag or 'untagged'}', "
                      f"step {saved_step}) is a cross-stage handoff: "
                      f"params only, fresh optimizer, step 0")
            else:
                try:
                    params, opt_state, step0 = load_train_state(state_path,
                                                                opt_state)
                    print(f"restored optimizer state + step {step0} "
                          f"from {state_path}")
                except Exception as e:  # structure mismatch
                    print(f"state restore failed ({e}); params-only resume")
        else:
            print("params-only resume (fresh optimizer state)")

    mesh = make_mesh()
    scan_k = max(args.scan_steps, 1)
    # Warm cascade chains train ONLY the steady-state (features-present)
    # P configuration; training exclusively on them starves the
    # feature=None first-P path that every GOP's first P-frame runs
    # (measured: 1200 warm-only steps regressed first-P 18.9 -> 9.9 dB
    # while steady-state improved).  So warm runs ALTERNATE chunk-wise
    # with plain short chains: even chunks = warm steady-state steps,
    # odd chunks = first-P steps on the same batches truncated to the
    # gradient-capped length.  Two executables, both compile-cache-
    # friendly (the truncated chain IS the old T=cap graph).
    alt_fn = None
    if scan_k > 1:
        scan_fn = make_sharded_train_scan(mesh, optimizer, args.lmbda,
                                          shape_hr=(crop, crop),
                                          loss=args.loss,
                                          cascade_warm=args.cascade_warm)
        if args.loss == "cascade" and args.cascade_warm > 0:
            alt_fn = make_sharded_train_scan(mesh, optimizer, args.lmbda,
                                             shape_hr=(crop, crop),
                                             loss=args.loss, cascade_warm=0)
    else:
        step_fn = make_sharded_train_step(mesh, optimizer, args.lmbda,
                                          shape_hr=(crop, crop),
                                          loss=args.loss,
                                          cascade_warm=args.cascade_warm)
        if args.loss == "cascade" and args.cascade_warm > 0:
            alt_step_fn = make_sharded_train_step(mesh, optimizer,
                                                  args.lmbda,
                                                  shape_hr=(crop, crop),
                                                  loss=args.loss,
                                                  cascade_warm=0)

    if args.data == "synthetic":
        data = SyntheticPairs(crop, args.seed)
    else:
        data = YUVPairs(args.data, args.width, args.height, crop, args.seed)

    def downsample_bl(x_el_j):
        """BL inputs: MATLAB-bicubic downsample (same as the eval
        pipeline); handles (..., H, W, 3) by flattening leading dims."""
        lead = x_el_j.shape[:-3]
        flat = x_el_j.reshape((-1,) + x_el_j.shape[-3:])
        bl = jnp.clip(imresize(jnp.transpose(flat, (0, 3, 1, 2)),
                               scale=0.5), 0, 1).transpose(0, 2, 3, 1)
        return bl.reshape(lead + bl.shape[1:])

    def host_batch(nb):
        """Build one batch of nb items on the device (no lmbda key).
        Returns (batch_dict, frames_per_item)."""
        if args.loss == "cascade":
            seq = jnp.asarray(data.next_sequences(nb, args.frames))
            return {"x_bl": downsample_bl(seq), "x_el": seq}, args.frames - 1
        if args.loss == "intra":
            _, x_el = data.next_batch(nb)
            x_el_j = jnp.asarray(x_el)
            return {"x_bl": downsample_bl(x_el_j), "x_el": x_el_j}, 1
        ref_el, x_el = data.next_batch(nb)
        x_el_j = jnp.asarray(x_el)
        ref_el_j = jnp.asarray(ref_el)
        return {"x_bl": downsample_bl(x_el_j), "x_el": x_el_j,
                "ref_bl": downsample_bl(ref_el_j),
                "ref_el": ref_el_j}, 1

    last = {"step": 0, "t": time.time()}

    def log(step, metrics, fpi):
        # watchdog re-arm: stack dumps fire only after 10 silent minutes
        # (first-compile wait or a genuine stall), not on healthy cadence
        faulthandler.dump_traceback_later(600, repeat=True)
        m = {k: float(v) for k, v in metrics.items()}
        now = time.time()
        # incremental rate since the previous log line (the cumulative rate
        # is dominated by compile time for most short runs)
        rate = (step - last["step"]) * batch * fpi / (now - last["t"])
        last["step"], last["t"] = step, now
        aux = f" aux={m['aux']:.3f}" if "aux" in m else ""
        print(f"step {step}: loss={m['loss']:.4f} bpp={m['bpp']:.4f} "
              f"mse_el={m['mse_el']:.6f}{aux} ({rate:.2f} frames/s)",
              flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def save_ckpt(path, params, opt_state, label):
        if args.loss == "intra":
            # exact quantile refit: real-bitstream CDF tables come from the
            # quantiles, and the aux SGD is far from converged at these
            # step counts (measured: aux ~1e4 after 400 steps -> streams
            # cost several x the estimated bpp)
            from lssvc_tpu.entropy.models import refit_quantiles

            saved = refit_quantiles(params)
        else:
            saved = params
        # state sibling FIRST, gate file (.npz) LAST: orchestrators treat
        # the .npz as the stage-done marker, so it must not appear until
        # everything is on disk (observed: a wedged axon transfer during
        # the state fetch left a .npz with no .state.npz and a process
        # that never exited)
        save_train_state(path[:-len(".npz")] + ".state.npz", params,
                         opt_state, label, out_tag=args.out)
        save_params(path, saved, metadata={"step": label})
        print(f"saved {path}")

    t0 = time.time()
    lm = jnp.float32(args.lmbda)
    if scan_k > 1:
        # chained path: one device program per scan_k optimizer steps.
        # Batches for all scan_k steps are drawn in ONE generator call
        # (leading dim scan_k*batch) and reshaped to (scan_k, batch, ...),
        # so the host cost is amortized too.
        step = step0
        chunk = 0
        while step < args.steps:
            bd, fpi = host_batch(scan_k * batch)
            bd = {k: v.reshape((scan_k, batch) + v.shape[1:])
                  for k, v in bd.items()}
            if alt_fn is not None and chunk % 2 == 1:
                # first-P chunk: truncate to the gradient-capped chain
                gf = args.frames - args.cascade_warm
                bd = {k: v[:, :, :gf] for k, v in bd.items()}
                params, opt_state, ms = alt_fn(params, opt_state, bd, lm)
            else:
                params, opt_state, ms = scan_fn(params, opt_state, bd, lm)
            chunk += 1
            step += scan_k
            # the chunk may overshoot --steps; label the final checkpoint
            # with the requested step count so downstream paths match
            label = min(step, args.steps)
            if step % args.log_every < scan_k:
                log(step, {k: v[-1] for k, v in ms.items()}, fpi)
            if step % args.save_every < scan_k or step >= args.steps:
                # checkpoint label and stored step are both clamped: a
                # resume from this file must not start beyond the step
                # count it was saved under
                save_ckpt(f"{args.out}_step{label}.npz", params, opt_state,
                          label)
    else:
        for step in range(step0 + 1, args.steps + 1):
            batch_dict, fpi = host_batch(batch)
            # traced scalar: lambda sweeps share one compiled executable
            batch_dict["lmbda"] = lm
            fn = step_fn
            if args.loss == "cascade" and args.cascade_warm > 0 \
                    and step % 2 == 0:
                gf = args.frames - args.cascade_warm
                batch_dict = {k: (v[:, :gf] if k != "lmbda" else v)
                              for k, v in batch_dict.items()}
                fn = alt_step_fn
            params, opt_state, metrics = fn(params, opt_state, batch_dict)
            if step % args.log_every == 0:
                log(step, metrics, fpi)
            if step % args.save_every == 0 or step == args.steps:
                save_ckpt(f"{args.out}_step{step}.npz", params, opt_state,
                          step)

    # invariant for orchestrators (tools/rd_experiment.py gates stages on
    # this file): train.py exiting 0 means {out}_step{steps}.npz exists —
    # even if the loop ran zero iterations (resume at step >= --steps)
    final = f"{args.out}_step{args.steps}.npz"
    if not os.path.exists(final):
        save_ckpt(final, params, opt_state, args.steps)


if __name__ == "__main__":
    main()
