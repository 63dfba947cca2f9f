#!/usr/bin/env python
"""End-to-end RD experiment: train per-rate models, evaluate through the
real-bitstream harness, and measure the bf16-vs-fp32 BD-rate delta.

The reference ships NO checkpoints (nothing matching *.pth under
/root/reference), so RD is demonstrated on synthetic video: train
IntraSS + LSSVC at several lambdas, run `test.py`-equivalent evaluation
(write_stream) on a held-out synthetic sequence in fp32 and bf16 serving
modes, and report the RD table + the Bjontegaard delta between the two
precision modes (the round-2 blocked item in ROADMAP.md).

Usage:
  python tools/rd_experiment.py --steps-intra 600 --steps-video 1200 \
      --lambdas 0.003 0.01 0.03 0.09 --out runs/rd
  python tools/rd_experiment.py --quick      # tiny smoke (CPU-able)
  python tools/rd_experiment.py --eval-only  # reuse trained checkpoints
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lssvc_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()  # honor JAX_PLATFORMS=cpu for the in-process eval
                         # (training subprocesses pin themselves)

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/rd")
    p.add_argument("--lambdas", type=float, nargs="+",
                   default=[0.003, 0.01, 0.03, 0.09])
    p.add_argument("--steps-intra", type=int, default=600)
    p.add_argument("--steps-video", type=int, default=1200)
    p.add_argument("--steps-spynet", type=int, default=600,
                   help="photometric SpyNet pretrain steps (shared across "
                        "lambdas; the reference inherits a pretrained "
                        "SpyNet rather than training flow through the "
                        "untrained MV codec)")
    p.add_argument("--base-lmbda", type=float, default=0.01,
                   help="lambda for the shared base video model; per-lambda "
                        "models are short fine-tunes from it (multi-rate "
                        "training trick: the base gets most of the steps)")
    p.add_argument("--steps-base", type=int, default=0,
                   help="full-stage steps for the shared base model "
                        "(0 = legacy per-lambda from-scratch recipe)")
    p.add_argument("--steps-ft", type=int, default=600,
                   help="per-lambda cascade fine-tune steps from the base")
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=12,
                   help="held-out eval sequence length")
    p.add_argument("--gop", type=int, default=6)
    p.add_argument("--eval-size", type=int, default=256)
    p.add_argument("--quick", action="store_true",
                   help="2 lambdas, few steps — smoke run")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--modes", nargs="+", default=["fp32", "bf16"])
    p.add_argument("--report-name", default="rd_report.json",
                   help="report filename under --out (use a different one "
                        "for follow-up mode comparisons, e.g. bf16-vs-int8, "
                        "so the primary report survives)")
    p.add_argument("--stages", choices=["staged", "full"], default="staged",
                   help="'full' = single-stage video training (one compiled "
                        "graph instead of three; the CPU-fallback config)")
    p.add_argument("--estimated", action="store_true",
                   help="evaluate with estimated bpp instead of real "
                        "bitstreams (cheaper compiles; reference README "
                        "asserts estimated ~= real rates)")
    return p.parse_args()


def make_eval_sequence(path, n_frames, size, seed=1234):
    """Held-out synthetic YUV: smooth textures + global motion + a moving
    square (gives the codec edges AND motion to earn bits on)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from train import SyntheticPairs

    from lssvc_tpu.utils.color import rgb_to_ycbcr420
    from lssvc_tpu.utils.io import YUVWriter

    gen = SyntheticPairs(size, seed=seed)
    seq = gen.next_sequences(1, n_frames)[0]  # (T, H, W, 3)
    rng = np.random.default_rng(seed + 1)
    sq = int(size * 0.15)
    x0, y0 = rng.integers(0, size - sq - n_frames * 2, 2)
    color = rng.random(3).astype(np.float32)
    for t in range(n_frames):
        seq[t, y0 + 2 * t:y0 + 2 * t + sq, x0 + 2 * t:x0 + 2 * t + sq] = color
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = YUVWriter(path, size, size)
    for t in range(n_frames):
        y, uv = rgb_to_ycbcr420(seq[t].transpose(2, 0, 1))
        w.write_one_frame(y=y, uv=uv, src_format="420")
    w.close()
    return path


def _run_stage(cmd, attempts=4):
    """Run a training stage, retrying ONLY plausibly-transient failures
    (the remote compile helper can drop mid-run; stages resume from
    their --resume checkpoint, so a retry only repeats the failed
    stage).  Two consecutive failures with the same terminal error line
    are deterministic — abort immediately instead of sleep-retrying
    (round 3: four 120-480s retries of a FileNotFoundError, then an
    outer watchdog relaunch loop, burned the chip for hours)."""
    import subprocess

    # a stage whose weights landed but whose process died afterwards
    # (observed: wedged axon transfer while writing the optimizer-state
    # sibling) must no-op on retry, not retrain
    cmd = list(cmd) + ["--skip-if-done"]
    prev_sig = None
    for i in range(attempts):
        print("+", " ".join(cmd), flush=True)
        # stdout (training progress) streams live; stderr (tracebacks)
        # is captured for the determinism check and echoed on failure
        r = subprocess.run(cmd, stderr=subprocess.PIPE, text=True)
        if r.returncode == 0:
            return
        err = (r.stderr or "").strip()
        if err:
            print(err[-4000:], flush=True)
        lines = [ln for ln in err.splitlines() if ln.strip()]
        sig = (r.returncode, lines[-1] if lines else "")
        if sig == prev_sig:
            raise RuntimeError(
                f"stage failed twice with the same error (deterministic; "
                f"not retrying): {sig[1]!r}\ncmd: {cmd}")
        prev_sig = sig
        wait = 60 * (i + 1)
        print(f"stage failed (rc={r.returncode}); "
              f"retry {i + 1}/{attempts - 1} in {wait}s", flush=True)
        time.sleep(wait)
    raise RuntimeError(f"stage failed after {attempts} attempts: {cmd}")


def _train_cmd():
    py = sys.executable
    train = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "train.py")
    return py, train


def train_base(args, out_dir):
    """Shared lambda-independent stages: SpyNet photometric pretrain, then
    the staged recipe at --base-lmbda.  Per-lambda models fine-tune from
    the returned checkpoint (train_models), so the expensive stages run
    once instead of once per rate point."""
    py, train = _train_cmd()
    lm = str(args.base_lmbda)
    spynet_ckpt = os.path.join(out_dir, f"spynet_step{args.steps_spynet}.npz")
    s_mv = max(args.steps_base // 8, 1)
    s_full = args.steps_base
    s_casc = max(args.steps_base // 2, 1)
    mv_ckpt = os.path.join(out_dir, f"base_mv_step{s_mv}.npz")
    full_ckpt = os.path.join(out_dir, f"base_full_step{s_full}.npz")
    base_ckpt = os.path.join(out_dir, f"base_cascade_step{s_casc}.npz")
    common = ["--crop", str(args.crop), "--batch-per-device", str(args.batch)]
    # each stage is gated on its OWN output (or any later stage's): a
    # relaunch after a mid-pipeline failure must skip completed stages,
    # not retrain the 2-hour full stage (the round-3 watchdog loop)
    if not os.path.exists(spynet_ckpt):
        _run_stage([py, train, "--stage", "spynet",
                    "--steps", str(args.steps_spynet),
                    "--out", os.path.join(out_dir, "spynet"),
                    "--save-every", str(args.steps_spynet)] + common)
    if not any(os.path.exists(p) for p in (mv_ckpt, full_ckpt, base_ckpt)):
        _run_stage([py, train, "--stage", "mv", "--steps", str(s_mv),
                    "--lmbda", lm, "--resume", spynet_ckpt,
                    "--out", os.path.join(out_dir, "base_mv"),
                    "--save-every", str(s_mv)] + common)
    if not any(os.path.exists(p) for p in (full_ckpt, base_ckpt)):
        _run_stage([py, train, "--stage", "full", "--steps", str(s_full),
                    "--lmbda", lm, "--resume", mv_ckpt,
                    "--out", os.path.join(out_dir, "base_full"),
                    "--save-every", str(s_full),
                    "--lr-decay-steps", str(s_full)] + common)
    if not os.path.exists(base_ckpt):
        _run_stage([py, train, "--stage", "cascade", "--frames", "3",
                    "--steps", str(s_casc), "--lmbda", lm,
                    "--resume", full_ckpt,
                    "--out", os.path.join(out_dir, "base_cascade"),
                    "--save-every", str(s_casc),
                    "--lr-decay-steps", str(s_casc)] + common)
    if not os.path.exists(base_ckpt):
        raise RuntimeError(
            f"base cascade stage exited 0 but {base_ckpt} was not written "
            f"(step-accounting bug? check the stage's resume log line)")
    return base_ckpt


def train_models(args, lmbda, out_dir, base_ckpt=None):
    """Train IntraSS then the LSSVC recipe for one rate point.  With
    base_ckpt (shared-base recipe) the video model is a short cascade
    fine-tune; otherwise the legacy from-scratch staged recipe runs."""
    tag = f"l{lmbda:g}".replace(".", "p")
    intra_ckpt = os.path.join(out_dir, f"intra_{tag}_step{args.steps_intra}.npz")
    py, train = _train_cmd()
    run = _run_stage
    if base_ckpt is not None:
        video_ckpt = os.path.join(
            out_dir, f"video_{tag}_ft_step{args.steps_ft}.npz")
    else:
        video_final_steps = args.steps_video
        final_stage = "cascade" if args.stages == "staged" else "full"
        video_ckpt = os.path.join(
            out_dir, f"video_{tag}_{final_stage}_step{video_final_steps}.npz")

    if not os.path.exists(intra_ckpt):
        run([py, train, "--loss", "intra", "--steps", str(args.steps_intra),
             "--lmbda", str(lmbda), "--crop", str(args.crop),
             "--batch-per-device", str(args.batch),
             "--out", os.path.join(out_dir, f"intra_{tag}"),
             "--save-every", str(args.steps_intra),
             "--lr-decay-steps", str(args.steps_intra)])
    if base_ckpt is not None:
        if not os.path.exists(video_ckpt):
            run([py, train, "--stage", "cascade", "--frames", "3",
                 "--steps", str(args.steps_ft),
                 "--lmbda", str(lmbda), "--crop", str(args.crop),
                 "--batch-per-device", str(args.batch),
                 "--resume", base_ckpt,
                 "--out", os.path.join(out_dir, f"video_{tag}_ft"),
                 "--save-every", str(args.steps_ft),
                 "--lr-decay-steps", str(args.steps_ft)])
        return intra_ckpt, video_ckpt
    if not os.path.exists(video_ckpt) and args.stages == "full":
        # single-stage fallback: one compiled train graph total
        run([py, train, "--stage", "full", "--steps", str(video_final_steps),
             "--lmbda", str(lmbda), "--crop", str(args.crop),
             "--batch-per-device", str(args.batch),
             "--out", os.path.join(out_dir, f"video_{tag}_full"),
             "--save-every", str(video_final_steps),
             "--lr-decay-steps", str(video_final_steps)])
    elif not os.path.exists(video_ckpt):
        # stage 1: MV subnets (freeze everything else), short
        s1 = max(args.steps_video // 4, 1)
        run([py, train, "--stage", "mv", "--steps", str(s1),
             "--lmbda", str(lmbda), "--crop", str(args.crop),
             "--batch-per-device", str(args.batch),
             "--out", os.path.join(out_dir, f"video_{tag}_mv"),
             "--save-every", str(s1)])
        # stage 2: full single-frame RD
        s2 = max(args.steps_video // 2, 1)
        run([py, train, "--stage", "full", "--steps", str(s2),
             "--lmbda", str(lmbda), "--crop", str(args.crop),
             "--batch-per-device", str(args.batch),
             "--resume", os.path.join(out_dir, f"video_{tag}_mv_step{s1}.npz"),
             "--out", os.path.join(out_dir, f"video_{tag}_full"),
             "--save-every", str(s2), "--lr-decay-steps", str(s2)])
        # stage 3: cascaded multi-frame fine-tune
        run([py, train, "--stage", "cascade", "--frames", "3",
             "--steps", str(video_final_steps),
             "--lmbda", str(lmbda), "--crop", str(args.crop),
             "--batch-per-device", str(args.batch),
             "--resume", os.path.join(out_dir, f"video_{tag}_full_step{s2}.npz"),
             "--out", os.path.join(out_dir, f"video_{tag}_cascade"),
             "--save-every", str(video_final_steps),
             "--lr-decay-steps", str(video_final_steps)])
    return intra_ckpt, video_ckpt


def evaluate(args, ckpts, yuv_dir, mode, out_dir):
    """Run the evaluation harness (write_stream) for every rate point in
    one precision mode; returns the FL RD points [(bpp, psnr), ...]."""
    import jax

    from lssvc_tpu.harness.results import filter_dict
    from lssvc_tpu.ops import set_precision_mode
    from lssvc_tpu.parallel import scheduler

    # packed width is a trace-time global too: reset it for EVERY mode,
    # or an int8 mode earlier in --modes would leave later fp32/bf16
    # evals silently running in the width-packed domain (mode-order-
    # dependent results)
    from lssvc_tpu.ops.nn import set_packed_width

    set_packed_width(2 if mode == "int8" else 1)
    if mode == "int8":
        # int8 eval: width-packed bf16 base + per-checkpoint calibrated
        # s8 conv sites (the table is built per rate point below, since
        # activation ranges depend on the trained weights)
        set_precision_mode("bf16")
    else:
        set_precision_mode(mode)
    scheduler._MODEL_CACHE.clear()
    # precision mode is a trace-time global, NOT part of jit cache keys;
    # the module-level stage jits would otherwise serve the FIRST mode's
    # executables to the second mode (identical avals), making the
    # bf16-vs-fp32 delta spuriously zero
    jax.clear_caches()
    size = args.eval_size
    points = []
    logs = {"BL": {"SYN": {"eval": {}}}, "EL": {"SYN": {"eval": {}}},
            "FL": {"SYN": {"eval": {}}}}
    for i, (lmbda, (intra_ckpt, video_ckpt)) in enumerate(ckpts.items()):
        if mode == "int8":
            # scales are trace-time constants: re-calibrate AND re-trace
            # per checkpoint, or stale scales would be served from the
            # aval-keyed jit caches
            from lssvc_tpu.checkpoint import load_params
            from lssvc_tpu.harness.calibrate import calibrate_video
            from lssvc_tpu.ops import int8 as q8

            set_precision_mode("bf16")
            vparams, _ = load_params(video_ckpt)
            q8.set_calibration(calibrate_video(
                vparams, size=min(args.eval_size, 256), frames=2))
            set_precision_mode("int8")
            scheduler._MODEL_CACHE.clear()
            jax.clear_caches()
        task = {
            "i_frame_model_path": intra_ckpt,
            "video_model_path": video_ckpt,
            "write_stream": not args.estimated,
            "dataset_path": yuv_dir,
            "video_path": "eval",
            "ds_name": "SYN",
            "ratio": "x2",
            "x1": {"width": size, "height": size},
            "gop": args.gop,
            "frame_num": args.frames,
            "stream_path": os.path.join(out_dir, f"bins_{mode}_{i}"),
            "model_idx": i,
        }
        res_bl, res_el, res_fl = scheduler.run_one(task)
        ckpt_name = os.path.basename(video_ckpt)
        for layer, res in (("BL", res_bl), ("EL", res_el), ("FL", res_fl)):
            logs[layer]["SYN"]["eval"][ckpt_name] = filter_dict(res)
        points.append((res_fl["ave_all_frame_bpp"],
                       res_fl["ave_all_frame_rgb_psnr"]))
        print(f"  {mode} lmbda={lmbda:g}: bpp={points[-1][0]:.4f} "
              f"rgb-psnr={points[-1][1]:.2f}", flush=True)
    # result JSONs in the reference {ratio}_{BL,EL,FL}.json nesting
    json_dir = os.path.join(out_dir, f"json_{mode}")
    os.makedirs(json_dir, exist_ok=True)
    for layer, log in logs.items():
        with open(os.path.join(json_dir, f"x2_{layer}.json"), "w") as f:
            json.dump(log, f, indent=2)
    return points


def main():
    args = parse_args()
    if args.quick:
        args.lambdas = [0.003, 0.03]
        args.steps_intra = 30
        args.steps_video = 40
        args.frames = 4
        args.gop = 2
        args.crop = 128
        args.eval_size = 128

    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)
    yuv_dir = os.path.join(out_dir, "eval_ds")
    make_eval_sequence(os.path.join(yuv_dir, "eval", "x1.yuv"),
                       args.frames, args.eval_size)

    ckpts = {}
    base_ckpt = None
    if args.steps_base > 0 and not args.eval_only:
        t0 = time.time()
        base_ckpt = train_base(args, out_dir)
        print(f"trained shared base in {time.time() - t0:.0f}s", flush=True)
    for lmbda in args.lambdas:
        if args.eval_only:
            tag = f"l{lmbda:g}".replace(".", "p")
            if args.steps_base > 0:
                video = f"video_{tag}_ft_step{args.steps_ft}.npz"
            else:
                stage = "cascade" if args.stages == "staged" else "full"
                video = f"video_{tag}_{stage}_step{args.steps_video}.npz"
            ckpts[lmbda] = (
                os.path.join(out_dir,
                             f"intra_{tag}_step{args.steps_intra}.npz"),
                os.path.join(out_dir, video))
        else:
            t0 = time.time()
            ckpts[lmbda] = train_models(args, lmbda, out_dir, base_ckpt)
            print(f"trained lmbda={lmbda:g} in {time.time() - t0:.0f}s",
                  flush=True)

    curves = {}
    for mode in args.modes:
        print(f"=== evaluating mode {mode}", flush=True)
        curves[mode] = evaluate(args, ckpts, yuv_dir, mode, out_dir)

    report = {"lambdas": args.lambdas, "curves": curves}
    # write the curves-only report BEFORE the BD fit: bd_rate raises
    # ValueError on non-overlapping PSNR ranges (possible for degenerate
    # curves), and hours of eval must not be lost to the summary statistic
    report_path = os.path.join(out_dir, args.report_name)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    if len(args.modes) == 2 and all(len(c) >= 4 for c in curves.values()):
        from lssvc_tpu.harness.bd_rate import bd_rate

        a, b = (curves[m] for m in args.modes)
        try:
            delta = bd_rate([p[0] for p in a], [p[1] for p in a],
                            [p[0] for p in b], [p[1] for p in b])
        except ValueError as e:
            print(f"BD-rate fit failed ({e}); curves-only report kept")
        else:
            report["bd_rate_delta_pct"] = delta
            print(f"BD-rate {args.modes[1]} vs {args.modes[0]}: {delta:+.3f}%")
            with open(report_path, "w") as f:
                json.dump(report, f, indent=2)
    print(f"report -> {report_path}")


if __name__ == "__main__":
    main()
