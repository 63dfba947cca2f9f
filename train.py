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
  python train.py --data /data/vimeo --list train.txt --resume ckpt.npz
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
    return p.parse_args()


class SyntheticPairs:
    """Correlated frame pairs: translated noise textures (smoke training)."""

    def __init__(self, crop, seed=0):
        self.crop = crop
        self.rng = np.random.default_rng(seed)

    def next_batch(self, n):
        c = self.crop
        base = self.rng.random((n, c + 8, c + 8, 3)).astype(np.float32)
        ref = base[:, 4:4 + c, 4:4 + c]
        dx, dy = self.rng.integers(-3, 4, 2)
        cur = base[:, 4 + dy:4 + dy + c, 4 + dx:4 + dx + c]
        return ref, np.clip(cur + 0.01 * self.rng.standard_normal(cur.shape),
                            0, 1).astype(np.float32)


class YUVPairs:
    """Random (ref, cur) frame pairs with aligned random crops from a
    directory of .yuv files."""

    def __init__(self, root, width, height, crop, seed=0):
        from lssvc_tpu.utils.io import YUVReader

        self.files = sorted(glob.glob(os.path.join(root, "**", "*.yuv"),
                                      recursive=True))
        if not self.files:
            raise FileNotFoundError(f"no .yuv under {root}")
        self.width = width
        self.height = height
        self.crop = crop
        self.rng = np.random.default_rng(seed)
        self._reader_cls = YUVReader

    def _read_frame_pair(self, path):
        from lssvc_tpu.utils.color import ycbcr420_to_rgb

        # frame count from file size (YUV420 8-bit)
        frame_bytes = self.width * self.height * 3 // 2
        n_frames = os.path.getsize(path) // frame_bytes
        t = int(self.rng.integers(0, max(n_frames - 1, 1)))
        r = self._reader_cls(path, self.width, self.height, skip_frame=t)
        y0, uv0 = r.read_one_frame()
        y1, uv1 = r.read_one_frame()
        r.close()
        if y1 is None:
            y1, uv1 = y0, uv0
        return (ycbcr420_to_rgb(y0, uv0).transpose(1, 2, 0),
                ycbcr420_to_rgb(y1, uv1).transpose(1, 2, 0))

    def next_batch(self, n):
        c = self.crop
        refs, curs = [], []
        for _ in range(n):
            path = self.files[int(self.rng.integers(len(self.files)))]
            f0, f1 = self._read_frame_pair(path)
            h, w, _ = f0.shape
            y = int(self.rng.integers(0, max(h - c, 1)))
            x = int(self.rng.integers(0, max(w - c, 1)))
            refs.append(f0[y:y + c, x:x + c])
            curs.append(f1[y:y + c, x:x + c])
        return np.stack(refs), np.stack(curs)


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from lssvc_tpu.checkpoint import load_params, save_params
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.parallel.mesh import make_mesh
    from lssvc_tpu.parallel.train import make_sharded_train_step
    from lssvc_tpu.utils.resize import imresize

    n_dev = len(jax.devices())
    batch = args.batch_per_device * n_dev
    crop = args.crop
    assert crop % 128 == 0, "EL crop must be divisible by 64*ratio (=128)"

    if args.resume:
        params, _ = load_params(args.resume)
        print(f"resumed from {args.resume}")
    else:
        params = init_lssvc(seed=args.seed)

    optimizer = optax.adam(args.lr)
    if args.freeze:
        # reference-style selective freeze (`dmc_net.py:283-290`): zero
        # updates for one partition
        inter = ("mv_encoder", "mv_decoder", "mv_prior_encoder",
                 "mv_prior_decoder", "bit_estimator_z_mv", "optic_flow")
        labels = {k: ("prediction" if any(m in k for m in inter) else "other")
                  for k in params}
        optimizer = optax.multi_transform(
            {"prediction": (optax.set_to_zero()
                            if args.freeze == "prediction" else optax.adam(args.lr)),
             "other": (optax.set_to_zero()
                       if args.freeze == "other" else optax.adam(args.lr))},
            labels)
    opt_state = optimizer.init(params)

    mesh = make_mesh()
    step_fn = make_sharded_train_step(mesh, optimizer, args.lmbda,
                                      shape_hr=(crop, crop))

    if args.data == "synthetic":
        data = SyntheticPairs(crop, args.seed)
    else:
        data = YUVPairs(args.data, args.width, args.height, crop, args.seed)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        ref_el, x_el = data.next_batch(batch)
        x_el_j = jnp.asarray(x_el)
        ref_el_j = jnp.asarray(ref_el)
        # BL inputs: MATLAB-bicubic downsample (same as the eval pipeline)
        x_bl = jnp.clip(imresize(jnp.transpose(x_el_j, (0, 3, 1, 2)),
                                 scale=0.5), 0, 1).transpose(0, 2, 3, 1)
        ref_bl = jnp.clip(imresize(jnp.transpose(ref_el_j, (0, 3, 1, 2)),
                                   scale=0.5), 0, 1).transpose(0, 2, 3, 1)
        batch_dict = {"x_bl": x_bl, "x_el": x_el_j,
                      "ref_bl": ref_bl, "ref_el": ref_el_j}
        params, opt_state, metrics = step_fn(params, opt_state, batch_dict)
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = step * batch / (time.time() - t0)
            print(f"step {step}: loss={m['loss']:.4f} bpp={m['bpp']:.4f} "
                  f"mse_el={m['mse_el']:.6f} ({rate:.2f} frames/s)")
        if step % args.save_every == 0 or step == args.steps:
            path = f"{args.out}_step{step}.npz"
            save_params(path, params, metadata={"step": step})
            print(f"saved {path}")


if __name__ == "__main__":
    main()
