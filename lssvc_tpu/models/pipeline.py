"""Pipelined two-layer sequence encoder + decoder: host rANS overlapped
with device compute.

The sequential real-bitstream path (`LSSVCExtend.encode_decode_extend`) is a
strict device -> host-rANS-encode -> host-rANS-decode -> device chain per
frame, so the chip idles during every entropy-coding step (the reference has
the same structure, plus a GPU->CPU `.tolist()` per tensor —
`video_entropy_models.py:232-244`).

This encoder removes the host from the critical path:

  device, frame t:   closed-loop staged encode (symbol planes + the
                     decoder-exact DPB, see dmc_stream.py docstring)
  host (worker thread, overlapped): rANS-encode frame t's planes -> .bin
  device, frame t+1: starts immediately from the device-resident DPB

Because the staged encoder derives every index/means plane from the
decoder's own jitted executables, the DPB it hands to frame t+1 is
bit-identical to what the decoder will reconstruct from the stream — no
drift, and no verification decode on the critical path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from ..utils.stream import encode_p, filesize
from . import dmc_stream as ds
from . import lssvc_stream as ls


def _frame_device(model, x_bl, x_el, dpb):
    """All device work for one two-layer frame.  Returns
    (bl_planes, el_planes, next_dpb); nothing crosses to the host."""
    bl = model.base_layer_model
    bl_planes, bl_dpb = ds.encode_device(
        bl.params, x_bl, dpb["ref_frame_bl"], dpb["ref_feature_bl"],
        # profiled decoders derive contexts via the split executables;
        # the encoder must run the SAME ones (closed-loop contract)
        split_contexts=getattr(bl, "profile_decoding", False))

    texture, mv_bl_hat, y_bl_hat = ls._depad(
        {"texture": bl_dpb["ref_feature_bl"],
         "y_hat_bl": bl_dpb["y_hat_bl"],
         "mv_hat_bl": bl_dpb["mv_hat_bl"]}, model.pad_size)
    el_planes, el_dpb = ls.encode_device(
        model.params, x_el, dpb["ref_frame_el"], dpb["ref_feature_el"],
        texture, mv_bl_hat, y_bl_hat, model.shape_hr, model.scale_factor)

    next_dpb = {
        "ref_frame_bl": bl_dpb["ref_frame_bl"],
        "ref_feature_bl": bl_dpb["ref_feature_bl"],
        "ref_frame_el": el_dpb["ref_frame_el"],
        "ref_feature_el": el_dpb["ref_feature_el"],
    }
    return bl_planes, el_planes, next_dpb


def _host_code_frame(model, bl_planes, el_planes, bl_path, el_path):
    """Worker-thread half: rANS-encode both layers' planes and write the
    container files.  np.asarray inside write_planes blocks until the device
    values resolve — on the worker, while the main thread dispatches the
    next frame."""
    encode_p(ds.write_planes(model.base_layer_model._coder, bl_planes),
             bl_path)
    encode_p(ls.write_planes(model._coder, el_planes), el_path)
    return filesize(bl_path) * 8, filesize(el_path) * 8


def encode_sequence(model, frames_bl, frames_el, dpb, bl_paths, el_paths):
    """Encode a run of P-frames with host entropy coding overlapped.

    model: an updated LSSVCExtend (update(force=True) called).
    frames_bl/frames_el: per-frame NHWC arrays (lists or leading-axis).
    dpb: initial decoded-picture buffer (e.g. from the I-frame).
    Returns (final dpb, [(bits_bl, bits_el), ...]).

    Streams are byte-identical to the sequential
    `encode_decode_extend` loop under runner semantics (same planes, same
    coders, same inter-frame DPB clamp) and decode with the standard
    `decompress` path driven by the clamping drivers (runner, decode.py,
    decode_sequence).
    """
    n = len(bl_paths)
    assert len(el_paths) == n
    with ThreadPoolExecutor(max_workers=1) as pool:  # in-order host coding
        futures = []
        for t in range(n):
            dpb, fut = submit_p_frame(model, frames_bl[t], frames_el[t],
                                      dpb, bl_paths[t], el_paths[t], pool)
            futures.append(fut)
        bits = [f.result() for f in futures]
    return dpb, bits


def submit_p_frame(model, x_bl, x_el, dpb, bl_path, el_path, pool):
    """One paced pipelined P-frame — THE shared per-frame submit block for
    every encode driver (encode_sequence here, harness.serving.encode_gop):
    device encode, runner-parity inter-frame DPB clamp (reference
    `test.py:249-250`), async plane prefetch, one-frame-in-flight pacing,
    host rANS submitted to `pool`.  Returns (clamped dpb, bits-future).

    Pacing rationale: the device admits only ~8 outstanding programs at
    full speed (docs/PERFORMANCE.md) and a frame is ~12 — enqueueing a
    whole sequence degrades the device ~2x and measured SLOWER than
    sequential.  Blocking here leaves the worker's host rANS of frame
    t-1/t overlapped with frame t+1's enqueue + execution; plane transfers
    start asynchronously from the main thread so the worker's np.asarray
    finds data already host-resident."""
    import jax
    import jax.numpy as jnp

    bl_planes, el_planes, dpb = _frame_device(model, x_bl, x_el, dpb)
    dpb = dict(dpb)
    dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
    dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)
    for leaf in jax.tree.leaves((bl_planes, el_planes)):
        leaf.copy_to_host_async()
    jax.block_until_ready(dpb["ref_frame_el"])
    fut = pool.submit(_host_code_frame, model, bl_planes, el_planes,
                      bl_path, el_path)
    return dpb, fut


# ---------------------------------------------------------------------------
# Overlapped decode

def decode_frame_overlapped(model, string_bl, string_el, h_bl, w_bl,
                            h_el, w_el, dpb, pool):
    """Two-layer P-frame decode with host rANS overlapped across layers.

    Bit-identical to `DMCExtend.decompress` + `LSSVCExtend.decompress`
    (same jitted stages, same per-stream plane order — reference contract
    `dmc_net_extend.py:106-147` / `LSSVC_net_extend.py:88-142`), but
    restructured so the host never idles while the device runs a stage
    whose successor plane it could already be entropy-decoding:

      * factorized planes (BL z, EL mv_z/z) have static channel indexes —
        they decode while the big context stages execute;
      * the BL y plane and the EL mv_y plane live in DIFFERENT streams, so
        they rANS-decode on two host threads concurrently (the ctypes
        calls drop the GIL);
      * device stages are dispatched eagerly (XLA async dispatch) and only
        index-plane transfers synchronize.

    Returns {"dpb": ..., "bl_dpb": ..., "mv_hat": ..., "context": c1}.
    The caller chains frames and applies the harness's inter-frame DPB
    clamp (decode_sequence does; cf. runner.py / decode.py).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..ops import pad_nhwc
    from ..utils.stream import get_downsampled_shape
    from . import lssvc_stream as lstream

    bl = model.base_layer_model
    params_bl, params_el = bl.params, model.params
    coder_bl, coder_el = bl._coder, model._coder
    dec_bl = coder_bl.open_stream(string_bl)
    dec_el = coder_el.open_stream(string_el)
    zh_b, zw_b = get_downsampled_shape(h_bl, w_bl, 64)
    zh_e, zw_e = get_downsampled_shape(h_el, w_el, 64)
    pad = model.pad_size
    shape_hr = model.shape_hr

    # --- BL head
    mv_z = dec_bl.decode_factorized((1, zh_b, zw_b, bl.channel_N),
                                    coder_bl.z_mv_table)
    mv_idx, mv_means = ds._dec_stage_mv_prior(params_bl, jnp.asarray(mv_z))
    mv_idx.copy_to_host_async()
    # EL head plane decodes on the worker meanwhile (independent stream)
    el_mvz_fut = pool.submit(dec_el.decode_factorized,
                             (1, zh_e, zw_e, model.channel_mv),
                             coder_el.z_mv_table)
    mv_y_q = dec_bl.decode_gaussian(np.asarray(mv_idx))
    mv_hat_bl, c1b, c2b, c3b = ds._dec_stage_contexts(
        params_bl, jnp.asarray(mv_y_q), mv_means,
        dpb["ref_frame_bl"], dpb["ref_feature_bl"])
    # BL z has static indexes: decode while the context stage executes
    z = dec_bl.decode_factorized((1, zh_b, zw_b, bl.channel_N),
                                 coder_bl.z_table)
    y_idx, y_means = ds._dec_stage_y_prior(params_bl, jnp.asarray(z),
                                           c1b, c2b, c3b)
    y_idx.copy_to_host_async()

    # --- EL motion setup (needs only BL mv_hat; dispatched before BL y)
    mv_bl_hat_p = pad_nhwc(mv_hat_bl, pad)
    mv_ctx, mv_ctx_prior = lstream._dec_mv_setup_jit(
        params_el, mv_bl_hat_p, shape_hr, model.scale_factor)
    mv_z_el = el_mvz_fut.result()
    el_mv_idx, el_mv_means = lstream._dec_mv_prior(
        params_el, jnp.asarray(mv_z_el), mv_ctx_prior)
    el_mv_idx.copy_to_host_async()

    # --- the two big gaussian planes decode concurrently (separate streams)
    bl_y_fut = pool.submit(dec_bl.decode_gaussian, np.asarray(y_idx))
    el_mv_y = dec_el.decode_gaussian(np.asarray(el_mv_idx))

    y_q = bl_y_fut.result()
    recon_bl, feature_bl, y_hat_bl = ds._dec_stage_recon(
        params_bl, jnp.asarray(y_q), y_means, c1b, c2b, c3b)
    recon_bl_dpb = {"ref_frame_bl": recon_bl, "ref_feature_bl": feature_bl,
                    "y_hat_bl": y_hat_bl, "mv_hat_bl": mv_hat_bl}

    texture = pad_nhwc(feature_bl, pad)
    mv_hat_el, c1, c2, c3, _ = lstream._dec_contexts_jit(
        params_el, jnp.asarray(el_mv_y), el_mv_means, mv_ctx, texture,
        dpb["ref_frame_el"], dpb["ref_feature_el"], shape_hr)
    # EL z: static indexes — decodes while the EL context stage executes
    z_el = dec_el.decode_factorized(
        (1, zh_e, zw_e, lstream.EL_Z_CHANNELS), coder_el.z_table)
    y_bl_hat_p = pad_nhwc(y_hat_bl, tuple(int(v / 16) for v in pad))
    common = lstream._dec_common_params_jit(params_el, jnp.asarray(z_el), c3,
                                            y_bl_hat_p, shape_hr)

    half = common.shape[-1] // 2
    means_4 = jnp.stack(jnp.split(common[..., half:], 4, axis=-1))
    idx = lstream._dec_pass0_scales(params_el, common)
    y_hat = None
    for pass_idx in range(4):
        y_q_r = jnp.asarray(dec_el.decode_gaussian(np.asarray(idx)))
        y_hat, idx, means_4 = lstream._dec_pass_update_jit(
            params_el, pass_idx, y_q_r, y_hat, common, means_4)
    recon_el, feature_el = lstream._dec_recon(params_el, y_hat, c1, c2, c3)

    return {
        "dpb": {
            "ref_frame_bl": recon_bl_dpb["ref_frame_bl"],
            "ref_feature_bl": recon_bl_dpb["ref_feature_bl"],
            "ref_frame_el": recon_el,
            "ref_feature_el": feature_el,
        },
        "bl_dpb": recon_bl_dpb,
        "mv_hat": mv_hat_el,
        "context": c1,
    }


def decode_sequence(model, bl_paths, el_paths, dpb, h_bl, w_bl, h_el, w_el):
    """Decode a run of P-frames with the overlapped frame decoder.

    model: an updated LSSVCExtend.  Returns the final DPB.  Paced one frame
    at a time (the device's full-speed execution window is ~8 programs).
    """
    import jax

    from ..utils.stream import decode_p

    import jax.numpy as jnp

    with ThreadPoolExecutor(max_workers=1) as pool:
        for pb, pe in zip(bl_paths, el_paths):
            out = decode_frame_overlapped(
                model, decode_p(pb), decode_p(pe), h_bl, w_bl, h_el, w_el,
                dpb, pool)
            dpb = dict(out["dpb"])
            # runner-parity inter-frame clamp (reference `test.py:249-250`
            # clamps the DPB in place) — required for bit-consistency with
            # streams encoded by the clamping drivers (runner, serving)
            dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
            dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)
            jax.block_until_ready(dpb["ref_frame_el"])
    return dpb
