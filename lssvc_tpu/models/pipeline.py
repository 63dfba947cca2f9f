"""Pipelined two-layer sequence encoder: host rANS overlapped with device
compute.

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
    bl_planes, bl_dpb = ds.encode_device(bl.params, x_bl,
                                         dpb["ref_frame_bl"],
                                         dpb["ref_feature_bl"])

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
    `encode_decode_extend` loop (same planes, same coders) and decode with
    the standard `decompress` path.
    """
    import jax

    n = len(bl_paths)
    assert len(el_paths) == n
    with ThreadPoolExecutor(max_workers=1) as pool:  # in-order host coding
        futures = []
        for t in range(n):
            bl_planes, el_planes, dpb = _frame_device(
                model, frames_bl[t], frames_el[t], dpb)
            # pace to ONE frame in flight: the device admits only ~8
            # outstanding programs at full speed (docs/PERFORMANCE.md), and
            # a frame is ~12 — enqueueing the whole sequence degrades the
            # device ~2x and was measured SLOWER than sequential.  Blocking
            # here leaves the worker's host rANS of frame t-1/t overlapped
            # with frame t+1's enqueue + execution.  Plane transfers start
            # asynchronously from the main thread so the worker's
            # np.asarray finds data already host-resident.
            for leaf in jax.tree.leaves((bl_planes, el_planes)):
                leaf.copy_to_host_async()
            jax.block_until_ready(dpb["ref_frame_el"])
            futures.append(pool.submit(_host_code_frame, model, bl_planes,
                                       el_planes, bl_paths[t], el_paths[t]))
        bits = [f.result() for f in futures]
    return dpb, bits
