"""Task scheduler for evaluation sweeps.

Replaces the reference's spawn-based CUDA process pool
(`/root/reference/test.py:685-748`) with an in-process scheduler: model
compute is serialized on the accelerator (XLA streams are async already),
while host-side work (YUV I/O, color conversion, metrics) overlaps via a
thread pool.  Models are cached per checkpoint path so a sweep over
(dataset x ratio x sequence) loads each network once, not once per task.
"""

from __future__ import annotations

import threading
import traceback
from concurrent.futures import ThreadPoolExecutor

_MODEL_CACHE: dict = {}
_CACHE_LOCK = threading.Lock()
# Cached models carry mutable per-task state (set_scale_information's
# scale/shape, the rANS coder buffers, profiling accumulators), so tasks
# sharing a model must serialize — per-model locks keep tasks on DIFFERENT
# models concurrent while preventing one task's frame from coding at
# another task's scale or interleaving symbols into its stream.
_MODEL_LOCKS: dict = {}


def _load_net(cls, path, **kw):
    """torch .pth or native .npz (checkpoint.py) — same loader decode.py
    uses, so models trained in-framework evaluate through test.py too."""
    if path.endswith(".npz"):
        from ..checkpoint import load_params

        params, _ = load_params(path)
        return cls(params, **kw)
    from ..convert import load_torch_checkpoint

    return cls.from_torch_state_dict(load_torch_checkpoint(path), **kw)


def _get_models(task):
    """Load (i_frame_net, video_net) with caching by checkpoint paths."""
    from ..models import IntraSS
    from ..models.lssvc import LSSVCExtend

    key = (task["i_frame_model_path"],
           None if task.get("force_intra") else task["video_model_path"])
    with _CACHE_LOCK:
        if key not in _MODEL_CACHE:
            i_frame_net = _load_net(IntraSS, task["i_frame_model_path"])
            video_net = None
            if not task.get("force_intra"):
                video_net = _load_net(LSSVCExtend, task["video_model_path"])
            if task.get("write_stream"):
                i_frame_net.update(force=True)
                if video_net is not None:
                    video_net.update(force=True)
            _MODEL_CACHE[key] = (i_frame_net, video_net)
            _MODEL_LOCKS[key] = threading.Lock()
        return _MODEL_CACHE[key] + (_MODEL_LOCKS.setdefault(
            key, threading.Lock()),)


def run_one(task: dict):
    import os

    from ..harness.runner import run_test

    i_frame_net, video_net, model_lock = _get_models(task)
    task = dict(task)
    sub_dir = task["video_path"]
    task["yuv_path_el"] = os.path.join(task["dataset_path"], sub_dir, "x1.yuv")
    task["gop_size"] = task["gop"]
    task["bin_folder"] = os.path.join(task.get("stream_path", "out_bin"),
                                      sub_dir, str(task.get("model_idx", 0)))
    for key, flag in (("decoded_frame_folder", "decoded_frame_path"),
                      ("decoded_mv_folder", "decoded_mv_path"),
                      ("warp_frame_folder", "warp_frame_path"),
                      ("decoded_context_folder", "decoded_context_path")):
        task[key] = os.path.join(task.get(flag, key), sub_dir,
                                 str(task.get("model_idx", 0)))

    profiling = (task.get("decoding_profiling") and video_net is not None
                 and task.get("write_stream"))
    with model_lock:
        if profiling:
            # per-stage decode wall-clock for BOTH layers (reference: the
            # 14-key BL dict at `dmc_net_extend.py:19-47`, gated by
            # --decoding_profiling; the EL stream path mirrors it with its
            # own stage keys, models/lssvc.py DECODING_STAGES)
            video_net.base_layer_model.profile_decoding = True
            video_net.base_layer_model.reset_decoding_profiling()
            video_net.profile_decoding = True
            video_net.reset_decoding_profiling()

        res_bl, res_el, res_fl = run_test(video_net, i_frame_net, task)
        if profiling:
            res_bl["decoding_profiling"] = \
                video_net.base_layer_model.get_average_decoding_profiling()
            res_el["decoding_profiling"] = \
                video_net.get_average_decoding_profiling()
    name = (f"{os.path.basename(task.get('video_model_path', 'intra'))}"
            f"_{sub_dir}")
    for res in (res_bl, res_el, res_fl):
        res["name"] = name
        res["ds_name"] = task["ds_name"]
        res["video_path"] = task["video_path"]
        res["ratio"] = task["ratio"]
        res["model_idx"] = task.get("model_idx", 0)
    return res_bl, res_el, res_fl


def run_tasks(tasks, worker_num: int = 1):
    """Run all tasks; device work serializes naturally, `worker_num` only
    bounds host-side concurrency."""
    results = []
    if worker_num <= 1:
        for i, task in enumerate(tasks):
            print(f"[{i + 1}/{len(tasks)}] {task['ds_name']}/"
                  f"{task['video_path']} {task['ratio']}")
            results.append(run_one(task))
        return results

    with ThreadPoolExecutor(max_workers=worker_num) as pool:
        futures = [pool.submit(run_one, t) for t in tasks]
        for i, fut in enumerate(futures):
            try:
                results.append(fut.result())
            except Exception:
                traceback.print_exc()
                raise
            print(f"[{i + 1}/{len(tasks)}] done")
    return results
