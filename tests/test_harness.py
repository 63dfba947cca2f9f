"""End-to-end harness smoke test: synthetic YUV -> run_test -> result logs,
plus BD-rate unit checks against the reference's committed numbers."""

import json
import os

import numpy as np
import pytest

from lssvc_tpu.harness.bd_rate import bd_psnr, bd_rate


def test_bd_rate_identity():
    rate = [100, 200, 400, 800]
    psnr = [30, 33, 36, 39]
    assert abs(bd_rate(rate, psnr, rate, psnr)) < 1e-9
    assert abs(bd_psnr(rate, psnr, rate, psnr)) < 1e-9


def test_bd_rate_known_shift():
    rate = np.array([100, 200, 400, 800], dtype=float)
    psnr = np.array([30, 33, 36, 39], dtype=float)
    # test curve: same quality at half the rate -> BD-rate = -50%
    val = bd_rate(rate, psnr, rate / 2, psnr)
    assert abs(val + 50) < 1e-6


def test_bd_rate_reproduces_reference_baseline():
    """Full-layer IP32 x2 class BD-rates vs SHM from the committed JSONs
    (SURVEY.md §6 / BASELINE.md)."""
    ref_root = "/root/reference/json_results"
    if not os.path.isdir(ref_root):
        pytest.skip("reference json_results not available")
    import sys

    sys.path.insert(0, "/root/repo")
    from compare_rd import load_results, weighted_class_points

    lssvc = weighted_class_points(
        load_results(f"{ref_root}/LSSVC/IP32/x2_FL.json"))
    shm = weighted_class_points(
        load_results(f"{ref_root}/hevc/IP32/x2_FL.json"))
    expected = {"HEVC_B": -24.7, "HEVC_C": -7.0, "HEVC_E": -14.2,
                "MCL-JCV": -26.1, "UVG": -22.2}
    for ds, exp in expected.items():
        ra, pa = zip(*shm[ds])
        rt, pt = zip(*lssvc[ds])
        assert abs(bd_rate(ra, pa, rt, pt) - exp) < 0.15, ds


@pytest.mark.slow
@pytest.mark.parametrize("ratio", ["x1_5", "x3", "x4"])
def test_run_test_non_integer_and_large_ratios(tmp_path, ratio):
    """End-to-end at the reference's OTHER scalability ratios (its
    committed sweeps cover x2/x1.5/x3/x4, `README.md:50-163`): the
    inter-layer padding (divisible by 64 AND 64*ratio), the MATLAB
    bicubic at non-integer scale, and the resamplers' scale plumbing all
    engage differently than at x2 — previously only x2 had e2e
    coverage."""
    from lssvc_tpu.harness.runner import run_test
    from lssvc_tpu.models.init import init_intra_ss, init_lssvc
    from lssvc_tpu.models.intra_ss import IntraSS
    from lssvc_tpu.models.lssvc import LSSVCExtend

    h, w, n_frames = 128, 128, 2
    rng = np.random.default_rng(3)
    yuv_path = str(tmp_path / "seq.yuv")
    with open(yuv_path, "wb") as f:
        base = rng.integers(0, 255, (h, w), dtype=np.uint8)
        for t in range(n_frames):
            y = np.roll(base, t, axis=1)
            uv = np.full((h // 2, w // 2 * 2), 128, dtype=np.uint8)
            f.write(y.tobytes())
            f.write(uv.tobytes())

    i_net = IntraSS(init_intra_ss(192), channel_BL=192)
    v_net = LSSVCExtend(init_lssvc())
    args = {
        "frame_num": n_frames,
        "gop_size": 2,
        "ratio": ratio,
        "yuv_path_el": yuv_path,
        "x1": {"height": h, "width": w},
        "bin_folder": str(tmp_path / "bins"),
        "ds_name": "synthetic",
        "video_path": "seq",
    }
    log_bl, log_el, log_fl = run_test(v_net, i_net, args)
    for log in (log_bl, log_el, log_fl):
        assert log["ave_all_frame_bpp"] > 0
        assert 0 < log["ave_all_frame_rgb_psnr"] < 100


@pytest.mark.slow
def test_run_test_end_to_end(tmp_path):
    """3 frames of synthetic 128x128 YUV through the full two-layer loop
    (estimated bpp) with from-scratch weights."""
    from lssvc_tpu.harness.runner import run_test
    from lssvc_tpu.models.init import init_intra_ss, init_lssvc
    from lssvc_tpu.models.intra_ss import IntraSS
    from lssvc_tpu.models.lssvc import LSSVCExtend

    h, w, n_frames = 256, 256, 3
    rng = np.random.default_rng(0)
    yuv_path = str(tmp_path / "seq.yuv")
    with open(yuv_path, "wb") as f:
        base = rng.integers(0, 255, (h, w), dtype=np.uint8)
        for t in range(n_frames):
            y = np.clip(base.astype(int) + t * 2, 0, 255).astype(np.uint8)
            uv = np.full((h // 2, w // 2 * 2), 128, dtype=np.uint8)
            f.write(y.tobytes())
            f.write(uv.tobytes())

    i_net = IntraSS(init_intra_ss(192), channel_BL=192)
    v_net = LSSVCExtend(init_lssvc())

    args = {
        "frame_num": n_frames,
        "gop_size": 2,
        "ratio": "x2",
        "yuv_path_el": yuv_path,
        "x1": {"height": h, "width": w},
        "bin_folder": str(tmp_path / "bins"),
        "ds_name": "synthetic",
        "video_path": "seq",
    }
    log_bl, log_el, log_fl = run_test(v_net, i_net, args)

    for log in (log_bl, log_el, log_fl):
        assert log["i_frame_num"] == 2
        assert log["p_frame_num"] == 1
        assert log["ave_all_frame_bpp"] > 0
        assert 0 < log["ave_all_frame_rgb_psnr"] < 100
        assert 0 < log["ave_all_frame_msssim"] <= 1
    # FL bits are the sum of layers
    assert abs(log_fl["ave_all_frame_bpp"]
               - (log_el["ave_all_frame_bpp"]
                  + log_bl["ave_all_frame_bpp"] / 4)) < 1e-9
