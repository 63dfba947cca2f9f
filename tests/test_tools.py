"""Tests for the artifact-recovery tools.

These tools are the insurance layer for wall-clock-killed runs (the
round-3 lesson: a deadline kill mid-eval lost the whole RD artifact):

- tools/rd_reconstruct.py rebuilds an rd_experiment report from the
  per-point lines in the run log;
- tools/ref_scale_merge.py combines per-rate-point test.py output dirs
  into the reference-schema combined JSONs
  (cf. /root/reference/json_results/LSSVC/IP32/x2_FL.json — one file,
  all rate points as sibling checkpoint keys).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(name, *argv):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name), *argv],
        capture_output=True, text=True, cwd=REPO)


def test_rd_reconstruct_recovers_points_and_bd(tmp_path):
    log = tmp_path / "rd_log.txt"
    lines = ["=== evaluating mode fp32"]
    # fp32: 4 points; first lambda printed twice (watchdog relaunch) with
    # the stale value first — the LAST occurrence must win
    lines.append("  fp32 lmbda=0.003: bpp=0.9000 rgb-psnr=11.00")
    pts = {0.003: (0.10, 30.0), 0.01: (0.20, 33.0),
           0.03: (0.40, 36.0), 0.09: (0.80, 39.0)}
    for lm, (b, p) in pts.items():
        lines.append(f"  fp32 lmbda={lm:g}: bpp={b:.4f} rgb-psnr={p:.2f}")
    for lm, (b, p) in pts.items():  # bf16 slightly worse PSNR
        lines.append(f"  bf16 lmbda={lm:g}: bpp={b:.4f} rgb-psnr={p - 0.05:.2f}")
    lines.append("step 40: loss=1.0 bpp=0.5 mse_el=0.1 (2.0 frames/s)")
    log.write_text("\n".join(lines) + "\n")

    out = tmp_path / "rd_report.json"
    r = run_tool("rd_reconstruct.py", str(log), "--out", str(out))
    assert r.returncode == 0, r.stderr
    rep = json.loads(out.read_text())
    assert rep["curves"]["fp32"][0] == [0.10, 30.0]  # not the stale 0.9 line
    assert len(rep["curves"]["fp32"]) == 4
    assert len(rep["curves"]["bf16"]) == 4
    # bf16 loses a constant 0.05 dB here, so its BD-rate vs fp32 is > 0
    assert rep["bd_rate_delta_pct"] > 0

    # refuses to clobber an existing (real) report without --force
    r2 = run_tool("rd_reconstruct.py", str(log), "--out", str(out))
    assert r2.returncode != 0


def test_rd_reconstruct_partial_mode(tmp_path):
    log = tmp_path / "rd_log.txt"
    log.write_text("  fp32 lmbda=0.003: bpp=0.1000 rgb-psnr=30.00\n"
                   "  fp32 lmbda=0.01: bpp=0.2000 rgb-psnr=33.00\n")
    out = tmp_path / "rep.json"
    r = run_tool("rd_reconstruct.py", str(log), "--out", str(out))
    assert r.returncode == 0, r.stderr
    rep = json.loads(out.read_text())
    assert list(rep["curves"]) == ["fp32"]
    assert "bd_rate_delta_pct" not in rep  # needs both modes at 4+ points


def test_ref_scale_merge_combines_rate_points(tmp_path):
    # two per-point output dirs, one ckpt key each, same ds/seq nesting
    for i, (ck, psnr) in enumerate([("video_a.npz", 30.0),
                                    ("video_b.npz", 33.0)]):
        d = tmp_path / f"out_p{i}"
        d.mkdir()
        for layer in ("BL", "EL", "FL"):
            (d / f"x2_{layer}.json").write_text(json.dumps(
                {"SYN": {"eval": {ck: {"ave_all_frame_rgb_psnr": psnr}}}}))
    merged = tmp_path / "merged"
    r = run_tool("ref_scale_merge.py", str(tmp_path / "out_p0"),
                 str(tmp_path / "out_p1"), "--out", str(merged))
    assert r.returncode == 0, r.stderr
    for layer in ("BL", "EL", "FL"):
        log = json.loads((merged / f"x2_{layer}.json").read_text())
        assert set(log["SYN"]["eval"]) == {"video_a.npz", "video_b.npz"}


def test_ref_scale_merge_empty_input_fails(tmp_path):
    empty = tmp_path / "nothing"
    empty.mkdir()
    r = run_tool("ref_scale_merge.py", str(empty),
                 "--out", str(tmp_path / "m"))
    assert r.returncode != 0
