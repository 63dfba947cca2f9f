"""GOP encode-only serving driver: byte parity with the sequential
encode+decode loop, closed-loop DPB correctness, and the standalone
decoder chain."""

import numpy as np
import pytest

import jax.numpy as jnp

N_FRAMES, GOP = 4, 2
HW_EL, HW_BL = (128, 128), (64, 64)


@pytest.fixture(scope="module")
def nets():
    from lssvc_tpu.models.init import init_intra_ss, init_lssvc
    from lssvc_tpu.models.intra_ss import IntraSS
    from lssvc_tpu.models.lssvc import LSSVCExtend

    i_net = IntraSS(init_intra_ss(192), channel_BL=192)
    v_net = LSSVCExtend(init_lssvc())
    for m in (i_net, v_net):
        m.set_scale_information(2.0, HW_EL, (0, 0, 0, 0))
    i_net.update(force=True)
    v_net.update(force=True)
    return i_net, v_net


@pytest.mark.slow
def test_encode_gop_matches_sequential_loop(nets, tmp_path):
    from lssvc_tpu.harness.serving import encode_gop

    rng = np.random.default_rng(17)
    n_frames, gop = N_FRAMES, GOP
    hw_el, hw_bl = HW_EL, HW_BL
    i_net, v_net = nets

    xs_bl = [jnp.asarray(rng.random((1, *hw_bl, 3)), jnp.float32)
             for _ in range(n_frames)]
    xs_el = [jnp.asarray(rng.random((1, *hw_el, 3)), jnp.float32)
             for _ in range(n_frames)]

    # sequential reference loop (runner semantics incl. in-place DPB clamp)
    seq = tmp_path / "seq"
    seq.mkdir()
    dpb = None
    seq_bits = []
    for t in range(n_frames):
        blp = str(seq / f"bl{t}.bin")
        elp = str(seq / f"el{t}.bin")
        if t % gop == 0:
            res = i_net.encode_decode(xs_bl[t], xs_el[t], blp, elp,
                                      pic_height_bl=hw_bl[0],
                                      pic_width_bl=hw_bl[1],
                                      pic_height_el=hw_el[0],
                                      pic_width_el=hw_el[1])
            dpb = {"ref_frame_bl": res["x_hat_bl"],
                   "ref_frame_el": res["x_hat_el"],
                   "ref_feature_bl": None,
                   "ref_feature_el": res["feature_el"]}
        else:
            res = v_net.encode_decode_extend(
                xs_bl[t], xs_el[t], dpb, blp, elp,
                pic_width=hw_el[1], pic_height=hw_el[0],
                pic_width_bl=hw_bl[1], pic_height_bl=hw_bl[0])
            dpb = res["dpb"]
        seq_bits.append((res["bit_bl"], res["bit_el"]))
        dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
        dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)

    # pipelined GOP driver
    pip = tmp_path / "pip"
    pip.mkdir()
    bl_paths = [str(pip / f"bl{t}.bin") for t in range(n_frames)]
    el_paths = [str(pip / f"el{t}.bin") for t in range(n_frames)]
    dpb_pip, bits = encode_gop(i_net, v_net, xs_bl, xs_el, gop,
                               bl_paths, el_paths, hw_bl, hw_el)

    for t in range(n_frames):
        assert (seq / f"bl{t}.bin").read_bytes() == \
            (pip / f"bl{t}.bin").read_bytes(), f"BL frame {t}"
        assert (seq / f"el{t}.bin").read_bytes() == \
            (pip / f"el{t}.bin").read_bytes(), f"EL frame {t}"
        assert bits[t] == seq_bits[t], f"bits frame {t}"
    np.testing.assert_array_equal(
        np.asarray(dpb_pip["ref_frame_el"]),
        np.asarray(dpb["ref_frame_el"]))


def test_standalone_decode_chain_matches_encoder_dpb(nets, tmp_path):
    """The decode.py loop (I: decompress_stream, P: BL+EL decompress with
    runner-parity clamping) must reproduce the encoder's device DPB
    bit-exactly from the written bins."""
    from lssvc_tpu.harness.serving import encode_gop
    from lssvc_tpu.models.intra_ss_stream import decompress_stream
    from lssvc_tpu.utils.stream import decode_p

    i_net, v_net = nets
    rng = np.random.default_rng(23)
    xs_bl = [jnp.asarray(rng.random((1, *HW_BL, 3)), jnp.float32)
             for _ in range(N_FRAMES)]
    xs_el = [jnp.asarray(rng.random((1, *HW_EL, 3)), jnp.float32)
             for _ in range(N_FRAMES)]
    bl_paths = [str(tmp_path / f"bl{t}.bin") for t in range(N_FRAMES)]
    el_paths = [str(tmp_path / f"el{t}.bin") for t in range(N_FRAMES)]
    dpb_enc, _ = encode_gop(i_net, v_net, xs_bl, xs_el, GOP,
                            bl_paths, el_paths, HW_BL, HW_EL)

    dpb = None
    for t in range(N_FRAMES):
        if t % GOP == 0:
            res = decompress_stream(i_net, bl_paths[t], el_paths[t])
            dpb = {"ref_frame_bl": res["x_hat_bl"],
                   "ref_frame_el": res["x_hat_el"],
                   "ref_feature_bl": None,
                   "ref_feature_el": res["feature_el"]}
        else:
            bl_res = v_net.base_layer_model.decompress(
                decode_p(bl_paths[t]), HW_BL[0], HW_BL[1], dpb)
            dpb_el = dict(dpb)
            dpb_el["texture"] = bl_res["dpb"]["ref_feature_bl"]
            dpb_el["y_hat_bl"] = bl_res["dpb"]["y_hat_bl"]
            dpb_el["mv_hat_bl"] = bl_res["dpb"]["mv_hat_bl"]
            el_res = v_net.decompress(decode_p(el_paths[t]), HW_EL[0],
                                      HW_EL[1], dpb_el)
            dpb = {"ref_frame_bl": bl_res["dpb"]["ref_frame_bl"],
                   "ref_feature_bl": bl_res["dpb"]["ref_feature_bl"],
                   "ref_frame_el": el_res["dpb"]["ref_frame_el"],
                   "ref_feature_el": el_res["dpb"]["ref_feature_el"]}
        dpb["ref_frame_bl"] = jnp.clip(dpb["ref_frame_bl"], 0.0, 1.0)
        dpb["ref_frame_el"] = jnp.clip(dpb["ref_frame_el"], 0.0, 1.0)

    for k in ("ref_frame_bl", "ref_frame_el", "ref_feature_el"):
        np.testing.assert_array_equal(np.asarray(dpb_enc[k]),
                                      np.asarray(dpb[k]), err_msg=k)
