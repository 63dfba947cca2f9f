"""Direct tests for the Pallas windowed warp kernels (interpret mode on CPU).

Model-level tests exercise the XLA warp path on CPU (the auto wrappers skip
pallas off-TPU to avoid minutes-long interpret-mode compiles); these tests
call the pallas kernels directly at small shapes, including shapes NOT
aligned to the (8, 128) tile grid — covering the internal padding and the
true-border (not padded-border) clamping.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lssvc_tpu.ops.warp import flow_warp, flow_warp_grouped
from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas, _grouped_warp_pallas

# small displacement windows keep interpret-mode compiles fast;
# (2*d_h+2) % 128 == 0 and (2*d_v+2) % 8 == 0 are kernel requirements
D_V = 3
D_H = 63


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale)


def _rand_flow(shape, seed):
    # kernel precondition: |dy| <= d_v - 1, |dx| <= d_h - 1 (the auto
    # wrapper checks this at runtime; direct calls must respect it)
    f = np.random.default_rng(seed).uniform(-1, 1, size=shape)
    f[..., 0] *= D_H - 1
    f[..., 1] *= D_V - 1
    return jnp.asarray(f.astype(np.float32))


def test_pallas_warp_aligned_exact():
    x = _rand((1, 16, 128, 3), 0)
    flow = _rand_flow((1, 16, 128, 2), 1)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas(x, flow[..., 0], flow[..., 1], D_V, D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_warp_unaligned_shape():
    # H=14, W=150 force internal padding to (16, 256)
    x = _rand((1, 14, 150, 4), 2)
    flow = _rand_flow((1, 14, 150, 2), 3)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas(x, flow[..., 0], flow[..., 1], D_V, D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_warp_border_clamp_uses_true_size():
    # constant +2.0 flow pushes right/bottom-edge samples past the TRUE
    # border; they must clamp to column w-1 / row h-1 (border replicate),
    # not sample the zero padding added for tile alignment
    x = _rand((1, 14, 150, 2), 4)
    flow = jnp.full((1, 14, 150, 2), 2.0, jnp.float32)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas(x, flow[..., 0], flow[..., 1], D_V, D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_warp_batched():
    """Batch > 1 unrolls into per-image launches (batch-of-sequences
    serving) and must match the batched XLA warp per-image."""
    x = _rand((2, 14, 150, 3), 6)
    flow = _rand_flow((2, 14, 150, 2), 7)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas(x, flow[..., 0], flow[..., 1], D_V, D_H)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_grouped_warp_batched():
    g, cg, go = 4, 2, 8  # group_num=4, 2 offsets each
    x = _rand((2, 16, 128, 8), 8)
    fx = jnp.full((2, 16, 128, go), 1.25, jnp.float32)
    fy = jnp.zeros((2, 16, 128, go), jnp.float32)
    mask = _rand((2, 16, 128, go), 10) ** 2
    out = _grouped_warp_pallas(x, fx, fy, mask, D_V, D_H, g)
    # reference: per-image single-batch kernel calls
    ref = jnp.concatenate([
        _grouped_warp_pallas(x[b:b + 1], fx[b:b + 1], fy[b:b + 1],
                             mask[b:b + 1], D_V, D_H, g)
        for b in range(2)], axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_grouped_warp_matches_xla_block_path():
    group_num, offset_num, cg = 2, 2, 2
    go = group_num * offset_num
    h, w = 14, 150  # unaligned: exercises padding + true-border clamp
    x = _rand((1, h, w, group_num * cg), 5)
    fx = jnp.clip(_rand((1, h, w, go), 6, scale=1.5), -(D_H - 1), D_H - 1)
    fy = jnp.clip(_rand((1, h, w, go), 7, scale=1.5), -(D_V - 1), D_V - 1)
    mask = jnp.abs(_rand((1, h, w, go), 8))

    out = _grouped_warp_pallas(x, fx, fy, mask, D_V, D_H, group_num)

    # reference: the XLA block-layout grouped path (itself validated against
    # the torch OffsetDiversity in test_offset_diversity.py)
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate(
        [pl for plane in planes for pl in (plane,) * offset_num], axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate(
        [mask] * cg, axis=-1)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_warp_tall_tile_path():
    # h >= 128 selects the 32-row output tile (window margin amortization);
    # h=130 also forces height padding to 160
    x = _rand((1, 130, 128, 2), 9)
    flow = _rand_flow((1, 130, 128, 2), 10)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas(x, flow[..., 0], flow[..., 1], D_V, D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_shift_sum_warp_exact():
    from lssvc_tpu.ops.warp import flow_warp_shift_sum

    x = _rand((1, 14, 150, 4), 11)
    for bound, scale in ((1, 0.9), (2, 1.9), (3, 2.9)):
        flow = jnp.clip(_rand((1, 14, 150, 2), 12, scale=2.0), -scale, scale)
        ref = flow_warp(x, flow)
        out = flow_warp_shift_sum(x, flow, bound)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)


def test_shift_sum_warp_border_clamp():
    from lssvc_tpu.ops.warp import flow_warp_shift_sum

    # outward flow at the borders must replicate edge samples, same as
    # flow_warp's clamp; bound applies to the raw flow, the clamped
    # effective flow stays within it
    x = _rand((1, 14, 150, 2), 13)
    flow = jnp.full((1, 14, 150, 2), 1.8, jnp.float32)
    ref = flow_warp(x, flow)
    out = flow_warp_shift_sum(x, flow, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_shift_sum_grouped_exact():
    from lssvc_tpu.ops.warp import flow_warp_grouped, grouped_warp_shift_sum

    group_num, offset_num, cg = 2, 2, 2
    go = group_num * offset_num
    h, w = 14, 150
    x = _rand((1, h, w, group_num * cg), 14)
    fx = jnp.clip(_rand((1, h, w, go), 15, scale=1.5), -1.9, 1.9)
    fy = jnp.clip(_rand((1, h, w, go), 16, scale=1.5), -1.9, 1.9)
    mask = jnp.abs(_rand((1, h, w, go), 17))

    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate(
        [p for plane in planes for p in (plane,) * offset_num], axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate(
        [mask] * cg, axis=-1)
    out = grouped_warp_shift_sum(x, fx, fy, mask, group_num, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_smallflow_kernel_exact():
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_small

    rng = np.random.default_rng(41)
    x = _rand((1, 14, 150, 4), 42)
    f = rng.uniform(-2, 2, size=(1, 14, 150, 2)).astype(np.float32)
    flow = jnp.asarray(f)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_small(x, flow[..., 0], flow[..., 1], 2, D_V,
                                  D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_smallflow_kernel_border_clamp():
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_small

    x = _rand((1, 14, 150, 2), 43)
    flow = jnp.full((1, 14, 150, 2), 2.0, jnp.float32)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_small(x, flow[..., 0], flow[..., 1], 2, D_V,
                                  D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_smallflow_grouped_kernel_exact():
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_small

    rng = np.random.default_rng(44)
    g, cg, go = 4, 2, 8
    x = _rand((1, 16, 128, 8), 45)
    fx = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    mask = _rand((1, 16, 128, go), 46) ** 2
    out = _grouped_warp_pallas_small(x, fx, fy, mask, g, 2, D_V, D_H)
    # reference: eager per-unit bilinear warp in the block layout
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate([p for plane in planes for p in (plane,) * 2],
                            axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate([mask] * cg,
                                                             axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_kernel_exact():
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    rng = np.random.default_rng(51)
    x = _rand((1, 14, 150, 8), 52)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 14, 150, 2))
                       .astype(np.float32))
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                   D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_kernel_border_clamp():
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    x = _rand((1, 14, 150, 8), 53)
    flow = jnp.full((1, 14, 150, 2), 2.0, jnp.float32)
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                   D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_kernel_channel_padding():
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    rng = np.random.default_rng(54)
    x = _rand((1, 16, 128, 3), 55)  # C=3 exercises the pad-to-8 path
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, 2))
                       .astype(np.float32))
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                   D_H)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_auto_wrappers_packed_out_xla_path():
    """flow_warp_auto/grouped_warp_auto with packed_out=True on the CPU
    (XLA) path: the non-kernel branches must pack after and return the
    same layout the tiny-tier kernel stores directly."""
    from lssvc_tpu.ops.packed import pack_width
    from lssvc_tpu.ops.warp import grouped_warp_lowmem
    from lssvc_tpu.ops.warp_pallas import flow_warp_auto, grouped_warp_auto

    rng = np.random.default_rng(77)
    x = _rand((1, 16, 128, 8), 78)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, 2))
                       .astype(np.float32))
    ref = pack_width(flow_warp(x, flow), 2)
    out = flow_warp_auto(x, flow, packed_out=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    g, go = 4, 8
    fx = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (1, 16, 128, go)).astype(np.float32))
    # CPU path routes through _slow_eager whose output is the same block
    # layout; compare against pack_width of the lowmem reference
    refg = pack_width(np.asarray(grouped_warp_lowmem(x, fx, fy, m, g)), 2)
    outg = grouped_warp_auto(x, fx, fy, m, g, packed_out=True)
    assert outg.shape == refg.shape
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               atol=2e-5)


def test_cblock_kernel_packed_out():
    """packed_out=True stores straight into the width-packed conv domain:
    bit-equal to pack_width(warp(x)) (same f32 accumulation, the packed
    tile transpose is 0/1-selector dots — multiply-by-1 is exact)."""
    from lssvc_tpu.ops.packed import pack_width
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    rng = np.random.default_rng(71)
    x = _rand((1, 14, 150, 8), 72)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 14, 150, 2))
                       .astype(np.float32))
    ref = pack_width(flow_warp(x, flow), 2)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                   D_H, packed_out=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_kernel_packed_out_channel_padding():
    """C=3 exercises the pad-to-8 path: the packed channel slices must
    pull phase 0 and phase 1 from the padded layout, not the first 2C."""
    from lssvc_tpu.ops.packed import pack_width
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    rng = np.random.default_rng(73)
    x = _rand((1, 16, 128, 3), 74)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, 2))
                       .astype(np.float32))
    ref = pack_width(flow_warp(x, flow), 2)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                   D_H, packed_out=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grouped_cblock_kernel_packed_out():
    """Grouped packed_out == pack_width(grouped warp) bit-for-bit."""
    from lssvc_tpu.ops.packed import pack_width
    from lssvc_tpu.ops.warp import grouped_warp_lowmem
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

    rng = np.random.default_rng(75)
    g, cg, go = 4, 2, 8
    x = _rand((1, 16, 128, 8), 76)
    fx = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (1, 16, 128, go)).astype(np.float32))
    ref = pack_width(grouped_warp_lowmem(x, fx, fy, m, g), 2)
    out = _grouped_warp_pallas_cblock(x, fx, fy, m, g, 2, D_V, D_H,
                                      packed_out=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grouped_cblock_kernel_exact():
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

    rng = np.random.default_rng(61)
    g, cg, go = 4, 2, 8  # go % 8 == 0
    x = _rand((1, 16, 128, 8), 62)
    fx = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 2, (1, 16, 128, go))
                     .astype(np.float32))
    mask = _rand((1, 16, 128, go), 63) ** 2
    out = _grouped_warp_pallas_cblock(x, fx, fy, mask, g, 2, D_V, D_H)
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate([p for plane in planes for p in (plane,) * 2],
                            axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate([mask] * cg,
                                                             axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grouped_cblock_kernel_unaligned_border():
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

    g, cg, go = 4, 2, 8
    h, w = 14, 150  # unaligned -> internal padding + true-border clamp
    x = _rand((1, h, w, 8), 64)
    fx = jnp.full((1, h, w, go), 2.0, jnp.float32)
    fy = jnp.full((1, h, w, go), -2.0, jnp.float32)
    mask = _rand((1, h, w, go), 65) ** 2
    out = _grouped_warp_pallas_cblock(x, fx, fy, mask, g, 2, D_V, D_H)
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate([p for plane in planes for p in (plane,) * 2],
                            axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate([mask] * cg,
                                                             axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_kernel_large_window():
    """Mid-tier configuration (b=d_v, dynamic tap loop) must stay exact for
    flows up to d_v-1."""
    from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

    rng = np.random.default_rng(71)
    d_v = 11  # window big enough to take the fori_loop path (2b+2=24 > 12)
    x = _rand((1, 14, 150, 8), 72)
    flow = jnp.asarray(rng.uniform(-(d_v - 1), d_v - 1, (1, 14, 150, 2))
                       .astype(np.float32))
    ref = flow_warp(x, flow)
    out = _flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], d_v, d_v,
                                   D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grouped_cblock_kernel_mid_tier():
    """Grouped mid-tier configuration (b=12, d_v=13, dynamic tap loop):
    the tier trained OffsetDiversity offsets (~8-11 px, bounded by
    max_residue_magnitude*tanh) dispatch to.  Must stay exact for
    per-unit flows up to b."""
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

    rng = np.random.default_rng(91)
    g, cg, go = 4, 2, 8
    b, d_v = 12, 15  # 2b+2=26 taps -> fori_loop branch; (2*d_v+2)%8==0
    h, w = 14, 150  # unaligned -> internal padding + true-border clamp
    x = _rand((1, h, w, 8), 92)
    fx = jnp.asarray(rng.uniform(-b, b, (1, h, w, go)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-b, b, (1, h, w, go)).astype(np.float32))
    mask = _rand((1, h, w, go), 93) ** 2
    out = _grouped_warp_pallas_cblock(x, fx, fy, mask, g, b, d_v, D_H)
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate([p for plane in planes for p in (plane,) * 2],
                            axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate([mask] * cg,
                                                             axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_cblock_roll_kernel_exact(monkeypatch):
    """The LSSVC_WARP_ROLL=1 tiny-tier variant (lane rotations instead of
    dynamic lane gathers) must match the gather formulation exactly.  Uses
    a shape no other test traces so the monkeypatched flag is seen at
    trace time (the kernel choice is bound when jit traces the call)."""
    import lssvc_tpu.ops.warp_pallas as wp

    monkeypatch.setattr(wp, "_USE_ROLL", True)
    rng = np.random.default_rng(81)
    x = _rand((1, 18, 140, 8), 82)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 18, 140, 2))
                       .astype(np.float32))
    ref = flow_warp(x, flow)
    out = wp._flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1], 2, D_V,
                                      D_H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("mode", ["1", "t"])
def test_cblock_nhwc_out_matches_planar(monkeypatch, mode):
    """LSSVC_WARP_NHWC_OUT fuses the output relayout into the tiny-tier
    kernels (in-register tile transpose, NHWC store) — same math, same
    rounding points; tolerance covers FMA-contraction differences the
    backend makes across the changed fusion boundary (one element in ~1M
    under heavy cancellation).  Fresh shapes so the flag is seen at trace
    time."""
    import jax

    import lssvc_tpu.ops.warp_pallas as wp

    rng = np.random.default_rng(91)
    x = _rand((1, 22, 150, 16), 92)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 22, 150, 2))
                       .astype(np.float32))
    ref_single = wp._flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1],
                                             2, D_V, D_H)
    go, c_src = 16, 4
    xg = _rand((1, 22, 150, c_src), 93)
    fxg = jnp.asarray(rng.uniform(-2, 2, (1, 22, 150, go)).astype(np.float32))
    fyg = jnp.asarray(rng.uniform(-2, 2, (1, 22, 150, go)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (1, 22, 150, go)).astype(np.float32))
    ref_grouped = wp._grouped_warp_pallas_cblock(xg, fxg, fyg, m, 4,
                                                 2, D_V, D_H)

    monkeypatch.setattr(wp, "_NHWC_OUT", mode)
    jax.clear_caches()
    out_single = wp._flow_warp_pallas_cblock(x, flow[..., 0], flow[..., 1],
                                             2, D_V, D_H)
    out_grouped = wp._grouped_warp_pallas_cblock(xg, fxg, fyg, m, 4,
                                                 2, D_V, D_H)
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(out_single), np.asarray(ref_single),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_grouped),
                               np.asarray(ref_grouped), atol=2e-6)
