from .nn import (
    ste_round,
    conv2d,
    conv_transpose2d,
    pixel_shuffle,
    avg_pool2d,
    max_pool2d,
    leaky_relu,
    relu,
    gdn,
    pad_nhwc,
    to_nhwc,
    to_nchw,
    default_conv_precision,
    set_default_conv_precision,
)
from .warp import (
    flow_warp,
    flow_warp_grouped,
    bilinear_resize,
    bilinear_upsample2,
    bilinear_downsample2,
)
