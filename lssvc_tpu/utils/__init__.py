from .padding import (
    get_padding_size,
    get_interlayer_padding,
    inverse_padding_size,
    round_to_even,
)
from .color import (
    rgb_to_ycbcr420,
    ycbcr420_to_rgb,
    ycbcr420_to_444,
    ycbcr444_to_420,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from .stream import (
    get_downsampled_shape,
    filesize,
    encode_i,
    decode_i,
    encode_p,
    decode_p,
)
from .resize import imresize
