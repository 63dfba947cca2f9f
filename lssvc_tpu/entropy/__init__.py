from .models import (
    bit_estimator_forward,
    factorized_bits,
    laplace_cdf,
    laplace_bits,
    gaussian_conditional_likelihood,
    entropy_bottleneck_forward,
    entropy_bottleneck_logits,
    likelihood_to_bits,
    GAUSSIAN_SCALE_TABLE_VIDEO,
    GAUSSIAN_SCALE_TABLE_IMG,
    build_indexes_video,
    build_indexes_img,
)
