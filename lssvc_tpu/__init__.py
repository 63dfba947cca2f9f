"""lssvc_tpu — a TPU-native learned spatially-scalable video codec framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the LSSVC
reference (EsakaK/LSSVC, "A Learned Spatially Scalable Video Coding Scheme",
IEEE TIP 2024): two-layer (base + enhancement) neural video coding with
inter-layer motion/texture/latent conditioning, hyperprior entropy models and
a host-side rANS entropy coder.

Design stance (differs from the reference's PyTorch architecture):
  * all network math is pure functions over parameter pytrees, NHWC layout,
    jit-compiled per padded resolution;
  * quantization/entropy bit estimation runs fp32 on device;
  * the rANS coder is a fresh C++ implementation with a batch-oriented C API
    (symbols/indexes move device->host once per tensor, never per element);
  * sequence-level parallelism is a jax.sharding Mesh over batched sequences
    instead of a process pool.
"""

__version__ = "0.1.0"
