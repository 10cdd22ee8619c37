"""iamf-tpu: TPU-native IAMF decode + rendering framework (JAX/XLA/Pallas).

Precision policy: this is a *decoder* with bit-exactness guarantees
(FLAC/PCM lossless paths must match the reference player byte-for-byte,
lossy paths carry SNR bars). On TPU, XLA's DEFAULT matmul precision
evaluates float32 contractions through bfloat16 MXU passes (8 mantissa
bits -> a 2^-8 quantization grid on [0.5, 1) signals), which silently
breaks those guarantees on hardware while CPU tests still pass. Force
full-f32 contractions globally; every matmul in the decode graph is tiny
(render matrices <= 28x16, IMDCT bases <= 2048^2) and HBM-bound, so the
extra MXU passes are not measurable end-to-end.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
