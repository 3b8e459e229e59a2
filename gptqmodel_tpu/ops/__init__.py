"""ops — packed-weight formats and quantized-linear compute kernels.

- ``pack``          : GPTQ v1/v2 bit-exact pack/unpack (checkpoint interop)
- ``qlinear``       : QuantLinear param pytree + XLA reference forward
- ``pallas_qmatmul``: fused dequant-matmul Pallas kernels (TPU hot path)
- ``registry``      : kernel capability contracts + auto-selection
"""
