"""gptqmodel_tpu — TPU-native GPTQ quantization + inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ModelCloud/GPTQModel (reference layer map in SURVEY.md):

- ``quantization/`` — quantizer math, GPTQ/RTN/AWQ solvers, config system
- ``ops/``          — packing formats + quantized-linear ops (XLA reference
                      path and Pallas fused dequant-matmul kernels)
- ``models/``       — module-tree DSL, per-arch definitions, loader/writer
- ``looper/``       — layer-by-layer quantization orchestration
- ``parallel/``     — mesh / sharding helpers (DP Hessian psum, TP inference)
- ``inference/``    — KV-cache decode loop, continuous batching, serving
"""

__version__ = "0.1.0"

from gptqmodel_tpu.quantization.config import QuantizeConfig  # noqa: F401

__all__ = ["QuantizeConfig", "GPTQModel"]


def __getattr__(name):
    # Lazy: importing the facade pulls model definitions; keep base import light.
    if name == "GPTQModel":
        from gptqmodel_tpu.models.auto import GPTQModel

        return GPTQModel
    raise AttributeError(name)
