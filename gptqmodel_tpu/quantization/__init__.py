from gptqmodel_tpu.quantization.config import QuantizeConfig  # noqa: F401
from gptqmodel_tpu.quantization.quantizer import find_params, quantize_dequantize  # noqa: F401
