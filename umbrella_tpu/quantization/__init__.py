from .awq import (
    AwqTensor,
    awq_matmul,
    dequantize,
    pack_tpu_layout,
    quantize_matrix,
    unpack_awq_numpy,
)
from .loader import (
    awq_params_from_hf_state_dict,
    load_awq_runtime,
    quantize_params,
    quantize_runtime,
)
