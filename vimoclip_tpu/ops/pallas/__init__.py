from vimoclip_tpu.ops.pallas.flash_attention import flash_attention  # noqa: F401
from vimoclip_tpu.ops.pallas.preprocess_kernel import fused_normalize  # noqa: F401
