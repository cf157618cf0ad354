from vimoclip_tpu.ops.attention import (  # noqa: F401
    MultiHeadAttention,
    dot_product_attention,
)
