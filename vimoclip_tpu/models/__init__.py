from vimoclip_tpu.models.tfam import TFAM, AttentionLayer, sinusoidal_positional_encoding  # noqa: F401
