from vimoclip_tpu.train.state import (  # noqa: F401
    CheckpointManager,
    TrainState,
    cosine_annealing_schedule,
    make_adamw,
)
