from .rope import rope_table, embed_nd, apply_rope
from .schedule import (
    timestep_embedding,
    time_shift,
    get_lin_function,
    get_schedule,
    ode_timesteps,
    shift_training_time,
)
from .packing import (
    patchify,
    unpatchify,
    pack_mask,
    make_img_ids,
    pack_sequences,
    bucket_length,
)
from .attention import attention, mha

__all__ = [
    "rope_table", "embed_nd", "apply_rope",
    "timestep_embedding", "time_shift", "get_lin_function", "get_schedule",
    "ode_timesteps", "shift_training_time",
    "patchify", "unpatchify", "pack_mask", "make_img_ids", "pack_sequences",
    "bucket_length",
    "attention", "mha",
]
