from .flux import flux_apply, flux_apply_cfg, init_flux, param_count
from .lora import fold_lora, init_lora
from .autoencoder import AutoEncoder, init_autoencoder
from .t5 import init_t5, t5_encode
from .clip import clip_encode, init_clip
from .conditioner import TextEncoder, default_tokenizer

__all__ = [
    "flux_apply", "flux_apply_cfg", "init_flux", "param_count",
    "fold_lora", "init_lora",
    "AutoEncoder", "init_autoencoder",
    "init_t5", "t5_encode", "clip_encode", "init_clip",
    "TextEncoder", "default_tokenizer",
]
