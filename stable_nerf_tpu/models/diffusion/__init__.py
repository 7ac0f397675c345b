from .scheduler import DDIMScheduler
from .unet import UNetConfig, sdxl_unet_config, tiny_unet_config, unet_apply, unet_init
from .vae import (
    VAEConfig,
    vae_decode,
    vae_encode_mode,
    vae_encode_sample,
    vae_init,
)
from .sd_network import (
    SDNetworkConfig,
    decode_latents,
    embed_conditions,
    encode_images,
    encode_images_mode,
    init_ip_from_unet,
    sd_forward,
    sd_network_init,
    trainable_mask,
)

__all__ = [
    "DDIMScheduler",
    "UNetConfig",
    "sdxl_unet_config",
    "tiny_unet_config",
    "unet_apply",
    "unet_init",
    "VAEConfig",
    "vae_decode",
    "vae_encode_mode",
    "vae_encode_sample",
    "vae_init",
    "SDNetworkConfig",
    "decode_latents",
    "embed_conditions",
    "encode_images",
    "encode_images_mode",
    "init_ip_from_unet",
    "sd_forward",
    "sd_network_init",
    "trainable_mask",
]
