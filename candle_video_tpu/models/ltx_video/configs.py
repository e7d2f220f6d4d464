"""Version presets for LTX-Video 0.9.5 → 0.9.8 (2B / 13B).

Mirror of the reference's configs (src/models/ltx_video/configs.rs:11-283):
each version bundles inference + transformer + VAE + scheduler configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from .scheduler import FlowMatchEulerSchedulerConfig
from .transformer import LtxTransformerConfig
from .vae import LtxVaeConfig


@dataclasses.dataclass(frozen=True)
class LtxInferenceConfig:
    """Mirror of LTXVInferenceConfig (configs.rs:11-37)."""

    guidance_scale: float = 3.0
    num_inference_steps: int = 40
    stg_scale: float = 1.0
    rescaling_scale: float = 0.7
    stochastic_sampling: bool = False
    skip_block_list: tuple = ()
    timesteps: Optional[tuple] = None  # distilled sigma lists (passed as sigmas)
    decode_timestep: Optional[tuple] = None
    decode_noise_scale: Optional[tuple] = None


@dataclasses.dataclass(frozen=True)
class LtxFullConfig:
    inference: LtxInferenceConfig
    transformer: LtxTransformerConfig
    vae: LtxVaeConfig
    scheduler: FlowMatchEulerSchedulerConfig


def _common_vae() -> LtxVaeConfig:
    return LtxVaeConfig()


def _common_scheduler() -> FlowMatchEulerSchedulerConfig:
    """configs.rs:100-120: SD3 shifting, shift_terminal=0.1."""
    return FlowMatchEulerSchedulerConfig(
        num_train_timesteps=1000,
        shift=1.0,
        use_dynamic_shifting=False,
        base_shift=0.95,
        max_shift=2.05,
        base_image_seq_len=1024,
        max_image_seq_len=4096,
        shift_terminal=0.1,
        time_shift_type="exponential",
    )


def _transformer_2b() -> LtxTransformerConfig:
    return LtxTransformerConfig(
        num_layers=28,
        num_attention_heads=32,
        attention_head_dim=64,
        cross_attention_dim=2048,
        caption_channels=4096,
    )


def _transformer_13b() -> LtxTransformerConfig:
    return LtxTransformerConfig(
        num_layers=48,
        num_attention_heads=32,
        attention_head_dim=128,
        cross_attention_dim=4096,
        caption_channels=4096,
    )


_DISTILLED_SIGMAS = (1.0000, 0.9937, 0.9875, 0.9812, 0.9750, 0.9094, 0.7250)


def v0_9_5_2b() -> LtxFullConfig:
    return LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=3.0, num_inference_steps=40, stg_scale=1.0,
            rescaling_scale=0.7, skip_block_list=(19,),
        ),
        transformer=_transformer_2b(),
        vae=_common_vae(),
        scheduler=_common_scheduler(),
    )


def v0_9_6_dev_2b() -> LtxFullConfig:
    return v0_9_5_2b()


def v0_9_6_distilled_2b() -> LtxFullConfig:
    return LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=8, stg_scale=0.0,
            rescaling_scale=1.0, stochastic_sampling=True, skip_block_list=(),
        ),
        transformer=_transformer_2b(),
        vae=_common_vae(),
        scheduler=_common_scheduler(),
    )


def v0_9_8_distilled_2b() -> LtxFullConfig:
    return LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=7, stg_scale=0.0,
            rescaling_scale=1.0, skip_block_list=(),
            timesteps=_DISTILLED_SIGMAS,
            decode_timestep=(0.05,), decode_noise_scale=(0.025,),
        ),
        transformer=_transformer_2b(),
        vae=_common_vae(),
        scheduler=_common_scheduler(),
    )


def v0_9_8_dev_13b() -> LtxFullConfig:
    return LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=8.0, num_inference_steps=30, stg_scale=4.0,
            rescaling_scale=0.5, skip_block_list=(11, 25, 35, 39),
        ),
        transformer=_transformer_13b(),
        vae=_common_vae(),
        scheduler=_common_scheduler(),
    )


def v0_9_8_distilled_13b() -> LtxFullConfig:
    return LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=7, stg_scale=0.0,
            rescaling_scale=1.0, skip_block_list=(42,),
            timesteps=_DISTILLED_SIGMAS,
            decode_timestep=(0.05,), decode_noise_scale=(0.025,),
        ),
        transformer=_transformer_13b(),
        vae=_common_vae(),
        scheduler=_common_scheduler(),
    )


_VERSIONS = {
    "0.9.5": v0_9_5_2b,
    "0.9.5-2b": v0_9_5_2b,
    "0.9.6-dev": v0_9_6_dev_2b,
    "0.9.6-2b-dev": v0_9_6_dev_2b,
    "0.9.6-distilled": v0_9_6_distilled_2b,
    "0.9.6-2b-distilled": v0_9_6_distilled_2b,
    "0.9.8-2b-distilled": v0_9_8_distilled_2b,
    "0.9.8-distilled": v0_9_8_distilled_2b,
    "0.9.8-13b-dev": v0_9_8_dev_13b,
    "0.9.8-13b-distilled": v0_9_8_distilled_13b,
    "0.9.8-13b": v0_9_8_distilled_13b,
}


def get_config_by_version(version: str) -> LtxFullConfig:
    """configs.rs:49-68 dispatch; unknown versions default to 0.9.5."""
    return _VERSIONS.get(version, v0_9_5_2b)()
