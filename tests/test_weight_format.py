"""Official→Diffusers key remapping tests (weight_format.rs:167-269 table)."""

import numpy as np
import pytest

from candle_video_tpu.models.ltx_video import weight_format as WF


def test_detect_format(tmp_path):
    f = tmp_path / "model.safetensors"
    f.write_bytes(b"x")
    assert WF.detect_format(str(f)) == "official"
    assert WF.detect_format(str(tmp_path)) == "diffusers"
    assert WF.detect_format(str(tmp_path / "nonexistent")) == "diffusers"


def test_remap_transformer_keys():
    assert WF.remap_key("transformer.patchify_proj.weight") == "transformer.proj_in.weight"
    assert (
        WF.remap_key("transformer.adaln_single.linear.weight")
        == "transformer.time_embed.linear.weight"
    )
    assert WF.remap_key("attn1.q_norm.weight") == "attn1.norm_q.weight"
    assert WF.remap_key("attn1.k_norm.weight") == "attn1.norm_k.weight"


def test_remap_encoder_blocks():
    assert (
        WF.remap_key("encoder.down_blocks.0.res_blocks.0.conv1.weight")
        == "encoder.down_blocks.0.resnets.0.conv1.weight"
    )
    assert (
        WF.remap_key("encoder.down_blocks.1.conv.weight")
        == "encoder.down_blocks.0.downsamplers.0.conv.weight"
    )
    assert (
        WF.remap_key("encoder.down_blocks.2.res_blocks.0.conv1.weight")
        == "encoder.down_blocks.1.resnets.0.conv1.weight"
    )
    assert (
        WF.remap_key("encoder.down_blocks.6.res_blocks.0.weight")
        == "encoder.down_blocks.3.resnets.0.weight"
    )
    assert (
        WF.remap_key("encoder.down_blocks.8.res_blocks.0.weight")
        == "encoder.mid_block.resnets.0.weight"
    )


def test_remap_decoder_blocks():
    assert (
        WF.remap_key("decoder.up_blocks.0.res_blocks.0.weight")
        == "decoder.mid_block.resnets.0.weight"
    )
    assert (
        WF.remap_key("decoder.up_blocks.1.conv.weight")
        == "decoder.up_blocks.0.upsamplers.0.conv.weight"
    )
    assert (
        WF.remap_key("decoder.up_blocks.2.res_blocks.0.weight")
        == "decoder.up_blocks.0.resnets.0.weight"
    )
    assert (
        WF.remap_key("decoder.up_blocks.8.res_blocks.0.weight")
        == "decoder.up_blocks.3.resnets.0.weight"
    )


def test_remap_misc():
    assert WF.remap_key("decoder.last_time_embedder.weight") == "decoder.time_embedder.weight"
    assert (
        WF.remap_key("decoder.last_scale_shift_table") == "decoder.scale_shift_table"
    )
    assert WF.remap_key("per_channel_statistics.mean-of-means") == "latents_mean"
    assert WF.remap_key("per_channel_statistics.std-of-means") == "latents_std"
    assert WF.remap_key("resnets.0.norm3.norm.weight") == "resnets.0.norm3.weight"


def test_key_classifiers():
    assert WF.is_transformer_key("model.diffusion_model.patchify_proj.weight")
    assert WF.is_transformer_key("transformer_blocks.0.attn1.to_q.weight")
    assert not WF.is_transformer_key("decoder.conv_in.weight")
    assert WF.is_vae_key("vae.decoder.conv_in.weight")
    assert WF.is_vae_key("per_channel_statistics.mean-of-means")
    assert not WF.is_vae_key("transformer_blocks.0.attn1.to_q.weight")


def test_split_unified_state_dict():
    sd = {
        "model.diffusion_model.patchify_proj.weight": np.zeros(1),
        "model.diffusion_model.transformer_blocks.0.attn1.q_norm.weight": np.zeros(1),
        "vae.decoder.up_blocks.0.res_blocks.0.conv1.conv.weight": np.zeros(1),
        "vae.per_channel_statistics.mean-of-means": np.zeros(1),
        "vae.encoder.down_blocks.1.conv.conv.weight": np.zeros(1),
    }
    tsd, vsd = WF.split_unified_state_dict(sd)
    assert "proj_in.weight" in tsd
    assert "transformer_blocks.0.attn1.norm_q.weight" in tsd
    assert "decoder.mid_block.resnets.0.conv1.conv.weight" in vsd
    assert "latents_mean" in vsd
    assert "encoder.down_blocks.0.downsamplers.0.conv.conv.weight" in vsd


def test_loader_missing_tensor_errors():
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video.loader import (
        LoaderError,
        transformer_params_from_state_dict,
        vae_params_from_state_dict,
    )
    from candle_video_tpu.models.ltx_video.transformer import LtxTransformerConfig

    with pytest.raises(LoaderError, match="norm_q.weight"):
        transformer_params_from_state_dict({}, LtxTransformerConfig(num_layers=1),
                                           jnp.float32)
    with pytest.raises(LoaderError, match="encoder.conv_in.conv.weight"):
        vae_params_from_state_dict({}, jnp.float32)


def test_load_sharded_empty_dir_errors(tmp_path):
    from candle_video_tpu.models.ltx_video.loader import LoaderError, load_sharded

    with pytest.raises(LoaderError, match="no safetensors"):
        load_sharded(str(tmp_path))
