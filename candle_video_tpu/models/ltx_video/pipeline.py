"""LTX-Video text-to-video pipeline — jitted lax.scan denoise loop.

Parity target: LtxPipeline::call (src/models/ltx_video/t2v_pipeline.rs:
627-1073): prompt encoding with CFG negative branch, PCG32 latents, SD3 mu or
distilled custom sigmas, video-coords with the causal frame fix, CFG/STG
guidance, Euler steps in f32, decode-noise injection, postprocess to [0,255].

TPU-first differences (deliberate redesign, not a port):
- the denoise loop is ONE jitted ``lax.scan`` — no per-step Python dispatch,
- CFG/STG passes are BATCHED on the batch axis (one forward of 2-3x batch)
  instead of the reference's sequential passes (t2v_pipeline.rs:870-985);
  batch rows are [uncond; cond; perturbed],
- RoPE cos/sin tables are computed once before the loop (the reference
  recomputes per forward),
- latents stay f32 across steps; model inputs are cast to BF16 per step.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.rope import rope_cos_sin
from ...utils.rng import Pcg32
from . import scheduler as S
from . import t5 as T5
from . import transformer as TF
from . import vae as V
from .configs import LtxFullConfig


# ---------------------------------------------------------------------------
# latent packing (t2v_pipeline.rs:474-550)
# ---------------------------------------------------------------------------


def pack_latents(latents, patch_size: int = 1, patch_size_t: int = 1):
    """[B,C,F,H,W] -> [B, S, D] with D = C*pt*p*p."""
    b, c, f, h, w = latents.shape
    p, pt = patch_size, patch_size_t
    x = latents.reshape(b, c, f // pt, pt, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (f // pt) * (h // p) * (w // p), c * pt * p * p)


def unpack_latents(latents, num_frames: int, height: int, width: int,
                   patch_size: int = 1, patch_size_t: int = 1):
    """[B,S,D] -> [B,C,F,H,W] (inverse of pack_latents)."""
    b, _, d = latents.shape
    p, pt = patch_size, patch_size_t
    c = d // (pt * p * p)
    x = latents.reshape(b, num_frames, height, width, c, pt, p, p)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, c, num_frames * pt, height * p, width * p)


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """std-ratio guidance rescale (t2v_pipeline.rs:227-243); unbiased std."""

    def _std(x):
        flat = x.reshape(x.shape[0], -1)
        return jnp.std(flat, axis=1, ddof=1).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 1)
        )

    ratio = _std(noise_pred_text) / _std(noise_cfg)
    rescaled = noise_cfg * ratio
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def build_video_coords(
    latent_num_frames: int,
    latent_height: int,
    latent_width: int,
    frame_rate: float,
    temporal_ratio: int = 8,
    spatial_ratio: int = 32,
) -> np.ndarray:
    """[S, 3] video coords with the causal frame fix
    ``(L*8 + 1 - 8).clamp(0) / frame_rate`` and spatial ``L*32``
    (t2v_pipeline.rs:798-847)."""
    f = np.arange(latent_num_frames, dtype=np.float32)
    h = np.arange(latent_height, dtype=np.float32)
    w = np.arange(latent_width, dtype=np.float32)
    gf, gh, gw = np.meshgrid(f, h, w, indexing="ij")
    vf = np.clip(gf * temporal_ratio + 1.0 - temporal_ratio, 0.0, 1000.0) / frame_rate
    vh = gh * spatial_ratio
    vw = gw * spatial_ratio
    return np.stack([vf, vh, vw], axis=-1).reshape(-1, 3)


def postprocess_video(video):
    """[-1,1] -> [0,255] f32 (t2v_pipeline.rs:146-156)."""
    video = jnp.clip(video.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    return video * 255.0


@functools.partial(
    jax.jit,
    static_argnames=("num_frames", "height", "width", "patch_size",
                     "patch_size_t", "scaling_factor", "with_noise"),
)
def _prepare_decode(final, mean, std, key, noise_scale, *, num_frames, height,
                    width, patch_size, patch_size_t, scaling_factor,
                    with_noise):
    """unpack -> denormalize -> decode-noise mix as ONE program.

    Eagerly these are ~8 tiny ops; on the tunnel each eager op is its own
    remote XLA compile (~0.4 s) on first use, a measurable slice of the
    cold start."""
    lat5 = unpack_latents(final, num_frames, height, width, patch_size,
                          patch_size_t)
    lat5 = V.denormalize_latents(lat5, mean, std, scaling_factor)
    if with_noise:
        noise = jax.random.normal(key, lat5.shape, lat5.dtype)
        lat5 = (1.0 - noise_scale) * lat5 + noise_scale * noise
    return lat5


_postprocess_jit = jax.jit(postprocess_video)

# decode-program signatures already warmed in this process (keyed on the
# param-tree identity + call signature): repeat generate() calls skip the
# dummy warmup decode entirely
_decode_warmed: set = set()


def _start_decode_warmup(pipe, vcfg, zshape, has_temb, decode_kwargs):
    """Compile the VAE decode programs on a background thread while the
    denoise scan compiles/runs on the main thread (cold-start overlap).

    The thread calls the SAME facade with zeros inputs of the production
    shape/dtype, so the jit caches it populates are exactly the ones the
    real decode hits.  Returns the started thread (join before decoding)
    or None if this signature is already warm."""
    import threading

    key = (
        id(pipe.vae_params), zshape, has_temb,
        tuple(sorted((k, v) for k, v in decode_kwargs.items())),
    )
    if key in _decode_warmed:
        return None
    _decode_warmed.add(key)

    def _warm():
        try:
            z = jnp.zeros(zshape, jnp.float32)
            temb = jnp.zeros((zshape[0],), jnp.float32) if has_temb else None
            V.decode(pipe.vae_params, vcfg, z, temb, **decode_kwargs)
        except Exception:  # noqa: BLE001 — warmup must never break generation
            pass

    t = threading.Thread(target=_warm, daemon=True, name="cvt-decode-warmup")
    t.start()
    return t


# ---------------------------------------------------------------------------
# denoise loop
# ---------------------------------------------------------------------------


def guidance_combine(pred, b, num_conds, guidance_scale, guidance_rescale,
                     stg_scale):
    """CFG/STG combination of batched guidance rows [uncond; cond; perturbed]
    (t2v_pipeline.rs:941-963).  Shared by the single-mesh and PP loops."""
    if num_conds == 3:
        uncond, text, perturbed = pred[:b], pred[b : 2 * b], pred[2 * b :]
        combined = uncond + guidance_scale * (text - uncond)
        combined = jnp.where(
            guidance_rescale > 0,
            rescale_noise_cfg(combined, text, guidance_rescale),
            combined,
        )
        return combined + stg_scale * (text - perturbed)
    if num_conds == 2:
        uncond, text = pred[:b], pred[b:]
        combined = uncond + guidance_scale * (text - uncond)
        return jnp.where(
            guidance_rescale > 0,
            rescale_noise_cfg(combined, text, guidance_rescale),
            combined,
        )
    return pred


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "num_conds", "stochastic", "attn_impl", "use_skip"),
)
def denoise_loop(
    transformer_params,
    tcfg: TF.LtxTransformerConfig,
    latents,  # [B, S, C] f32
    encoder_hidden_states,  # [num_conds*B, K, caption] (batched rows)
    encoder_attention_mask,  # [num_conds*B, K]
    sigmas,  # [N+1] f32
    timesteps,  # [N] f32
    rope_cos,  # [1 or B, S, D]
    rope_sin,
    guidance_scale,  # scalar f32
    guidance_rescale,  # scalar f32
    stg_scale,  # scalar f32
    skip_layer_mask,  # [L, num_conds*B] f32 or zeros
    noise_key,  # jax PRNG key (stochastic sampling)
    num_conds: int = 1,
    stochastic: bool = False,
    attn_impl: str = "auto",
    use_skip: bool = False,
    rope_split=None,  # compact split-layout table; transformer_params must
    #                   then be permuted (TF.permute_params_rope_split)
):
    """Full denoising scan. Returns final latents [B, S, C] f32."""
    b = latents.shape[0]
    n_steps = timesteps.shape[0]

    if rope_split is None:
        cos_b = jnp.broadcast_to(rope_cos, (num_conds * b,) + rope_cos.shape[1:])
        sin_b = jnp.broadcast_to(rope_sin, (num_conds * b,) + rope_sin.shape[1:])
    else:
        cos_b, sin_b = rope_cos, rope_sin  # unused under the split layout

    def step_fn(carry, xs):
        lat, key = carry
        t, sigma, sigma_next = xs

        lat_in = jnp.tile(lat, (num_conds, 1, 1))
        timestep = jnp.full((num_conds * b,), t, jnp.float32)

        pred = TF.forward(
            transformer_params,
            tcfg,
            lat_in,
            encoder_hidden_states,
            timestep,
            cos_b,
            sin_b,
            encoder_attention_mask=encoder_attention_mask,
            skip_layer_mask=skip_layer_mask if use_skip else None,
            attn_impl=attn_impl,
            rope_split=rope_split,
        ).astype(jnp.float32)

        combined = guidance_combine(
            pred, b, num_conds, guidance_scale, guidance_rescale, stg_scale
        )

        if stochastic:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, lat.shape, jnp.float32)
            new_lat = S.step(lat, combined, sigma, sigma_next,
                             stochastic=True, noise=noise)
        else:
            new_lat = S.step(lat, combined, sigma, sigma_next)
        return (new_lat, key), None

    xs = (timesteps, sigmas[:-1], sigmas[1:])
    (final, _), _ = jax.lax.scan(step_fn, (latents.astype(jnp.float32), noise_key), xs,
                                 length=n_steps)
    return final


@functools.partial(
    jax.jit,
    static_argnames=(
        "tcfg", "num_conds", "attn_impl", "use_skip", "num_train_timesteps"
    ),
)
def denoise_loop_i2v(
    transformer_params,
    tcfg: TF.LtxTransformerConfig,
    latents,  # [B, S, C] f32 — conditioned tokens already hold clean latents
    cond_mask,  # [B, S] f32, 1 = conditioned token (first latent frame)
    encoder_hidden_states,
    encoder_attention_mask,
    sigmas,  # [N+1] f32 — FULL schedule (per-token step searches it)
    timesteps,  # [M] f32 — the steps to run (M=N, or 1 for step-wise mode)
    rope_cos,
    rope_sin,
    guidance_scale,
    guidance_rescale,
    stg_scale,
    skip_layer_mask,
    num_conds: int = 1,
    attn_impl: str = "auto",
    use_skip: bool = False,
    rope_split=None,
    num_train_timesteps: int = 1000,
):
    """Image-conditioned denoising scan (beyond the reference, which is
    t2v-only — but built on the reference's own per-token scheduler path,
    scheduler.rs:511-542, and mirroring diffusers LTXImageToVideoPipeline):
    each token carries its own timestep ``t·(1-mask)`` into the per-token
    AdaLN, conditioned tokens run at t=0 and are left untouched by the
    per-token Euler step."""
    b = latents.shape[0]

    if rope_split is None:
        cos_b = jnp.broadcast_to(rope_cos, (num_conds * b,) + rope_cos.shape[1:])
        sin_b = jnp.broadcast_to(rope_sin, (num_conds * b,) + rope_sin.shape[1:])
    else:
        cos_b, sin_b = rope_cos, rope_sin  # unused under the split layout

    inv_mask = 1.0 - cond_mask.astype(jnp.float32)  # [B, S], 1 = denoise

    def step_fn(lat, t):
        lat_in = jnp.tile(lat, (num_conds, 1, 1))
        tok_t = t * inv_mask  # [B, S] per-token timestep
        timestep = jnp.tile(tok_t, (num_conds, 1))

        pred = TF.forward(
            transformer_params,
            tcfg,
            lat_in,
            encoder_hidden_states,
            timestep,
            cos_b,
            sin_b,
            encoder_attention_mask=encoder_attention_mask,
            skip_layer_mask=skip_layer_mask if use_skip else None,
            attn_impl=attn_impl,
            rope_split=rope_split,
        ).astype(jnp.float32)

        combined = guidance_combine(
            pred, b, num_conds, guidance_scale, guidance_rescale, stg_scale
        )
        denoised = S.step_per_token(
            lat, combined, sigmas, tok_t, num_train_timesteps
        )
        # tokens whose noise level is at/below the conditioning floor hold
        denoise_tok = ((t / num_train_timesteps - 1e-6) < inv_mask)[..., None]
        return jnp.where(denoise_tok, denoised, lat), None

    final, _ = jax.lax.scan(
        step_fn, latents.astype(jnp.float32), timesteps,
        length=timesteps.shape[0],
    )
    return final


def denoise_stepwise(
    pipe,
    transformer_params,
    tcfg: TF.LtxTransformerConfig,
    latents,
    encoder_hidden_states,
    encoder_attention_mask,
    schedule: S.Schedule,
    rope_cos,
    rope_sin,
    guidance_scale: float,
    guidance_rescale: float,
    stg_scale: float,
    skip_layer_mask,
    noise_key,
    num_conds: int = 1,
    stochastic: bool = False,
    attn_impl: str = "auto",
    use_skip: bool = False,
    step_callback=None,
    rope_split=None,
):
    """Python-loop variant: one jitted step per iteration, checking the
    pipeline's cooperative ``interrupt`` flag and invoking ``step_callback``
    between steps — the reference's per-step loop semantics
    (t2v_pipeline.rs:860-994).  Same numerics as ``denoise_loop``."""
    lat = latents.astype(jnp.float32)
    key = noise_key
    n = schedule.timesteps.shape[0]
    for i in range(n):
        if pipe is not None and pipe.interrupt:
            break
        one = denoise_loop(
            transformer_params, tcfg, lat,
            encoder_hidden_states, encoder_attention_mask,
            jnp.asarray([schedule.sigmas[i], schedule.sigmas[i + 1]], jnp.float32),
            jnp.asarray([schedule.timesteps[i]], jnp.float32),
            rope_cos, rope_sin,
            jnp.float32(guidance_scale), jnp.float32(guidance_rescale),
            jnp.float32(stg_scale), skip_layer_mask, key,
            num_conds=num_conds, stochastic=stochastic,
            attn_impl=attn_impl, use_skip=use_skip, rope_split=rope_split,
        )
        key, _ = jax.random.split(key)
        lat = one
        if step_callback is not None:
            step_callback(i, n, lat)
    return lat


@dataclasses.dataclass
class ConditioningItem:
    """One conditioning anchor for image/video-conditioned generation.

    ``image`` [B,C,H,W] (or [C,H,W]) in [-1,1] — VAE-encoded at prepare
    time — or ``latents`` [B,C,1,h',w'] (unnormalized, as the encoder
    emits).  The anchor is placed at latent ``frame_index`` (0 = classic
    i2v first-frame conditioning; ``latent_num_frames-1`` = last-frame
    anchor, giving first+last interpolation with two items).

    ``strength`` in (0, 1]: 1 holds the token exactly through the whole
    denoise loop; s < 1 blends the anchor with noise at preparation
    (``s·anchor + (1-s)·noise``) and runs the token at per-token timestep
    ``t·(1-s)`` so it starts denoising once the schedule drops below its
    noise floor (extension semantics on the reference's per-token
    scheduler path, scheduler.rs:511-542).  Later items override earlier
    ones on overlapping frames.
    """

    image: Any = None
    latents: Any = None
    frame_index: int = 0
    strength: float = 1.0


# ---------------------------------------------------------------------------
# the pipeline facade
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LtxPipeline:
    """Bundled modules; mirror of the reference's trait-object pipeline
    (t2v_pipeline.rs:245-267) with pytrees instead of Box<dyn ...>."""

    config: LtxFullConfig
    transformer_params: Any
    vae_params: Any = None
    t5_params: Any = None
    t5_config: Optional[T5.T5Config] = None
    tokenizer: Any = None  # candle_video_tpu.utils.tokenizer.T5Tokenizer

    # cooperative interrupt checked per step in step-wise mode
    # (t2v_pipeline.rs:861-863)
    interrupt: bool = False
    # prompt-embedding cache (text_encoder.rs EmbeddingCache)
    embedding_cache_size: int = 16
    _embed_cache: dict = dataclasses.field(default_factory=dict)
    # cached split-rope-permuted transformer params (keyed on identity)
    _split_params_cache: Any = dataclasses.field(default=None, repr=False)

    # transformer_params were permuted IN PLACE for the split rope layout
    # (materialize_split_rope) — the original interleaved tree is gone
    _rope_permuted_inplace: bool = dataclasses.field(default=False, repr=False)

    def split_rope_params(self):
        """attn1-q/k-permuted params for the split rope layout (cached)."""
        cache = self._split_params_cache
        if cache is None or cache[0] is not self.transformer_params:
            permuted = TF.permute_params_rope_split(
                self.transformer_params, self.config.transformer
            )
            self._split_params_cache = (self.transformer_params, permuted)
        return self._split_params_cache[1]

    def materialize_split_rope(self):
        """Permute attn1 q/k for the split rope layout IN PLACE, dropping
        the original tree.

        The cached-copy default (split_rope_params) holds BOTH layouts —
        ~1.6 GiB extra at 13B (2 stacks of 48x4096x4096 int8), which is
        exactly the margin a 16 GiB chip does not have next to the
        12.7 GiB int8 model.  After this call the pipeline can ONLY run
        configurations where the packed split-rope kernel carries
        self-attention; generate() raises if dispatch would fall back
        (the permuted q/k are wrong for the interleaved rotation)."""
        permuted = TF.permute_params_rope_split(
            self.transformer_params, self.config.transformer
        )
        self.transformer_params = permuted
        self._split_params_cache = (permuted, permuted)
        self._rope_permuted_inplace = True
        return self

    def mark_rope_presplit(self):
        """Declare transformer_params ALREADY in the split-rope layout.

        For params whose attn1 q/k were permuted at load
        (``loader.transformer_params_w8_from_state_dict(rope_split=True)``
        — host-side, free) or random payloads that need no permutation.
        Same dispatch contract as materialize_split_rope: generate()
        refuses configurations that would fall back to the interleaved
        rotation."""
        self._split_params_cache = (self.transformer_params,
                                    self.transformer_params)
        self._rope_permuted_inplace = True
        return self

    def encode_prompt(self, prompts: Sequence[str], max_sequence_length: int = 128):
        if self.tokenizer is None or self.t5_params is None:
            raise ValueError("pipeline has no tokenizer/text encoder")
        key = (tuple(prompts), max_sequence_length)
        if key in self._embed_cache:
            return self._embed_cache[key]
        ids, mask = self.tokenizer.encode_batch(prompts, max_sequence_length)
        pos_bias = T5.position_bias(self.t5_params, self.t5_config, ids.shape[1])
        embeds = T5.forward(
            self.t5_params, self.t5_config, jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), pos_bias=pos_bias,
        )
        result = (embeds, jnp.asarray(mask, jnp.float32))
        if len(self._embed_cache) >= self.embedding_cache_size:
            self._embed_cache.pop(next(iter(self._embed_cache)))
        self._embed_cache[key] = result
        return result

    def __call__(self, **kwargs):
        return generate(self, **kwargs)


def check_inputs(
    height: int,
    width: int,
    prompt,
    prompt_embeds,
    negative_prompt_embeds=None,
    prompt_attention_mask=None,
    negative_prompt_attention_mask=None,
):
    """Full validation surface of the reference (t2v_pipeline.rs:313-365)."""
    if height % 32 != 0 or width % 32 != 0:
        raise ValueError(
            f"`height` and `width` must be divisible by 32, got {height} and {width}"
        )
    if prompt is not None and prompt_embeds is not None:
        raise ValueError("Cannot forward both `prompt` and `prompt_embeds`.")
    if prompt is None and prompt_embeds is None:
        raise ValueError("Provide either `prompt` or `prompt_embeds`.")
    if prompt_embeds is not None and prompt_attention_mask is None:
        raise ValueError(
            "Must provide `prompt_attention_mask` when specifying `prompt_embeds`."
        )
    if negative_prompt_embeds is not None and negative_prompt_attention_mask is None:
        raise ValueError(
            "Must provide `negative_prompt_attention_mask` when specifying "
            "`negative_prompt_embeds`."
        )
    if (
        prompt_embeds is not None
        and negative_prompt_embeds is not None
        and tuple(prompt_embeds.shape) != tuple(negative_prompt_embeds.shape)
    ):
        raise ValueError(
            "`prompt_embeds` and `negative_prompt_embeds` must have the same shape."
        )
    if (
        prompt_attention_mask is not None
        and negative_prompt_attention_mask is not None
        and tuple(prompt_attention_mask.shape)
        != tuple(negative_prompt_attention_mask.shape)
    ):
        raise ValueError(
            "`prompt_attention_mask` and `negative_prompt_attention_mask` must "
            "have the same shape."
        )


def split_rope_viable(tcfg, seq_len: int, attn_impl: str = "auto") -> bool:
    """Params-independent half of the split-rope dispatch decision: will
    the packed kernel carry self-attention at this config/seq_len on this
    backend?  Lets loaders decide to fold the permutation in HOST-SIDE
    (transformer_params_w8_from_state_dict(rope_split=True)) before any
    device tree exists."""
    if attn_impl not in ("auto", "pallas"):
        return False
    if os.environ.get("CVT_DISABLE_SPLIT_ROPE"):
        return False
    from ...ops.attention import _default_backend
    from ...ops.pallas.flash_attention_packed import packed_viable

    if _default_backend() not in ("tpu", "axon") and not os.environ.get(
        "CVT_FORCE_SPLIT_ROPE"
    ):
        return False
    if tcfg.inner_dim % 128 or 128 % tcfg.attention_head_dim:
        return False
    return packed_viable(
        seq_len, seq_len, tcfg.num_attention_heads, tcfg.attention_head_dim
    )


def _use_split_rope(pipe, tcfg, seq_len: int, attn_impl: str) -> bool:
    """Enable the split rope layout when the packed kernel will carry
    self-attention: TPU backend (or CVT_FORCE_SPLIT_ROPE=1 for interpret-mode
    testing), lane-groupable dims, viable scores tile, BF16 params."""
    if not split_rope_viable(tcfg, seq_len, attn_impl):
        return False
    to_q = pipe.transformer_params["blocks"]["attn1"]["to_q"]
    if "weight" not in to_q and "w8" not in to_q and "w4" not in to_q:
        return False  # W8A8-quantized params keep the interleaved layout
    return True


def generate(
    pipe: LtxPipeline,
    prompt: Optional[Sequence[str] | str] = None,
    negative_prompt: Optional[Sequence[str] | str] = None,
    height: int = 512,
    width: int = 768,
    num_frames: int = 97,
    frame_rate: float = 25.0,
    num_inference_steps: Optional[int] = None,
    sigmas: Optional[Sequence[float]] = None,
    timesteps: Optional[Sequence[float]] = None,
    guidance_scale: Optional[float] = None,
    guidance_rescale: Optional[float] = None,
    stg_scale: Optional[float] = None,
    skip_block_list: Optional[Sequence[int]] = None,
    num_videos_per_prompt: int = 1,
    seed: int = 42,
    latents=None,
    image=None,  # [B,C,H,W] or [C,H,W] in [-1,1]: image-to-video conditioning
    image_latents=None,  # [B,C,1,h',w'] precomputed (unnormalized) first-frame latents
    conditioning: Optional[Sequence["ConditioningItem"]] = None,  # multi-anchor
    conditioning_sample_mode: str = "sample",  # "sample" | "argmax" posterior
    prompt_embeds=None,
    prompt_attention_mask=None,
    negative_prompt_embeds=None,
    negative_prompt_attention_mask=None,
    decode_timestep: Optional[Sequence[float]] = None,
    decode_noise_scale: Optional[Sequence[float]] = None,
    decode_noise=None,  # [B,C,F',H',W'] pre-drawn decode noise (per-row surface)
    output_type: str = "tensor",  # "latent" | "tensor"
    max_sequence_length: int = 128,
    use_pcg_rng: bool = True,
    attn_impl: str = "auto",
    vae_tiling: Optional[V.TilingConfig] = None,
    use_vae_tiling: bool = False,
    use_vae_slicing: bool = False,
    vae_tail_stream_chunks: int = 0,  # exact streaming tail (overlap-save)
    vae_tail_stream_from_ups: bool = False,  # stream from the last upsampler
    vae_full_stream_chunks: int = 0,  # exact full-stream decode (O(chunk))
    vae_auto_decode: bool = True,  # no explicit mode -> select_decode_mode
    decode_warmup: bool = False,  # compile decode programs during denoise
    decode_fn=None,
    step_callback=None,
    pp_mesh=None,  # jax.sharding.Mesh with a 'pp' axis: pipeline-parallel mode
    pp_microbatches: Optional[int] = None,
    pp_interleave: int = 1,
    sp_mesh=None,  # jax.sharding.Mesh with an 'sp' axis: sequence-parallel
    #                (ring-attention) mode, optionally composed with 'dp'
):
    """End-to-end text/image-to-video generation (t2v_pipeline.rs:627-1073).

    ``pp_mesh``: run the denoise scan with the DiT block stack pipelined
    over the mesh's 'pp' axis (parallel.denoise_loop_pp) — GPipe by default,
    interleaved virtual stages with ``pp_interleave>1``.

    ``sp_mesh``: run the denoise scan with the video-token sequence sharded
    over the mesh's 'sp' axis (parallel.denoise_loop_sp) — self-attention
    K/V chunks rotate around the ring via ppermute, no chip ever holds the
    full sequence; composable with batch sharding over a 'dp' axis.  The
    capability the reference lacks entirely (SURVEY.md §2.3: it tames
    sequence length with VAE tiling instead).

    ``image`` / ``image_latents``: image-to-video conditioning (beyond the
    reference's t2v-only pipeline; diffusers LTXImageToVideoPipeline
    semantics on the reference's per-token scheduler path,
    scheduler.rs:511-542): the image is VAE-encoded into the first latent
    frame, all other frames start as noise, and conditioned tokens run at
    per-token timestep 0 through the denoise loop.

    ``conditioning``: the general multi-anchor surface — a list of
    ``ConditioningItem`` placing images (or precomputed latents) at
    arbitrary latent frame indices with per-item strength; two items at
    the first and last frames give first+last interpolation, a chain of
    them video continuation.  ``image=...`` is sugar for a single hard
    anchor at frame 0."""
    cfg = pipe.config
    inf = cfg.inference
    tcfg = cfg.transformer
    vcfg = cfg.vae

    if isinstance(prompt, str):
        prompt = [prompt]
    if isinstance(negative_prompt, str):
        negative_prompt = [negative_prompt]

    check_inputs(
        height,
        width,
        prompt,
        prompt_embeds,
        negative_prompt_embeds,
        prompt_attention_mask,
        negative_prompt_attention_mask,
    )

    num_inference_steps = num_inference_steps or inf.num_inference_steps
    guidance_scale = inf.guidance_scale if guidance_scale is None else guidance_scale
    guidance_rescale = (
        inf.rescaling_scale if guidance_rescale is None else guidance_rescale
    )
    stg_scale = inf.stg_scale if stg_scale is None else stg_scale
    if skip_block_list is None:
        skip_block_list = list(inf.skip_block_list)
    if sigmas is None and timesteps is None and inf.timesteps is not None:
        sigmas = list(inf.timesteps)  # distilled presets store sigmas here
    if decode_timestep is None and inf.decode_timestep is not None:
        decode_timestep = list(inf.decode_timestep)
    if decode_noise_scale is None and inf.decode_noise_scale is not None:
        decode_noise_scale = list(inf.decode_noise_scale)

    do_cfg = guidance_scale > 1.0
    do_stg = stg_scale > 0.0
    num_conds = 1 + int(do_cfg) + int(do_stg)

    batch = len(prompt) if prompt is not None else int(prompt_embeds.shape[0])
    eff_batch = batch * num_videos_per_prompt

    # ---- prompt embeddings -------------------------------------------------
    if prompt_embeds is None:
        p_emb, p_mask = pipe.encode_prompt(prompt, max_sequence_length)
    else:
        p_emb = jnp.asarray(prompt_embeds)
        p_mask = jnp.asarray(prompt_attention_mask, jnp.float32)
    if num_videos_per_prompt > 1:
        p_emb = jnp.repeat(p_emb, num_videos_per_prompt, axis=0)
        p_mask = jnp.repeat(p_mask, num_videos_per_prompt, axis=0)

    if do_cfg:
        if negative_prompt_embeds is None:
            neg = negative_prompt if negative_prompt is not None else [""] * batch
            if len(neg) == 1 and batch > 1:
                neg = neg * batch
            n_emb, n_mask = pipe.encode_prompt(neg, max_sequence_length)
        else:
            n_emb = jnp.asarray(negative_prompt_embeds)
            n_mask = jnp.asarray(negative_prompt_attention_mask, jnp.float32)
        if num_videos_per_prompt > 1:
            n_emb = jnp.repeat(n_emb, num_videos_per_prompt, axis=0)
            n_mask = jnp.repeat(n_mask, num_videos_per_prompt, axis=0)
    else:
        n_emb = n_mask = None

    # batched guidance rows: [uncond; cond; perturbed]
    rows_emb = []
    rows_mask = []
    if do_cfg:
        rows_emb.append(n_emb)
        rows_mask.append(n_mask)
    rows_emb.append(p_emb)
    rows_mask.append(p_mask)
    if do_stg:
        rows_emb.append(p_emb)
        rows_mask.append(p_mask)
    enc_states = jnp.concatenate(rows_emb, axis=0)
    enc_mask = jnp.concatenate(rows_mask, axis=0)

    # ---- latents ------------------------------------------------------------
    if (num_frames - 1) % vcfg.temporal_compression_ratio != 0:
        import warnings

        eff = ((num_frames - 1) // vcfg.temporal_compression_ratio
               * vcfg.temporal_compression_ratio + 1)
        warnings.warn(
            f"num_frames should be {vcfg.temporal_compression_ratio}*n+1; "
            f"{num_frames} will produce {eff} frames",
            stacklevel=2,
        )
    latent_num_frames = (num_frames - 1) // vcfg.temporal_compression_ratio + 1
    latent_height = height // vcfg.spatial_compression_ratio
    latent_width = width // vcfg.spatial_compression_ratio
    seq_len = latent_num_frames * latent_height * latent_width

    # one kwargs dict for the warmup AND the real decode: the jit signatures
    # the warmup thread populates must be exactly the ones decode() hits.
    # The mode policy resolves HERE, once — free HBM differs between warmup
    # time and decode time, and the two must agree on the programs.
    if (vae_auto_decode and output_type == "tensor"
            and pipe.vae_params is not None and decode_fn is None
            and not vae_tail_stream_chunks and not vae_full_stream_chunks):
        picked = V.select_decode_mode(
            vcfg,
            (eff_batch, vcfg.latent_channels, latent_num_frames,
             latent_height, latent_width),
        )
        vae_tail_stream_chunks = picked.get("tail_stream_chunks", 0)
        vae_tail_stream_from_ups = picked.get("tail_stream_from_ups", False)
        vae_full_stream_chunks = picked.get("full_stream_chunks", 0)
    decode_call_kwargs = dict(
        tiling=vae_tiling,
        use_tiling=use_vae_tiling,
        use_framewise_decoding=use_vae_tiling,
        use_slicing=use_vae_slicing,
        tail_stream_chunks=vae_tail_stream_chunks,
        tail_stream_from_ups=vae_tail_stream_from_ups,
        full_stream_chunks=vae_full_stream_chunks,
    )
    warmup_thread = None
    if (decode_warmup and output_type == "tensor"
            and pipe.vae_params is not None and decode_fn is None):
        warmup_thread = _start_decode_warmup(
            pipe, vcfg,
            (eff_batch, vcfg.latent_channels, latent_num_frames,
             latent_height, latent_width),
            bool(vcfg.timestep_conditioning),
            decode_call_kwargs,
        )

    if conditioning is not None and (image is not None or image_latents is not None):
        raise ValueError("pass either `conditioning` or `image`/`image_latents`")
    if image is not None or image_latents is not None:
        # classic i2v sugar: one hard anchor on the first latent frame
        conditioning = [ConditioningItem(image=image, latents=image_latents)]
    i2v = bool(conditioning)
    cond_mask = None
    if i2v:
        if pipe.vae_params is None:
            raise ValueError(
                "image conditioning requires VAE params (encoder + latent stats)"
            )
        # per-frame conditioning-strength mask, packed to [B, S]
        cond_np = np.zeros(
            (eff_batch, 1, latent_num_frames, latent_height, latent_width),
            np.float32,
        )
        for item in conditioning:
            if not 0 <= item.frame_index < latent_num_frames:
                raise ValueError(
                    f"frame_index {item.frame_index} outside latent range "
                    f"[0, {latent_num_frames})"
                )
            if not 0.0 < item.strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {item.strength}")
            if item.image is None and item.latents is None:
                raise ValueError("ConditioningItem needs image or latents")
            cond_np[:, :, item.frame_index] = item.strength
        cond5 = jnp.asarray(cond_np)
        cond_mask = pack_latents(cond5, tcfg.patch_size, tcfg.patch_size_t)[..., 0]

    if latents is None and i2v:
        # encode each conditioning anchor into its latent frame
        def _anchor_latent(item, idx):
            if item.latents is None:
                img = jnp.asarray(item.image, jnp.float32)
                if img.ndim == 3:
                    img = img[None]
                moments = V.encode(
                    pipe.vae_params, vcfg, img[:, :, None],
                    use_tiling=use_vae_tiling,
                )
                if conditioning_sample_mode == "sample":
                    il = V.gaussian_sample(moments, jax.random.PRNGKey(seed + 3 + idx))
                elif conditioning_sample_mode == "argmax":
                    il, _ = V.gaussian_split(moments)
                else:
                    raise ValueError(
                        f"unknown conditioning_sample_mode "
                        f"{conditioning_sample_mode!r}"
                    )
            else:
                il = jnp.asarray(item.latents, jnp.float32)
            il = V.normalize_latents(
                il,
                pipe.vae_params["latents_mean"],
                pipe.vae_params["latents_std"],
                vcfg.scaling_factor,
            )
            if il.shape[0] == 1 and eff_batch > 1:
                il = jnp.broadcast_to(il, (eff_batch,) + il.shape[1:])
            elif num_videos_per_prompt > 1:
                il = jnp.repeat(il, num_videos_per_prompt, axis=0)
            return il.astype(jnp.float32)

        shape = (eff_batch, tcfg.in_channels, latent_num_frames, latent_height,
                 latent_width)
        if use_pcg_rng:
            noise5 = jnp.asarray(Pcg32(seed, 0).randn(shape), jnp.float32)
        else:
            noise5 = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        init5 = jnp.zeros(shape, jnp.float32)
        for idx, item in enumerate(conditioning):
            fi = item.frame_index
            init5 = init5.at[:, :, fi : fi + 1].set(_anchor_latent(item, idx))
        lat5 = init5 * cond5 + noise5 * (1.0 - cond5)
        latents = pack_latents(lat5, tcfg.patch_size, tcfg.patch_size_t)
    elif latents is None:
        shape = (eff_batch, tcfg.in_channels, latent_num_frames, latent_height,
                 latent_width)
        if use_pcg_rng:
            lat5 = jnp.asarray(Pcg32(seed, 0).randn(shape), jnp.float32)
        else:
            lat5 = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        latents = pack_latents(lat5, tcfg.patch_size, tcfg.patch_size_t)
    else:
        # caller-provided latents are used as-is — for i2v this mirrors the
        # diffusers prepare_latents early return (latents assumed pre-mixed)
        latents = jnp.asarray(latents, jnp.float32)
        if latents.ndim == 5:
            latents = pack_latents(latents, tcfg.patch_size, tcfg.patch_size_t)

    # ---- schedule -----------------------------------------------------------
    has_custom = sigmas is not None or timesteps is not None
    if sigmas is None and timesteps is None:
        sigmas = np.linspace(
            1.0, 1.0 / num_inference_steps, num_inference_steps
        ).astype(np.float32).tolist()
    mu = 0.0 if has_custom else S.calculate_shift(
        seq_len,
        cfg.scheduler.base_image_seq_len or 256,
        cfg.scheduler.max_image_seq_len or 4096,
        cfg.scheduler.base_shift or 0.5,
        cfg.scheduler.max_shift or 1.15,
    )
    schedule = S.set_timesteps(
        cfg.scheduler,
        num_inference_steps=num_inference_steps,
        sigmas=sigmas,
        timesteps=timesteps,
        mu=mu,
    )

    # ---- RoPE tables (once) --------------------------------------------------
    coords = build_video_coords(
        latent_num_frames, latent_height, latent_width, frame_rate,
        vcfg.temporal_compression_ratio, vcfg.spatial_compression_ratio,
    )
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [tcfg.rope_base_num_frames, tcfg.rope_base_height, tcfg.rope_base_width],
        jnp.float32,
    )
    rope_cos, rope_sin = rope_cos_sin(grid, tcfg.inner_dim, tcfg.rope_theta)

    # split rope layout (TPU fast path): fold the lane permutation into the
    # attn1 q/k projections once (cached on the pipeline) and rotate q AND k
    # inside the packed kernel from compact tables — kills the per-layer XLA
    # k-rotation pass and halves rope-table HBM traffic, exactly.
    if pp_mesh is not None and sp_mesh is not None:
        raise ValueError("pass at most one of pp_mesh / sp_mesh")

    rope_split = None
    t_params = pipe.transformer_params
    if (pp_mesh is None and sp_mesh is None
            and _use_split_rope(pipe, tcfg, seq_len, attn_impl)):
        from ...ops.rope import rope_split_tables

        rope_split = rope_split_tables(rope_cos, rope_sin)
        t_params = pipe.split_rope_params()
    elif pipe._rope_permuted_inplace:
        raise ValueError(
            "transformer_params are in the split-rope layout (permuted at "
            "load via transformer_params_w8_from_state_dict(rope_split=True)"
            "/mark_rope_presplit, or in place via materialize_split_rope), "
            f"but this configuration (attn_impl={attn_impl!r}, "
            f"seq_len={seq_len}, pp={pp_mesh is not None}, "
            f"sp={sp_mesh is not None}) would not "
            "dispatch the packed split-rope kernel — the permuted q/k "
            "projections are wrong for the interleaved rotation. Reload "
            "without the split layout for this configuration."
        )

    # ---- STG mask -------------------------------------------------------------
    skip_mask = np.zeros((tcfg.num_layers, num_conds * eff_batch), np.float32)
    if do_stg and skip_block_list:
        for idx in skip_block_list:
            if 0 <= idx < tcfg.num_layers:
                skip_mask[idx, (num_conds - 1) * eff_batch :] = 1.0
    # permanent skip for distilled models without STG (t2v_pipeline.rs:691-697)
    if not do_stg and skip_block_list:
        for idx in skip_block_list:
            if 0 <= idx < tcfg.num_layers:
                skip_mask[idx, :] = 1.0

    use_skip = skip_mask.any()

    # ---- denoise ---------------------------------------------------------------
    stochastic = cfg.scheduler.stochastic_sampling or inf.stochastic_sampling
    if i2v:
        if pp_mesh is not None:
            raise ValueError("image conditioning is not supported in PP mode")
        if sp_mesh is not None:
            raise ValueError(
                "image conditioning is not supported in SP mode (per-token "
                "timesteps are not wired through the ring loop)"
            )
        if stochastic:
            raise ValueError(
                "stochastic sampling is not supported with image conditioning "
                "(per-token scheduler path)"
            )

        def _i2v_step(lat, ts):
            return denoise_loop_i2v(
                t_params, tcfg, lat, cond_mask, enc_states, enc_mask,
                schedule.sigmas_jnp, ts, rope_cos, rope_sin,
                jnp.float32(guidance_scale),
                jnp.float32(guidance_rescale if do_cfg else 0.0),
                jnp.float32(stg_scale), jnp.asarray(skip_mask),
                num_conds=num_conds, attn_impl=attn_impl,
                use_skip=bool(use_skip), rope_split=rope_split,
                num_train_timesteps=cfg.scheduler.num_train_timesteps,
            )

        if step_callback is not None or pipe.interrupt:
            final = latents.astype(jnp.float32)
            n = schedule.timesteps.shape[0]
            for i in range(n):
                if pipe.interrupt:
                    break
                final = _i2v_step(final, schedule.timesteps_jnp[i : i + 1])
                if step_callback is not None:
                    step_callback(i, n, final)
        else:
            final = _i2v_step(latents, schedule.timesteps_jnp)
    elif sp_mesh is not None:
        from ...parallel import denoise_loop_sp

        if step_callback is not None:
            raise ValueError("step_callback is not supported in SP mode")
        if stochastic:
            raise ValueError(
                "stochastic sampling is not supported in SP mode (the "
                "oracle draws one full-sequence noise tensor; shards would "
                "need a different stream)"
            )
        sp_params = jax.device_put(
            t_params,
            jax.sharding.NamedSharding(sp_mesh, jax.sharding.PartitionSpec()),
        )
        final = denoise_loop_sp(
            sp_params, tcfg, latents, enc_states, enc_mask,
            schedule.sigmas_jnp, schedule.timesteps_jnp, rope_cos, rope_sin,
            guidance_scale, guidance_rescale if do_cfg else 0.0, stg_scale,
            jnp.asarray(skip_mask), mesh=sp_mesh, num_conds=num_conds,
            attn_impl=attn_impl, use_skip=bool(use_skip),
        )
    elif pp_mesh is not None:
        from ...parallel import denoise_loop_pp, shard_transformer_params_pp

        if step_callback is not None:
            raise ValueError("step_callback is not supported in PP mode")
        pp_params = shard_transformer_params_pp(
            t_params, pp_mesh,
            tp_axis="tp" if "tp" in pp_mesh.shape else None,
            interleave=pp_interleave,
        )
        final = denoise_loop_pp(
            pp_params, tcfg, latents, enc_states, enc_mask,
            schedule.sigmas_jnp, schedule.timesteps_jnp, rope_cos, rope_sin,
            guidance_scale, guidance_rescale if do_cfg else 0.0, stg_scale,
            jnp.asarray(skip_mask), jax.random.PRNGKey(seed + 1),
            mesh=pp_mesh, num_conds=num_conds, stochastic=stochastic,
            attn_impl="xla" if attn_impl == "auto" else attn_impl,
            use_skip=bool(use_skip),
            num_microbatches=pp_microbatches, interleave=pp_interleave,
        )
    elif step_callback is not None or pipe.interrupt:
        final = denoise_stepwise(
            pipe, t_params, tcfg, latents, enc_states, enc_mask,
            schedule, rope_cos, rope_sin,
            guidance_scale, guidance_rescale if do_cfg else 0.0, stg_scale,
            jnp.asarray(skip_mask), jax.random.PRNGKey(seed + 1),
            num_conds=num_conds, stochastic=stochastic, attn_impl=attn_impl,
            use_skip=bool(use_skip), step_callback=step_callback,
            rope_split=rope_split,
        )
    else:
        final = denoise_loop(
            t_params,
            tcfg,
            latents,
            enc_states,
            enc_mask,
            schedule.sigmas_jnp,
            schedule.timesteps_jnp,
            rope_cos,
            rope_sin,
            jnp.float32(guidance_scale),
            jnp.float32(guidance_rescale if do_cfg else 0.0),
            jnp.float32(stg_scale),
            jnp.asarray(skip_mask),
            jax.random.PRNGKey(seed + 1),
            num_conds=num_conds,
            stochastic=stochastic,
            attn_impl=attn_impl,
            use_skip=bool(use_skip),
            rope_split=rope_split,
        )

    if output_type == "latent":
        return final

    # ---- decode ------------------------------------------------------------------
    if pipe.vae_params is None:
        raise ValueError("pipeline has no VAE params; use output_type='latent'")

    temb = None
    scale = None
    if vcfg.timestep_conditioning:
        dt = list(decode_timestep or [0.0])
        if len(dt) == 1:
            dt = dt * eff_batch
        dns = list(decode_noise_scale or dt)
        if len(dns) == 1:
            dns = dns * eff_batch
        temb = jnp.asarray(dt, jnp.float32)
        scale = jnp.asarray(dns, jnp.float32).reshape(eff_batch, 1, 1, 1, 1)

    if vcfg.timestep_conditioning and decode_noise is not None:
        # caller-supplied per-sample noise (serving uses this so batched
        # requests reproduce each row's single-request decode stream)
        lat5 = _prepare_decode(
            final, pipe.vae_params["latents_mean"],
            pipe.vae_params["latents_std"], jax.random.PRNGKey(0), scale,
            num_frames=latent_num_frames, height=latent_height,
            width=latent_width, patch_size=tcfg.patch_size,
            patch_size_t=tcfg.patch_size_t,
            scaling_factor=vcfg.scaling_factor, with_noise=False,
        )
        noise = jnp.asarray(decode_noise, lat5.dtype)
        lat5 = (1.0 - scale) * lat5 + scale * noise
    else:
        lat5 = _prepare_decode(
            final, pipe.vae_params["latents_mean"],
            pipe.vae_params["latents_std"], jax.random.PRNGKey(seed + 2),
            scale if scale is not None else jnp.float32(0.0),
            num_frames=latent_num_frames, height=latent_height,
            width=latent_width, patch_size=tcfg.patch_size,
            patch_size_t=tcfg.patch_size_t,
            scaling_factor=vcfg.scaling_factor,
            with_noise=bool(vcfg.timestep_conditioning),
        )

    if warmup_thread is not None:
        # the decode programs finish compiling before we dispatch for real —
        # a concurrent same-signature trace would compile twice
        warmup_thread.join()

    video = V.decode(
        pipe.vae_params, vcfg, lat5, temb,
        decode_fn=decode_fn,
        **decode_call_kwargs,
    )
    return _postprocess_jit(video)
