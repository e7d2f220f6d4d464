"""LTX-Video 3D DiT transformer — pure-functional JAX, TPU-first.

Architecture parity with the reference transformer (src/models/ltx_video/
ltx_transformer.rs:941-1173): proj_in → AdaLN-single time embedding →
caption projection → N transformer blocks (RMSNorm + 6-way AdaLN modulation,
RoPE'd self-attention, masked cross-attention, tanh-GELU FF) → final
scale/shift modulation → proj_out.

TPU-first design choices (deliberately not a port):
- blocks run as a single ``lax.scan`` over stacked block params (one
  compilation of the block regardless of depth),
- RoPE (cos, sin) tables are *inputs*, precomputed once per video shape —
  the reference recomputes them every forward (ltx_transformer.rs:1073),
- skip-layer logic (STG + permanent skip lists) is one [L, B] mask lerped
  inside the scan (ltx_transformer.rs:1093-1124 semantics: 1 = skip),
- linear weights are stored [in, out] so the hot path is plain ``x @ w``
  on the MXU in BF16.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.activations import gelu_tanh, silu
from ...ops.attention import attention
from ...ops.embeddings import sinusoidal_timestep_embedding
from ...ops.norms import layer_norm, rms_norm



@dataclasses.dataclass(frozen=True)
class LtxTransformerConfig:
    """Mirror of LtxVideoTransformer3DModelConfig (ltx_transformer.rs:22-59)."""

    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_attention_heads: int = 32
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    num_layers: int = 28
    qk_norm: str = "rms_norm_across_heads"
    norm_elementwise_affine: bool = False
    norm_eps: float = 1e-6
    caption_channels: int = 4096
    attention_bias: bool = True
    attention_out_bias: bool = True
    # RoPE bases (ltx_transformer.rs:976-984)
    rope_base_num_frames: int = 20
    rope_base_height: int = 2048
    rope_base_width: int = 2048
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------------------
# Parameter initialization (zeros/random; checkpoints overwrite via loader)
# ---------------------------------------------------------------------------


def _param_spec(cfg: LtxTransformerConfig):
    from ...utils.init_spec import normal, ones, zeros

    d = cfg.inner_dim
    L = cfg.num_layers
    inv_sqrt_d = 1.0 / math.sqrt(d)

    def lin(d_in, d_out, bias=True, std=0.02, lead=()):
        p = {"weight": normal((*lead, d_in, d_out), std)}
        if bias:
            p["bias"] = zeros((*lead, d_out))
        return p

    def attn_params(kv_dim, lead=()):
        return {
            "norm_q": {"weight": ones((*lead, d))},
            "norm_k": {"weight": ones((*lead, d))},
            "to_q": lin(d, d, cfg.attention_bias, lead=lead),
            "to_k": lin(kv_dim, d, cfg.attention_bias, lead=lead),
            "to_v": lin(kv_dim, d, cfg.attention_bias, lead=lead),
            "to_out": lin(d, d, cfg.attention_out_bias, lead=lead),
        }

    return {
        "proj_in": lin(cfg.in_channels, d),
        "time_embed": {
            "emb": {
                "timestep_embedder": {
                    "linear_1": lin(256, d),
                    "linear_2": lin(d, d),
                }
            },
            "linear": lin(d, 6 * d),
        },
        "caption_projection": {
            "linear_1": lin(cfg.caption_channels, d),
            "linear_2": lin(d, d),
        },
        # the [L, ...] block stacks are generated directly (no per-layer stack)
        "blocks": {
            "attn1": attn_params(d, lead=(L,)),
            "attn2": attn_params(d, lead=(L,)),
            "ff": {
                "net_0_proj": lin(d, 4 * d, lead=(L,)),
                "net_2": lin(4 * d, d, lead=(L,)),
            },
            "scale_shift_table": normal((L, 6, d), inv_sqrt_d),
        },
        "scale_shift_table": normal((2, d), inv_sqrt_d),
        "proj_out": lin(d, cfg.out_channels or cfg.in_channels),
    }


def init_params(key, cfg: LtxTransformerConfig, dtype=jnp.bfloat16):
    """Random-init parameter pytree (testing / shape contract).

    On TPU the whole tree is generated ON DEVICE by ONE jitted builder
    (utils/init_spec.materialize) — ~3 s warm-cache vs ~100-220 s for
    host-side NumPy generation of the 1.92B params (the bulk of the
    random-weights cold start on a single-core host).  Real checkpoints
    come through the loader instead.
    """
    from ...utils.init_spec import materialize

    return materialize(key, _param_spec(cfg), dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _apply_linear(p, x):
    if "weight_q" in p:
        return _apply_linear_w8a8(p, x)
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _apply_linear_w8a8(p, x):
    """W8A8 dynamic-activation int8 matmul (EXPERIMENTAL — do not use for
    speed yet).

    Weights are pre-quantized per-output-channel (symmetric int8, scales in
    ``w_scale``); activations quantize per token at runtime.  The isolated
    int8 matmul is 1.78x faster than BF16 on v5e, but at the XLA level the
    int32 accumulator + dequant epilogue do not fuse — the integrated path
    measured 5x SLOWER (1293 vs 265 ms/step).  Needs a fused Pallas
    quant-matmul-dequant kernel to pay off (docs/roadmap.md).  Numerics:
    ~1.4% relative error on random 2B weights.
    """
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        p["weight_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["w_scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _quantize_linear(p):
    w = np.asarray(p["weight"], np.float32)  # [in, out] (or [L, in, out])
    s = np.abs(w).max(axis=-2, keepdims=True) / 127.0  # per output channel
    s = np.maximum(s, 1e-8)
    w_q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    out = {
        "weight_q": jnp.asarray(w_q),
        "w_scale": jnp.asarray(np.squeeze(s, axis=-2), jnp.float32),
    }
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_transformer_params(params):
    """Quantize the hot block linears (QKVO + FF) to W8A8 int8.

    proj_in/out, time/caption embeds, and norms stay BF16 (small, or
    quality-critical).  Returns a new params pytree.
    """
    out = dict(params)
    blocks = dict(params["blocks"])

    def q_attn(attn):
        a = dict(attn)
        for name in ("to_q", "to_k", "to_v", "to_out"):
            a[name] = _quantize_linear(attn[name])
        return a

    blocks["attn1"] = q_attn(params["blocks"]["attn1"])
    blocks["attn2"] = q_attn(params["blocks"]["attn2"])
    ff = dict(params["blocks"]["ff"])
    ff["net_0_proj"] = _quantize_linear(ff["net_0_proj"])
    ff["net_2"] = _quantize_linear(ff["net_2"])
    blocks["ff"] = ff
    out["blocks"] = blocks
    return out


def permute_params_rope_split(params, cfg: LtxTransformerConfig):
    """Fold the split-rope lane permutation into the attn1 q/k projections.

    Attention scores are invariant under a lane permutation applied to BOTH
    q and k (v and the output are untouched), so permuting to_q/to_k weight
    columns, biases, and the norm_q/norm_k elementwise weights once at setup
    makes the projected q/k arrive in the split layout the packed kernel's
    compact-table rotation consumes (ops/rope.py::rope_split_permutation)
    — zero runtime cost, exact numerics.  Use together with
    ``forward(..., rope_split=rope_split_tables(cos, sin))``.
    """
    from ...ops.rope import rope_split_permutation

    perm = jnp.asarray(rope_split_permutation(cfg.inner_dim))

    def permute_lin(p):
        if "weight_q" in p:
            raise ValueError("split rope layout does not support W8A8 params")
        out = {"weight": p["weight"][..., perm]}
        if "bias" in p:
            out["bias"] = p["bias"][..., perm]
        return out

    a1 = dict(params["blocks"]["attn1"])
    a1["to_q"] = permute_lin(a1["to_q"])
    a1["to_k"] = permute_lin(a1["to_k"])
    a1["norm_q"] = {"weight": a1["norm_q"]["weight"][..., perm]}
    a1["norm_k"] = {"weight": a1["norm_k"]["weight"][..., perm]}
    blocks = dict(params["blocks"])
    blocks["attn1"] = a1
    out = dict(params)
    out["blocks"] = blocks
    return out


def _timestep_embedding(p, timestep, dtype):
    """AdaLayerNormSingle: sinusoid(256) → MLP → (temb 6D, embedded D).

    The sinusoid runs on the f32 timestep (diffusers semantics; the reference
    casts the timestep to BF16 first, ltx_transformer.rs:1051 — we keep the
    diffusers-parity ordering).
    """
    proj = sinusoidal_timestep_embedding(timestep, 256).astype(dtype)
    te = p["emb"]["timestep_embedder"]
    emb = _apply_linear(te["linear_2"], silu(_apply_linear(te["linear_1"], proj)))
    temb = _apply_linear(p["linear"], silu(emb))
    return temb, emb


def _ltx_attention(
    p,
    cfg: LtxTransformerConfig,
    hidden,
    encoder_hidden=None,
    bias=None,
    rope=None,
    attn_impl: str = "auto",
):
    """LTXVideoAttnProcessor semantics (ltx_transformer.rs:648-750):
    QK-RMSNorm (eps 1e-5, affine, across the full inner dim) → RoPE → SDPA.
    """
    b, s, _ = hidden.shape
    enc = hidden if encoder_hidden is None else encoder_hidden
    k_len = enc.shape[1]
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim

    q = _apply_linear(p["to_q"], hidden)
    k = _apply_linear(p["to_k"], enc)
    v = _apply_linear(p["to_v"], enc)

    q = rms_norm(q, p["norm_q"]["weight"], eps=1e-5)
    k = rms_norm(k, p["norm_k"]["weight"], eps=1e-5)

    q = q.reshape(b, s, h, hd)
    k = k.reshape(b, k_len, h, hd)
    v = v.reshape(b, k_len, h, hd)

    # rope (when set) is applied inside attention: in-VMEM in the packed
    # Pallas kernel, or as the standard XLA pass for other impls
    scale = 1.0 / math.sqrt(hd)
    out = attention(q, k, v, scale, bias=bias, impl=attn_impl, rope=rope)
    out = out.reshape(b, s, h * hd)
    return _apply_linear(p["to_out"], out)


def _block(
    p,
    cfg: LtxTransformerConfig,
    hidden,
    encoder_hidden,
    temb6,
    rope,
    enc_bias,
    skip_row,
    attn_impl: str,
):
    """One LtxVideoTransformerBlock (ltx_transformer.rs:820-937)."""
    b = hidden.shape[0]
    d = cfg.inner_dim
    orig = hidden

    # temb6 is [B, T, 6D] with T in {1, S}: T=1 broadcasts one modulation over
    # the sequence (t2v); T=S is per-token AdaLN (image-conditioned generation,
    # diffusers LTXImageToVideoPipeline semantics — each token carries its own
    # timestep, conditioned tokens run at t=0)
    ada = p["scale_shift_table"][None, None] + temb6.reshape(b, -1, 6, d)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        ada[:, :, i, :] for i in range(6)  # [B, T, D]
    ]

    norm_hidden = rms_norm(hidden, eps=cfg.norm_eps)
    norm_hidden = norm_hidden * (1.0 + scale_msa) + shift_msa
    attn1 = _ltx_attention(
        p["attn1"], cfg, norm_hidden, rope=rope, attn_impl=attn_impl
    )
    hidden = hidden + attn1 * gate_msa

    # cross-attention: no pre-norm, no RoPE, no gate
    attn2 = _ltx_attention(
        p["attn2"],
        cfg,
        hidden,
        encoder_hidden=encoder_hidden,
        bias=enc_bias,
        attn_impl=attn_impl,
    )
    hidden = hidden + attn2

    norm2 = rms_norm(hidden, eps=cfg.norm_eps)
    norm2 = norm2 * (1.0 + scale_mlp) + shift_mlp
    ff = _apply_linear(
        p["ff"]["net_2"], gelu_tanh(_apply_linear(p["ff"]["net_0_proj"], norm2))
    )
    hidden = hidden + ff * gate_mlp

    if skip_row is not None:
        # 1 = skip (restore pre-block state), 0 = keep
        m = skip_row.reshape(b, 1, 1).astype(hidden.dtype)
        hidden = hidden * (1.0 - m) + orig * m
    return hidden


def forward(
    params,
    cfg: LtxTransformerConfig,
    hidden_states,  # [B, S, in_channels]
    encoder_hidden_states,  # [B, K, caption_channels]
    timestep,  # [B] or [B, S] (per-token) f32, 0..num_train_timesteps scale
    rope_cos,  # [B or 1, S, inner_dim] f32 (precomputed)
    rope_sin,
    encoder_attention_mask=None,  # [B, K] 1=keep/0=pad, or None
    skip_layer_mask=None,  # [L, B] f32, 1=skip, or None
    attn_impl: str = "auto",
    rope_split=None,  # compact [c|s] table (rope_split_tables) — params must
    #                   be pre-permuted via permute_params_rope_split
):
    """Full DiT forward; returns [B, S, out_channels] in the model dtype."""
    dtype = params["proj_in"]["weight"].dtype
    x = _apply_linear(params["proj_in"], hidden_states.astype(dtype))
    enc = _apply_linear(
        params["caption_projection"]["linear_2"],
        gelu_tanh(
            _apply_linear(
                params["caption_projection"]["linear_1"],
                encoder_hidden_states.astype(dtype),
            )
        ),
    )

    temb6, embedded_timestep = _timestep_embedding(
        params["time_embed"], timestep.reshape(-1).astype(jnp.float32), dtype
    )
    # [B, T, ...] with T=1 (scalar timestep) or T=S (per-token timestep)
    b = hidden_states.shape[0]
    temb6 = temb6.reshape(b, -1, temb6.shape[-1])
    embedded_timestep = embedded_timestep.reshape(
        b, -1, embedded_timestep.shape[-1]
    )

    enc_bias = None
    if encoder_attention_mask is not None:
        mask = encoder_attention_mask.astype(jnp.float32)
        enc_bias = ((1.0 - mask) * -10000.0)[:, None, None, :]  # [B,1,1,K]

    rope = (rope_cos, rope_sin) if rope_split is None else ("split", rope_split)

    n_layers = cfg.num_layers
    if skip_layer_mask is None:
        skip_stack = None
    else:
        skip_stack = skip_layer_mask.astype(jnp.float32)

    def scan_body(carry, xs):
        if skip_stack is None:
            block_p = xs
            skip_row = None
        else:
            block_p, skip_row = xs
        out = _block(
            block_p, cfg, carry, enc, temb6, rope, enc_bias, skip_row, attn_impl
        )
        return out, None

    xs = params["blocks"] if skip_stack is None else (params["blocks"], skip_stack)
    x, _ = jax.lax.scan(scan_body, x, xs, length=n_layers)

    # final modulation (ltx_transformer.rs:1126-1161); per-token when T=S
    d = cfg.inner_dim
    table = params["scale_shift_table"].astype(embedded_timestep.dtype)
    scale_shift = table[None, None] + embedded_timestep[:, :, None, :]  # [B,T,2,D]
    shift, scale = scale_shift[:, :, 0, :], scale_shift[:, :, 1, :]

    x = layer_norm(x, eps=1e-6)
    x = x * (1.0 + scale) + shift
    return _apply_linear(params["proj_out"], x)


def build_skip_layer_mask(
    num_layers: int,
    batch: int,
    skip_blocks,
) -> np.ndarray:
    """[L, B] STG perturbation mask: 1 = skip (t2v_pipeline.rs:910-923)."""
    mask = np.zeros((num_layers, batch), dtype=np.float32)
    for idx in skip_blocks or ():
        if 0 <= idx < num_layers:
            mask[idx, :] = 1.0
    return mask
