"""Independent torch-CPU mirror of the diffusers LTX-Video modules.

Role: golden-fixture generator for parity tests — the same role the
reference's scripts/ directory plays with diffusers (e.g.
scripts/gen_dit_ref.py, scripts/capture_transformer_parity.py).  diffusers is
not installed in this environment, so this file re-derives the module math
from the diffusers semantics documented in the reference survey; it is a
*second, independent implementation* (torch) that the JAX code is tested
against.

Weight names follow the diffusers checkpoint layout so these modules double
as loader-path fixtures.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6, affine=True):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim)) if affine else None

    def forward(self, x):
        dt = x.dtype
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        y = y.to(dt)
        if self.weight is not None:
            y = y * self.weight.to(dt)
        return y


def timestep_embedding(t, dim=256, max_period=10000.0):
    """flip_sin_to_cos=True, downscale_freq_shift=0 -> [cos, sin]."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_ch, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_ch, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class AdaLayerNormSingle(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.emb = nn.Module()
        self.emb.timestep_embedder = TimestepEmbedding(256, dim)
        self.linear = nn.Linear(dim, 6 * dim)

    def forward(self, timestep, dtype):
        proj = timestep_embedding(timestep, 256).to(dtype)
        emb = self.emb.timestep_embedder(proj)
        return self.linear(F.silu(emb)), emb


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden)
        self.linear_2 = nn.Linear(hidden, hidden)

    def forward(self, x):
        return self.linear_2(F.gelu(self.linear_1(x), approximate="tanh"))


def rope_cos_sin(grid, dim, theta=10000.0):
    """grid [B, S, 3] normalized; returns cos/sin [B, S, dim]."""
    steps = dim // 6
    lin = torch.linspace(0, 1, steps, dtype=torch.float32)
    freqs = (theta**lin) * (math.pi / 2)
    g = grid.float().unsqueeze(-1) * 2 - 1  # [B,S,3,1]
    ang = g * freqs  # [B,S,3,steps]
    ang = ang.transpose(-1, -2).flatten(2)  # [B,S,3*steps]
    cos = ang.cos().repeat_interleave(2, dim=-1)
    sin = ang.sin().repeat_interleave(2, dim=-1)
    rem = dim % 6
    if rem:
        cos = torch.cat([torch.ones(*cos.shape[:-1], rem), cos], dim=-1)
        sin = torch.cat([torch.zeros(*sin.shape[:-1], rem), sin], dim=-1)
    return cos, sin


def apply_rotary_emb(x, cos, sin):
    dt = x.dtype
    xf = x.float()
    b, s, c = xf.shape
    x2 = xf.view(b, s, c // 2, 2)
    x_rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).view(b, s, c)
    return (xf * cos.float() + x_rot * sin.float()).to(dt)


class LtxAttention(nn.Module):
    def __init__(self, query_dim, heads, dim_head, cross_dim=None, bias=True, out_bias=True):
        super().__init__()
        inner = heads * dim_head
        cross_dim = cross_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.norm_q = RMSNorm(inner, eps=1e-5, affine=True)
        self.norm_k = RMSNorm(inner, eps=1e-5, affine=True)
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(cross_dim, inner, bias=bias)
        self.to_v = nn.Linear(cross_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=out_bias)])

    def forward(self, x, enc=None, mask=None, rope=None):
        b, s, _ = x.shape
        enc = x if enc is None else enc
        q, k, v = self.to_q(x), self.to_k(enc), self.to_v(enc)
        q, k = self.norm_q(q), self.norm_k(k)
        if rope is not None:
            q = apply_rotary_emb(q, *rope)
            k = apply_rotary_emb(k, *rope)
        q = q.view(b, s, self.heads, self.dim_head).transpose(1, 2)
        k = k.view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        v = v.view(b, -1, self.heads, self.dim_head).transpose(1, 2)
        bias = None
        if mask is not None:  # [B, K] 1=keep
            bias = ((1.0 - mask.float()) * -10000.0)[:, None, None, :]
        out = F.scaled_dot_product_attention(
            q.float(), k.float(), v.float(), attn_mask=bias,
            scale=1.0 / math.sqrt(self.dim_head),
        ).to(x.dtype)
        out = out.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](out)


class LtxTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim, eps=1e-6):
        super().__init__()
        self.norm1 = RMSNorm(dim, eps, affine=False)
        self.attn1 = LtxAttention(dim, heads, dim_head)
        self.norm2 = RMSNorm(dim, eps, affine=False)
        self.attn2 = LtxAttention(dim, heads, dim_head, cross_dim=cross_dim)
        self.ff = nn.Module()
        net0 = nn.Module()
        net0.proj = nn.Linear(dim, 4 * dim)
        self.ff.net = nn.ModuleList([net0, nn.Identity(), nn.Linear(4 * dim, dim)])
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, x, enc, temb, rope, enc_mask=None):
        b = x.shape[0]
        d = x.shape[-1]
        # temb [B, T, 6D], T in {1, S}: per-token AdaLN when T=S (i2v)
        ada = self.scale_shift_table[None, None] + temb.view(b, -1, 6, d)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada.unbind(2)

        h = self.norm1(x) * (1 + scale_msa) + shift_msa
        x = x + self.attn1(h, rope=rope) * gate_msa
        x = x + self.attn2(x, enc=enc, mask=enc_mask)
        h = self.norm2(x) * (1 + scale_mlp) + shift_mlp
        ff = self.ff.net[2](F.gelu(self.ff.net[0].proj(h), approximate="tanh"))
        return x + ff * gate_mlp


class LtxTransformer3D(nn.Module):
    """Compact diffusers-layout LTX DiT (random init; fixture generator)."""

    def __init__(
        self,
        in_channels=128,
        out_channels=128,
        heads=32,
        dim_head=64,
        cross_attention_dim=2048,
        num_layers=28,
        caption_channels=4096,
        base_nf=20,
        base_h=2048,
        base_w=2048,
        theta=10000.0,
    ):
        super().__init__()
        d = heads * dim_head
        self.inner_dim, self.heads, self.dim_head = d, heads, dim_head
        self.bases = (base_nf, base_h, base_w)
        self.theta = theta
        self.proj_in = nn.Linear(in_channels, d)
        self.scale_shift_table = nn.Parameter(torch.randn(2, d) / d**0.5)
        self.time_embed = AdaLayerNormSingle(d)
        self.caption_projection = PixArtAlphaTextProjection(caption_channels, d)
        self.transformer_blocks = nn.ModuleList(
            [
                LtxTransformerBlock(d, heads, dim_head, cross_attention_dim)
                for _ in range(num_layers)
            ]
        )
        self.proj_out = nn.Linear(d, out_channels)

    def forward(
        self,
        hidden_states,
        encoder_hidden_states,
        timestep,
        video_coords,  # [B, S, 3] raw coords; normalized by bases here
        encoder_attention_mask=None,
        skip_layer_mask=None,  # [L, B], 1 = skip
    ):
        x = self.proj_in(hidden_states)
        b = x.shape[0]
        # timestep [B] (scalar) or [B, S] (per-token, i2v)
        temb, embedded = self.time_embed(timestep.flatten(), x.dtype)
        temb = temb.view(b, -1, temb.shape[-1])
        embedded = embedded.view(b, -1, embedded.shape[-1])
        enc = self.caption_projection(encoder_hidden_states)

        bnf, bh, bw = self.bases
        grid = video_coords.float() / torch.tensor([bnf, bh, bw]).float()
        rope = rope_cos_sin(grid, self.inner_dim, self.theta)

        for i, blk in enumerate(self.transformer_blocks):
            orig = x
            x = blk(x, enc, temb, rope, encoder_attention_mask)
            if skip_layer_mask is not None:
                m = skip_layer_mask[i].view(-1, 1, 1).to(x.dtype)
                x = x * (1 - m) + orig * m

        ss = self.scale_shift_table[None, None] + embedded[:, :, None, :]
        shift, scale = ss[:, :, 0], ss[:, :, 1]
        x = F.layer_norm(x, (x.shape[-1],), eps=1e-6)
        x = x * (1 + scale) + shift
        return self.proj_out(x)
