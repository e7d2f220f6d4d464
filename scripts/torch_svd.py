"""Independent torch-CPU mirror of the diffusers SVD UNet (fixture generator).

Counterpart of scripts/torch_ltx*.py for the SVD family; module names follow
the diffusers UNetSpatioTemporalConditionModel checkpoint layout.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim):
    half = dim // 2
    exponent = torch.arange(half, dtype=torch.float32) * (
        -math.log(10000.0) / (half - 1)
    )
    emb = t.float()[:, None] * exponent.exp()[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_ch, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_ch, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, c_in, c_out, temb_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, c_in, eps=1e-6)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, c_out, eps=1e-6)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, c_out)
        self.conv_shortcut = nn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + res


class TemporalResnetBlock(nn.Module):
    def __init__(self, c_in, c_out, temb_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, c_in, eps=1e-6)
        self.conv1 = nn.Conv3d(c_in, c_out, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(32, c_out, eps=1e-6)
        self.conv2 = nn.Conv3d(c_out, c_out, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb_ch, c_out)

    def forward(self, x, temb, num_frames):
        bt, c, hh, ww = x.shape
        b = bt // num_frames

        def tconv(conv, y):
            y5 = y.view(b, num_frames, -1, hh, ww).permute(0, 2, 1, 3, 4)
            y5 = conv(y5)
            return y5.permute(0, 2, 1, 3, 4).reshape(bt, -1, hh, ww)

        h = tconv(self.conv1, F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = tconv(self.conv2, F.silu(self.norm2(h)))
        return h + x


class AlphaBlender(nn.Module):
    def __init__(self):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([0.5]))

    def forward(self, spatial, temporal, temporal_first=False):
        a = torch.sigmoid(self.mix_factor)
        if temporal_first:
            return temporal * a + spatial * (1 - a)
        return spatial * a + temporal * (1 - a)


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, c_in, c_out, temb_ch):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(c_in, c_out, temb_ch)
        self.temporal_res_block = TemporalResnetBlock(c_out, c_out, temb_ch)
        self.time_mixer = AlphaBlender()

    def forward(self, x, temb, num_frames):
        hs = self.spatial_res_block(x, temb)
        ht = self.temporal_res_block(hs, temb, num_frames)
        return self.time_mixer(hs, ht)


class Attention(nn.Module):
    def __init__(self, dim, heads, kv_dim=None):
        super().__init__()
        self.heads = heads
        kv_dim = kv_dim or dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, s, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float()).to(x.dtype)
        return self.to_out[0](out.transpose(1, 2).reshape(b, s, d))


class GEGLUFF(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        net0 = nn.Module()
        net0.proj = nn.Linear(dim, inner * 2)
        self.net = nn.ModuleList([net0, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        gate, value = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](F.gelu(gate) * value)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, cross_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = Attention(dim, heads, cross_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = GEGLUFF(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TemporalBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, cross_dim):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim, eps=1e-5)
        self.ff_in = GEGLUFF(dim)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = Attention(dim, heads, cross_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = GEGLUFF(dim)

    def forward(self, x, time_ctx, num_frames):
        bt, s, d = x.shape
        b = bt // num_frames
        h = x.view(b, num_frames, s, d).permute(0, 2, 1, 3).reshape(b * s, num_frames, d)
        h = h + self.ff_in(self.norm_in(h))
        h = h + self.attn1(self.norm1(h))
        h = h + self.attn2(self.norm2(h), time_ctx)
        h = h + self.ff(self.norm3(h))
        return h.view(b, s, num_frames, d).permute(0, 2, 1, 3).reshape(bt, s, d)


class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, dim, heads, cross_dim, num_layers=1):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.norm = nn.GroupNorm(32, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, heads, cross_dim) for _ in range(num_layers)]
        )
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(dim, heads, cross_dim) for _ in range(num_layers)]
        )
        self.time_pos_embed = TimestepEmbedding(dim, dim * 4)
        # diffusers TimestepEmbedding(dim, dim*4, out_dim=dim):
        self.time_pos_embed.linear_2 = nn.Linear(dim * 4, dim)
        self.time_mixer = AlphaBlender()
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx, num_frames):
        bt, c, hh, ww = x.shape
        b = bt // num_frames
        residual = x
        time_ctx = None
        if ctx is not None:
            d = ctx.shape[-1]
            first = ctx.view(b, num_frames, -1, d)[:, 0]
            time_ctx = first[:, None].repeat(1, hh * ww, 1, 1).view(b * hh * ww, -1, d)

        h = self.norm(x).view(bt, c, hh * ww).transpose(1, 2)
        h = self.proj_in(h)

        frame_idx = torch.arange(num_frames, dtype=torch.float32).repeat(b)
        emb = self.time_pos_embed(timestep_embedding(frame_idx, c))[:, None]

        for sp, tp in zip(self.transformer_blocks, self.temporal_transformer_blocks):
            hs = sp(h, ctx)
            ht = tp(hs + emb, time_ctx, num_frames)
            h = self.time_mixer(hs, ht, temporal_first=True)

        h = self.proj_out(h)
        return h.transpose(1, 2).view(bt, c, hh, ww) + residual


class UNetSpatioTemporal(nn.Module):
    """Compact configurable SVD UNet (diffusers layout)."""

    def __init__(self, in_channels=8, out_channels=4, block_out_channels=(32, 64),
                 layers_per_block=1, cross_dim=16, heads=(2, 4),
                 addition_time_embed_dim=8):
        super().__init__()
        boc = list(block_out_channels)
        ted = boc[0] * 4
        self.boc, self.heads = boc, heads
        self.conv_in = nn.Conv2d(in_channels, boc[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(boc[0], ted)
        self.add_embedding = TimestepEmbedding(addition_time_embed_dim * 3, ted)
        self.addition_time_embed_dim = addition_time_embed_dim

        self.down_blocks = nn.ModuleList()
        ch = boc[0]
        skips = [boc[0]]
        for i, out_ch in enumerate(boc):
            is_final = i == len(boc) - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = None if is_final else nn.ModuleList()
            for j in range(layers_per_block):
                blk.resnets.append(SpatioTemporalResBlock(ch if j == 0 else out_ch, out_ch, ted))
                if not is_final:
                    blk.attentions.append(
                        TransformerSpatioTemporalModel(out_ch, heads[i], cross_dim)
                    )
                skips.append(out_ch)
            if not is_final:
                blk.downsamplers = nn.ModuleList(
                    [nn.Module()]
                )
                blk.downsamplers[0].conv = nn.Conv2d(out_ch, out_ch, 3, 2, 1)
                skips.append(out_ch)
            self.down_blocks.append(blk)
            ch = out_ch

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(ch, ch, ted), SpatioTemporalResBlock(ch, ch, ted)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModel(ch, heads[-1], cross_dim)]
        )

        self.up_blocks = nn.ModuleList()
        rev_heads = list(reversed(heads))
        rboc = list(reversed(boc))
        prev = ch
        for i, out_ch in enumerate(rboc):
            is_first = i == 0
            is_last = i == len(rboc) - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = None if is_first else nn.ModuleList()
            for j in range(layers_per_block + 1):
                skip_ch = skips.pop()
                blk.resnets.append(SpatioTemporalResBlock(prev + skip_ch, out_ch, ted))
                prev = out_ch
                if not is_first:
                    blk.attentions.append(
                        TransformerSpatioTemporalModel(out_ch, rev_heads[i], cross_dim)
                    )
            if not is_last:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, boc[0], eps=1e-6)
        self.conv_out = nn.Conv2d(boc[0], out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids, num_frames):
        bt = sample.shape[0]
        b = bt // num_frames
        t = timestep.float().expand(b)
        emb = self.time_embedding(timestep_embedding(t, self.boc[0]))
        aug = torch.cat(
            [timestep_embedding(added_time_ids[:, i], self.addition_time_embed_dim)
             for i in range(3)], dim=-1)
        emb = emb + self.add_embedding(aug)
        emb = emb.repeat_interleave(num_frames, dim=0)

        h = self.conv_in(sample)
        stack = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, emb, num_frames)
                if blk.attentions is not None:
                    h = blk.attentions[j](h, encoder_hidden_states, num_frames)
                stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                stack.append(h)

        h = self.mid_block.resnets[0](h, emb, num_frames)
        h = self.mid_block.attentions[0](h, encoder_hidden_states, num_frames)
        h = self.mid_block.resnets[1](h, emb, num_frames)

        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, stack.pop()], dim=1)
                h = r(h, emb, num_frames)
                if blk.attentions is not None:
                    h = blk.attentions[j](h, encoder_hidden_states, num_frames)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        h = F.silu(self.conv_norm_out(h))
        return self.conv_out(h)
