"""Torch mirror of the SVD AutoencoderKLTemporalDecoder (fixture generator)."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_svd import AlphaBlender


class ResnetBlock2D(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, c_in, eps=1e-6)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, c_out, eps=1e-6)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + res


class TemporalResnetBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, c, eps=1e-6)
        self.conv1 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(32, c, eps=1e-6)
        self.conv2 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x, num_frames):
        bt, c, hh, ww = x.shape
        b = bt // num_frames

        def tconv(conv, y):
            y5 = y.view(b, num_frames, -1, hh, ww).permute(0, 2, 1, 3, 4)
            return conv(y5).permute(0, 2, 1, 3, 4).reshape(bt, -1, hh, ww)

        h = tconv(self.conv1, F.silu(self.norm1(x)))
        h = tconv(self.conv2, F.silu(self.norm2(h)))
        return h + x


class STResBlock(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(c_in, c_out)
        self.temporal_res_block = TemporalResnetBlock(c_out)
        self.time_mixer = AlphaBlender()

    def forward(self, x, num_frames):
        hs = self.spatial_res_block(x)
        ht = self.temporal_res_block(hs, num_frames)
        return self.time_mixer(hs, ht)


class AttentionBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        att = torch.softmax(q @ k.transpose(1, 2) * c**-0.5, dim=-1)
        out = self.to_out[0](att @ v)
        return out.transpose(1, 2).view(b, c, h, w) + x


class Encoder(nn.Module):
    def __init__(self, in_ch=3, latent=4, boc=(32, 64), layers=1):
        super().__init__()
        self.conv_in = nn.Conv2d(in_ch, boc[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = boc[0]
        for i, out_ch in enumerate(boc):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock2D(ch if j == 0 else out_ch, out_ch) for j in range(layers)]
            )
            if i < len(boc) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(out_ch, out_ch, 3, 2, 0)
            self.down_blocks.append(blk)
            ch = out_ch
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([ResnetBlock2D(ch, ch), ResnetBlock2D(ch, ch)])
        self.mid_block.attentions = nn.ModuleList([AttentionBlock(ch)])
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TemporalDecoder(nn.Module):
    def __init__(self, latent=4, out_ch=3, boc=(32, 64), layers=1):
        super().__init__()
        rboc = list(reversed(boc))
        self.conv_in = nn.Conv2d(latent, rboc[0], 3, padding=1)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [STResBlock(rboc[0], rboc[0]) for _ in range(layers + 1)]
        )
        self.mid_block.attentions = nn.ModuleList([AttentionBlock(rboc[0])])
        self.up_blocks = nn.ModuleList()
        prev = rboc[0]
        for i, out in enumerate(rboc):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [STResBlock(prev if j == 0 else out, out) for j in range(layers + 1)]
            )
            prev = out
            if i < len(rboc) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(out, out, 3, padding=1)
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(32, boc[0], eps=1e-6)
        self.conv_out = nn.Conv2d(boc[0], out_ch, 3, padding=1)
        self.time_conv_out = nn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h, num_frames)
        for attn, r in zip(self.mid_block.attentions, self.mid_block.resnets[1:]):
            h = attn(h)
            h = r(h, num_frames)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h, num_frames)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        bt, c, hh, ww = h.shape
        b = bt // num_frames
        h5 = h.view(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        h5 = self.time_conv_out(h5)
        return h5.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)


class AutoencoderKLTemporalDecoder(nn.Module):
    def __init__(self, boc=(32, 64), latent=4, layers=1):
        super().__init__()
        self.encoder = Encoder(3, latent, boc, layers)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.decoder = TemporalDecoder(latent, 3, boc, layers)
