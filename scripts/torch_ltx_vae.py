"""Independent torch-CPU mirror of the diffusers LTX-Video 3D causal VAE.

Fixture generator for VAE parity tests (stands in for diffusers, which is not
installed) — the counterpart of the reference's scripts/gen_vae_ref.py /
capture_vae_parity.py.  Module/parameter names follow the diffusers
checkpoint layout.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ltx import timestep_embedding


def rms_norm_cf(x, eps=1e-8):
    xf = x.float()
    y = xf * torch.rsqrt(xf.pow(2).mean(1, keepdim=True) + eps)
    return y.to(x.dtype)


class CausalConv3d(nn.Module):
    def __init__(self, c_in, c_out, kernel=3, stride=1, causal=True):
        super().__init__()
        k = (kernel,) * 3 if isinstance(kernel, int) else kernel
        s = (stride,) * 3 if isinstance(stride, int) else stride
        self.kt = k[0]
        self.causal = causal
        self.conv = nn.Conv3d(c_in, c_out, k, stride=s, padding=(0, k[1] // 2, k[2] // 2))

    def forward(self, x):
        if self.kt > 1:
            if self.causal:
                pad = (0, 0, 0, 0, self.kt - 1, 0)
            else:
                side = (self.kt - 1) // 2
                pad = (0, 0, 0, 0, side, side)
            x = F.pad(x, pad, mode="replicate")
        return self.conv(x)


class TimestepEmbedder(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.timestep_embedder = nn.Module()
        self.timestep_embedder.linear_1 = nn.Linear(256, dim)
        self.timestep_embedder.linear_2 = nn.Linear(dim, dim)

    def forward(self, t, dtype):
        proj = timestep_embedding(t, 256).to(dtype)
        h = F.silu(self.timestep_embedder.linear_1(proj))
        return self.timestep_embedder.linear_2(h)


class ResnetBlock3d(nn.Module):
    def __init__(self, c_in, c_out, eps=1e-6, causal=True, timestep_conditioning=False):
        super().__init__()
        self.causal = causal
        self.conv1 = CausalConv3d(c_in, c_out, 3, 1, causal)
        self.conv2 = CausalConv3d(c_out, c_out, 3, 1, causal)
        self.eps = eps
        if c_in != c_out:
            self.conv_shortcut = CausalConv3d(c_in, c_out, 1, 1, causal)
        else:
            self.conv_shortcut = None
        if timestep_conditioning:
            self.scale_shift_table = nn.Parameter(torch.randn(4, c_in) / c_in**0.5)
        else:
            self.scale_shift_table = None

    def forward(self, x, temb=None):
        h = rms_norm_cf(x)
        if self.scale_shift_table is not None and temb is not None:
            b, c = temb.shape[0], self.scale_shift_table.shape[1]
            t = temb.view(b, 4, c, 1, 1, 1) + self.scale_shift_table[None, :, :, None, None, None]
            shift1, scale1, shift2, scale2 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
            h = h * (1 + scale1) + shift1
        h = F.silu(h)
        h = self.conv1(h)
        h = rms_norm_cf(h)
        if self.scale_shift_table is not None and temb is not None:
            h = h * (1 + scale2) + shift2
        h = F.silu(h)
        h = self.conv2(h)
        sc = x
        if self.conv_shortcut is not None:
            sc = F.layer_norm(
                sc.permute(0, 2, 3, 4, 1), (sc.shape[1],), eps=self.eps
            ).permute(0, 4, 1, 2, 3)
            sc = self.conv_shortcut(sc)
        return h + sc


class Downsampler3d(nn.Module):
    """pixel-unshuffle + grouped-mean residual."""

    def __init__(self, c_in, c_out, stride, causal=True):
        super().__init__()
        st, sh, sw = stride
        self.stride = stride
        self.group_size = c_in * st * sh * sw // c_out
        self.conv = CausalConv3d(c_in, c_out // (st * sh * sw), 3, 1, causal)

    def forward(self, x):
        st, sh, sw = self.stride
        b, c, t, h, w = x.shape
        if st > 1:
            x = torch.cat([x[:, :, : st - 1], x], dim=2)
        tp = x.shape[2]
        tn, hn, wn = tp // st, h // sh, w // sw

        def unshuffle(y):
            cy = y.shape[1]
            y = y.view(b, cy, tn, st, hn, sh, wn, sw)
            y = y.permute(0, 1, 3, 5, 7, 2, 4, 6)
            return y.reshape(b, cy * st * sh * sw, tn, hn, wn)

        res = unshuffle(x)
        res = res.view(b, -1, self.group_size, tn, hn, wn).mean(2)
        hid = unshuffle(self.conv(x))
        return hid + res


class Upsampler3d(nn.Module):
    def __init__(self, c_in, c_out, stride=(2, 2, 2), causal=True, residual=True):
        super().__init__()
        st, sh, sw = stride
        self.stride = stride
        self.residual = residual
        conv_out = c_out * st * sh * sw
        self.channel_repeats = conv_out // c_in
        self.conv = CausalConv3d(c_in, conv_out, 3, 1, causal)

    def _d2s(self, y):
        st, sh, sw = self.stride
        b, c, t, h, w = y.shape
        co = c // (st * sh * sw)
        y = y.view(b, co, st, sh, sw, t, h, w)
        y = y.permute(0, 1, 5, 2, 6, 3, 7, 4)
        return y.reshape(b, co, t * st, h * sh, w * sw)

    def forward(self, x):
        st = self.stride[0]
        res = None
        if self.residual:
            res = self._d2s(x)
            if self.channel_repeats > 1:
                res = res.repeat(1, self.channel_repeats, 1, 1, 1)
            res = res[:, :, st - 1 :]
        h = self._d2s(self.conv(x))[:, :, st - 1 :]
        return h + res if res is not None else h


class Encoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        p, pt = cfg["patch_size"], cfg["patch_size_t"]
        boc = cfg["block_out_channels"]
        self.conv_in = CausalConv3d(cfg["in_channels"] * p * p * pt, boc[0], 3, 1, True)
        self.down_blocks = nn.ModuleList()
        for i in range(len(boc) - 1):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock3d(boc[i], boc[i], causal=True) for _ in range(cfg["layers_per_block"][i])]
            )
            if cfg["spatiotemporal_scaling"][i]:
                stride = {"spatial": (1, 2, 2), "temporal": (2, 1, 1), "spatiotemporal": (2, 2, 2)}[
                    cfg["downsample_types"][i]
                ]
                blk.downsamplers = nn.ModuleList([Downsampler3d(boc[i], boc[i + 1], stride)])
            else:
                blk.downsamplers = None
            self.down_blocks.append(blk)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock3d(boc[-1], boc[-1], causal=True)
             for _ in range(cfg["layers_per_block"][-1] - 1)]
        )
        self.conv_out = CausalConv3d(boc[-1], cfg["latent_channels"] + 1, 3, 1, True)

    def patchify(self, x):
        p, pt = self.cfg["patch_size"], self.cfg["patch_size_t"]
        b, c, f, h, w = x.shape
        x = x.view(b, c, f // pt, pt, h // p, p, w // p, p)
        x = x.permute(0, 1, 3, 7, 5, 2, 4, 6)
        return x.reshape(b, c * pt * p * p, f // pt, h // p, w // p)

    def forward(self, x):
        h = self.conv_in(self.patchify(x))
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
        for r in self.mid_block.resnets:
            h = r(h)
        h = rms_norm_cf(h)
        h = F.silu(h)
        h = self.conv_out(h)
        ch = h.shape[1]
        last = h[:, ch - 1 : ch]
        return torch.cat([h, last.repeat(1, ch - 2, 1, 1, 1)], dim=1)


class Decoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        boc = list(cfg["decoder_block_out_channels"])[::-1]
        lpb = list(cfg["decoder_layers_per_block"])[::-1]
        sts = list(cfg["decoder_spatiotemporal_scaling"])[::-1]
        upr = list(cfg["decoder_upsample_residual"])[::-1]
        upf = list(cfg["decoder_upsample_factor"])[::-1]
        tc = cfg["timestep_conditioning"]
        causal = cfg["decoder_causal"]
        self.causal = causal

        self.conv_in = CausalConv3d(cfg["latent_channels"], boc[0], 3, 1, causal)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock3d(boc[0], boc[0], causal=causal, timestep_conditioning=tc)
             for _ in range(lpb[0])]
        )
        if tc:
            self.mid_block.time_embedder = TimestepEmbedder(boc[0] * 4)

        self.up_blocks = nn.ModuleList()
        for i in range(len(boc)):
            out_ch = boc[i] // upf[i]
            blk = nn.Module()
            stride = (2, 2, 2) if sts[i] else (1, 2, 2)
            blk.upsamplers = nn.ModuleList(
                [Upsampler3d(out_ch * upf[i], out_ch, stride, causal, upr[i])]
            )
            blk.resnets = nn.ModuleList(
                [ResnetBlock3d(out_ch, out_ch, causal=causal, timestep_conditioning=tc)
                 for _ in range(lpb[i + 1])]
            )
            if tc:
                blk.time_embedder = TimestepEmbedder(out_ch * 4)
            self.up_blocks.append(blk)
            final_ch = out_ch

        p, pt = cfg["patch_size"], cfg["patch_size_t"]
        self.conv_out = CausalConv3d(final_ch, cfg["out_channels"] * p * p, 3, 1, causal)
        if tc:
            self.time_embedder = TimestepEmbedder(final_ch * 2)
            self.scale_shift_table = nn.Parameter(torch.randn(2, final_ch) / final_ch**0.5)
            self.timestep_scale_multiplier = nn.Parameter(torch.tensor(1000.0))

    def unpatchify(self, x):
        p, pt = self.cfg["patch_size"], self.cfg["patch_size_t"]
        b, c, f, h, w = x.shape
        oc = c // (pt * p * p)
        x = x.view(b, oc, pt, p, p, f, h, w)
        x = x.permute(0, 1, 5, 2, 6, 4, 7, 3)
        return x.reshape(b, oc, f * pt, h * p, w * p)

    def forward(self, z, temb=None):
        h = self.conv_in(z)
        ts = None
        if temb is not None:
            ts = temb.flatten().float() * self.timestep_scale_multiplier

        def btemb(blk, width):
            if ts is None or not hasattr(blk, "time_embedder"):
                return None
            e = blk.time_embedder(ts, h.dtype)
            return e.view(e.shape[0], width * 4, 1, 1, 1)

        mt = btemb(self.mid_block, h.shape[1])
        for r in self.mid_block.resnets:
            h = r(h, mt)
        for blk in self.up_blocks:
            h = blk.upsamplers[0](h)
            ut = btemb(blk, h.shape[1])
            for r in blk.resnets:
                h = r(h, ut)
        h = rms_norm_cf(h)
        if ts is not None:
            e = self.time_embedder(ts, h.dtype)
            c = self.scale_shift_table.shape[1]
            e = e.view(-1, 2, c) + self.scale_shift_table[None]
            shift, scale = e[:, 0, :, None, None, None], e[:, 1, :, None, None, None]
            h = h * (1 + scale) + shift
        h = F.silu(h)
        return self.unpatchify(self.conv_out(h))


TINY_VAE_CFG = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=[8, 16, 32],
    decoder_block_out_channels=[8, 16],
    spatiotemporal_scaling=[True, True],
    decoder_spatiotemporal_scaling=[True, True],
    layers_per_block=[1, 1, 2],
    decoder_layers_per_block=[1, 1, 1],
    patch_size=2,
    patch_size_t=1,
    downsample_types=["spatial", "spatiotemporal"],
    decoder_upsample_residual=[True, True],
    decoder_upsample_factor=[2, 2],
    timestep_conditioning=True,
    decoder_causal=False,
    spatial_compression_ratio=8,  # patch 2 * 2 downs with spatial scaling... see test
    temporal_compression_ratio=2,
)
