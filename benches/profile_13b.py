"""Decompose the 13B denoise step: where do the ~960 ms go?

Runs component scans at the exact 13B production shapes (48L, d=4096,
32x128 heads, S=4992, W8A16 block linears) on the real chip:

  full      — the real _block scan (one forward ~= one denoise step)
  noattn    — _block with both attention kernels replaced by identity on
              the post-projection tensors (matmuls + norms + epilogues)
  selfk     — packed self-attention kernel only (q,k,v fixed), scanned 48x
  ff        — FF pair only (4096->16384->4096), W8A16 auto
  qkvo      — 4 self-attn projections (4096->4096), W8A16 auto
  crossqo   — cross-attn q,o projections + 128-token k/v/attn

Each variant carries the activation through the scan so iterations are
serialized.  Usage: python -m benches.profile_13b [--variants full,ff,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[p13b +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
    np.asarray(leaf[idx])


def timed(fn, n=3):
    fetch(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="full,noattn,selfk,ff,qkvo,crossqo")
    args = ap.parse_args()
    variants = args.variants.split(",")

    from candle_video_tpu.models.ltx_video import configs as C
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.ops.rope import rope_cos_sin, rope_split_tables
    from candle_video_tpu.ops.attention import attention

    full_cfg = C.v0_9_8_distilled_13b()
    cfg = full_cfg.transformer
    f, h, w = 13, 16, 24
    s = f * h * w
    d = cfg.inner_dim
    L = cfg.num_layers
    log(f"cfg: {L}L d={d} heads={cfg.num_attention_heads}x"
        f"{cfg.attention_head_dim} S={s}")

    params = TF.init_params_w8(jax.random.PRNGKey(0), cfg, qblock=128)
    jax.block_until_ready(params)
    log(f"params: {sum(x.nbytes for x in jax.tree.leaves(params))/2**30:.2f} GiB")

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, s, d)) * 0.02, jnp.bfloat16)
    enc = jnp.asarray(rng.normal(size=(1, 128, d)) * 0.02, jnp.bfloat16)
    temb6 = jnp.asarray(rng.normal(size=(1, 1, 6 * d)) * 0.02, jnp.bfloat16)

    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32)
    cos, sin = rope_cos_sin(grid, d, cfg.rope_theta)
    rope_split = rope_split_tables(cos, sin)
    rope = ("split", rope_split)

    blocks = params["blocks"]

    def scanner(body, xs):
        @jax.jit
        def run(x, xs):
            out, _ = jax.lax.scan(body, x, xs, length=L)
            return out
        return functools.partial(run, x0, xs)

    results = {}

    if "full" in variants:
        def body(carry, bp):
            return TF._block(bp, cfg, carry, enc, temb6, rope, None, None,
                             "auto"), None
        results["full"] = timed(scanner(body, blocks))

    if "noattn" in variants:
        def body(carry, bp):
            hidden = carry
            ada = bp["scale_shift_table"][None, None] + temb6.reshape(1, -1, 6, d)
            sm, cm, gm, sl, cl, gl = [ada[:, :, i, :] for i in range(6)]
            from candle_video_tpu.ops.norms import rms_norm
            nh = rms_norm(hidden, eps=cfg.norm_eps) * (1.0 + cm) + sm
            # projections without the attention kernel
            q = TF._apply_linear(bp["attn1"]["to_q"], nh)
            k = TF._apply_linear(bp["attn1"]["to_k"], nh)
            v = TF._apply_linear(bp["attn1"]["to_v"], nh)
            a1 = TF._apply_linear(bp["attn1"]["to_out"], q + k + v)
            hidden = hidden + a1 * gm
            q2 = TF._apply_linear(bp["attn2"]["to_q"], hidden)
            k2 = TF._apply_linear(bp["attn2"]["to_k"], enc)
            v2 = TF._apply_linear(bp["attn2"]["to_v"], enc)
            a2 = TF._apply_linear(
                bp["attn2"]["to_out"], q2 + jnp.sum(k2 + v2, 1, keepdims=True))
            hidden = hidden + a2
            n2 = rms_norm(hidden, eps=cfg.norm_eps) * (1.0 + cl) + sl
            ffo = TF._apply_linear(
                bp["ff"]["net_2"],
                jax.nn.gelu(TF._apply_linear(bp["ff"]["net_0_proj"], n2)))
            return hidden + ffo * gl, None
        results["noattn"] = timed(scanner(body, blocks))

    if "selfk" in variants:
        hh, hd = cfg.num_attention_heads, cfg.attention_head_dim
        q = jnp.asarray(rng.normal(size=(1, s, hh, hd)), jnp.bfloat16)
        def body(carry, _):
            qq = q + carry.reshape(1, s, hh, hd)
            o = attention(qq, q, q, 1.0 / hd ** 0.5, impl="auto", rope=rope)
            return o.reshape(1, s, d).astype(carry.dtype), None
        results["selfk"] = timed(scanner(body, None))

    if "ff" in variants:
        def body(carry, bp):
            y = TF._apply_linear(
                bp["ff"]["net_2"],
                jax.nn.gelu(TF._apply_linear(bp["ff"]["net_0_proj"], carry)))
            return y * 1e-3 + carry, None
        results["ff"] = timed(scanner(body, blocks))

    if "qkvo" in variants:
        def body(carry, bp):
            q = TF._apply_linear(bp["attn1"]["to_q"], carry)
            k = TF._apply_linear(bp["attn1"]["to_k"], carry)
            v = TF._apply_linear(bp["attn1"]["to_v"], carry)
            o = TF._apply_linear(bp["attn1"]["to_out"], q + k + v)
            return o * 1e-3 + carry, None
        results["qkvo"] = timed(scanner(body, blocks))

    if "crossqo" in variants:
        def body(carry, bp):
            a2 = TF._ltx_attention(bp["attn2"], cfg, carry,
                                   encoder_hidden=enc, attn_impl="auto")
            return a2 * 1e-3 + carry, None
        results["crossqo"] = timed(scanner(body, blocks))

    print(f"{'variant':10s} {'s/fwd':>8s} {'ms/layer':>9s}")
    for k, v in results.items():
        print(f"{k:10s} {v:8.3f} {v / L * 1e3:9.2f}")


if __name__ == "__main__":
    main()
