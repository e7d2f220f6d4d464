"""Serving runtime tests: bucket snapping, warmup, queue loop, stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.serving import Request, ShapeBucket, VideoGenerationServer


@pytest.fixture(scope="module")
def tiny_pipe():
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import (
        LtxFullConfig,
        LtxInferenceConfig,
    )
    from candle_video_tpu.models.ltx_video.pipeline import LtxPipeline
    from candle_video_tpu.models.ltx_video.scheduler import (
        FlowMatchEulerSchedulerConfig,
    )

    tcfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    full = LtxFullConfig(
        inference=LtxInferenceConfig(guidance_scale=2.0, num_inference_steps=2,
                                     stg_scale=0.0, skip_block_list=()),
        transformer=tcfg,
        vae=V.LtxVaeConfig(),
        scheduler=FlowMatchEulerSchedulerConfig(shift_terminal=0.1),
    )
    params = TF.init_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.float32)
    return LtxPipeline(config=full, transformer_params=params)


def _req(seed=1):
    emb = jnp.asarray(np.random.default_rng(seed).normal(size=(1, 8, 16)) * 0.3,
                      jnp.float32)
    mask = jnp.ones((1, 8), jnp.float32)
    return Request(prompt_embeds=emb, prompt_attention_mask=mask,
                   output_type="latent", seed=seed)


def test_warmup_and_sync_generate(tiny_pipe):
    bucket = ShapeBucket(64, 64, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [bucket], max_sequence_length=8, attn_impl="xla",
    ).warmup()
    assert "compile_s" in server.stats()["buckets"][str(bucket.key())]

    out = server.generate_sync(_req())
    assert out.shape == (1, 2 * 2 * 2, 8)  # latent 2x2x(9-1)/8+1=2 frames
    assert server.stats()["served"] == 1


def test_queue_loop(tiny_pipe):
    bucket = ShapeBucket(64, 64, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [bucket], max_sequence_length=8, attn_impl="xla",
    ).warmup().start()
    try:
        outs = [server.submit(_req(seed=i)) for i in range(3)]
        results = [q.get(timeout=120) for q in outs]
        for r in results:
            assert not isinstance(r, Exception)
            assert r.shape == (1, 8, 8)
        assert server.stats()["served"] == 3
    finally:
        server.stop()


def test_bucket_snapping(tiny_pipe):
    small = ShapeBucket(64, 64, 9, 2)
    big = ShapeBucket(96, 96, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [small, big], max_sequence_length=8, attn_impl="xla",
    )
    # request between buckets snaps up to the smallest fitting one
    req = _req()
    req = Request(prompt_embeds=req.prompt_embeds,
                  prompt_attention_mask=req.prompt_attention_mask,
                  bucket=ShapeBucket(65, 65, 9, 2), output_type="latent")
    picked = server._pick_bucket(req)
    assert picked == big

    # exact match picks itself
    req2 = Request(bucket=small)
    assert server._pick_bucket(req2) == small


def test_continuous_batching(tiny_pipe):
    """Queued same-bucket requests serve as ONE batched generate call whose
    per-request results match individual serving (per-seed Pcg32 latents)."""
    bucket = ShapeBucket(64, 64, 9, 2)
    single = VideoGenerationServer(
        tiny_pipe, [bucket], max_sequence_length=8, attn_impl="xla",
    )
    expected = [np.asarray(single.generate_sync(_req(seed=i))) for i in (1, 2, 3)]

    server = VideoGenerationServer(
        tiny_pipe, [bucket], max_batch=4, max_sequence_length=8, attn_impl="xla",
    ).warmup()
    # enqueue BEFORE starting the worker so the drain sees all three at once
    outs = [server.submit(_req(seed=i)) for i in (1, 2, 3)]
    server.start()
    try:
        results = [q.get(timeout=300) for q in outs]
    finally:
        server.stop()
    for r, e in zip(results, expected):
        assert not isinstance(r, Exception), r
        assert r.shape == e.shape
        np.testing.assert_allclose(np.asarray(r), e, atol=1e-5, rtol=1e-5)
    rec = server.stats()["buckets"][str(bucket.key())]
    assert rec["last_batch"] == 3
    assert server.stats()["served"] == 3


@pytest.fixture(scope="module")
def tiny_pipe_vae():
    """Pipeline WITH a timestep-conditioned VAE (tensor output path)."""
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import (
        LtxFullConfig,
        LtxInferenceConfig,
    )
    from candle_video_tpu.models.ltx_video.pipeline import LtxPipeline
    from candle_video_tpu.models.ltx_video.scheduler import (
        FlowMatchEulerSchedulerConfig,
    )
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    tcfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    vcfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=8,
        block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2), decoder_layers_per_block=(1, 1, 1),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True), decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=32, temporal_compression_ratio=4,
    )
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=2, stg_scale=0.0,
            skip_block_list=(), decode_timestep=(0.05,),
            decode_noise_scale=(0.025,),
        ),
        transformer=tcfg,
        vae=vcfg,
        scheduler=FlowMatchEulerSchedulerConfig(shift_terminal=0.1),
    )
    tparams = TF.init_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.float32)
    vparams = init_vae_params(jax.random.PRNGKey(1), vcfg, dtype=jnp.float32)
    # tiny T5 + mock tokenizer: the string-prompt serving path (CLI --serve)
    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.utils.tokenizer import MockTokenizer

    t5cfg = T5.T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                        num_layers=1, num_heads=4)
    rng = np.random.default_rng(3)

    def lin(k, n):
        return {"weight": jnp.asarray(rng.normal(size=(k, n)) * 0.05,
                                      jnp.float32)}

    t5params = {
        "embedding": jnp.asarray(rng.normal(size=(64, 16)) * 0.05, jnp.float32),
        "blocks": [{
            "attn": {"q": lin(16, 16), "k": lin(16, 16), "v": lin(16, 16),
                     "o": lin(16, 16),
                     "relative_attention_bias": jnp.asarray(
                         rng.normal(size=(32, 4)), jnp.float32)},
            "attn_norm": {"weight": jnp.ones((16,), jnp.float32)},
            "ffn": {"wi_0": lin(16, 32), "wi_1": lin(16, 32),
                    "wo": lin(32, 16)},
            "ffn_norm": {"weight": jnp.ones((16,), jnp.float32)},
        }],
        "final_norm": {"weight": jnp.ones((16,), jnp.float32)},
    }
    return LtxPipeline(config=full, transformer_params=tparams,
                       vae_params=vparams, t5_params=t5params,
                       t5_config=t5cfg,
                       tokenizer=MockTokenizer(vocab_size=64,
                                               model_max_length=8))


def _treq(seed=1):
    emb = jnp.asarray(np.random.default_rng(seed).normal(size=(1, 8, 16)) * 0.3,
                      jnp.float32)
    mask = jnp.ones((1, 8), jnp.float32)
    return Request(prompt_embeds=emb, prompt_attention_mask=mask,
                   output_type="tensor", seed=seed)


def test_batched_tensor_output_bit_identical(tiny_pipe_vae):
    """Batched tensor-output requests match individual serving bit-for-bit:
    per-row initial latents AND per-row decode noise (generate's
    ``decode_noise`` surface) both come from each request's own seed."""
    bucket = ShapeBucket(64, 64, 5, 2)
    single = VideoGenerationServer(
        tiny_pipe_vae, [bucket], max_sequence_length=8, attn_impl="xla",
    )
    expected = [np.asarray(single.generate_sync(_treq(seed=i))) for i in (1, 2)]

    server = VideoGenerationServer(
        tiny_pipe_vae, [bucket], max_batch=2, max_sequence_length=8,
        attn_impl="xla",
    )
    outs = [server.submit(_treq(seed=i)) for i in (1, 2)]
    server.start()
    try:
        results = [q.get(timeout=300) for q in outs]
    finally:
        server.stop()
    for r, e in zip(results, expected):
        assert not isinstance(r, Exception), r
        assert r.shape == e.shape
        np.testing.assert_allclose(np.asarray(r), e, atol=1e-5, rtol=1e-5)


def test_row_latents_respect_use_pcg_rng(tiny_pipe):
    """When the server is configured with use_pcg_rng=False, batched rows
    draw jax.random latents exactly like a single-request call would."""
    bucket = ShapeBucket(64, 64, 9, 2)
    single = VideoGenerationServer(
        tiny_pipe, [bucket], max_sequence_length=8, attn_impl="xla",
        use_pcg_rng=False,
    )
    expected = [np.asarray(single.generate_sync(_req(seed=i))) for i in (5, 6)]

    server = VideoGenerationServer(
        tiny_pipe, [bucket], max_batch=2, max_sequence_length=8,
        attn_impl="xla", use_pcg_rng=False,
    )
    outs = [server.submit(_req(seed=i)) for i in (5, 6)]
    server.start()
    try:
        results = [q.get(timeout=300) for q in outs]
    finally:
        server.stop()
    for r, e in zip(results, expected):
        assert not isinstance(r, Exception), r
        np.testing.assert_allclose(np.asarray(r), e, atol=1e-5, rtol=1e-5)


def test_skipped_requests_not_starved(tiny_pipe):
    """A non-batchable request held out of a batch is served from the
    pending list before new queue items (no starvation)."""
    small = ShapeBucket(64, 64, 9, 2)
    big = ShapeBucket(96, 96, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [small, big], max_batch=4, max_sequence_length=8,
        attn_impl="xla",
    )
    big_req = Request(prompt_embeds=_req(2).prompt_embeds,
                      prompt_attention_mask=_req(2).prompt_attention_mask,
                      bucket=big, output_type="latent", seed=2)
    # enqueue: small, big, small, small — the big one must still be served
    outs = [server.submit(_req(seed=1)), server.submit(big_req),
            server.submit(_req(seed=3)), server.submit(_req(seed=4))]
    server.start()
    try:
        results = [q.get(timeout=300) for q in outs]
    finally:
        server.stop()
    for r in results:
        assert not isinstance(r, Exception), r
    assert results[1].shape == (1, 3 * 3 * 2, 8)
    assert server.stats()["served"] == 4


def test_batching_mixed_buckets_requeue(tiny_pipe):
    """Non-matching requests are requeued and served separately."""
    small = ShapeBucket(64, 64, 9, 2)
    big = ShapeBucket(96, 96, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [small, big], max_batch=4, max_sequence_length=8,
        attn_impl="xla",
    )
    reqs = [_req(seed=1), _req(seed=2)]
    reqs[1] = Request(prompt_embeds=reqs[1].prompt_embeds,
                      prompt_attention_mask=reqs[1].prompt_attention_mask,
                      bucket=big, output_type="latent", seed=2)
    outs = [server.submit(r) for r in reqs]
    server.start()
    try:
        r0 = outs[0].get(timeout=300)
        r1 = outs[1].get(timeout=300)
    finally:
        server.stop()
    assert not isinstance(r0, Exception) and not isinstance(r1, Exception)
    assert r0.shape == (1, 8, 8)
    assert r1.shape == (1, 3 * 3 * 2, 8)
    assert server.stats()["served"] == 2


def test_server_rejects_conditioning_kwargs():
    """Server-level conditioning would silently drop anchors (the serving
    path passes explicit per-row noise latents, which generate() treats as
    pre-mixed under conditioning) — must be rejected at construction."""
    import pytest as _pytest

    from candle_video_tpu.serving import ShapeBucket, VideoGenerationServer

    with _pytest.raises(ValueError, match="conditioning"):
        VideoGenerationServer(
            object(), [ShapeBucket(64, 64, 9, 4)], image_latents=object()
        )


def test_mixed_bucket_fairness_under_burst(tiny_pipe):
    """Fairness under a mixed-bucket burst (the serving-bench load shape):
    alternating big/small requests with continuous batching must ALL
    complete, grouped per bucket, and neither class may be tail-starved —
    the first minority-class result lands before the majority class
    finishes its backlog (submission order is preserved within a class)."""
    import time

    small = ShapeBucket(64, 64, 9, 2)
    big = ShapeBucket(96, 96, 9, 2)
    server = VideoGenerationServer(
        tiny_pipe, [small, big], max_batch=2, max_sequence_length=8,
        attn_impl="xla",
    )
    emb = jnp.zeros((1, 8, 16), jnp.float32)
    mask = jnp.ones((1, 8), jnp.float32)

    def req(seed, bucket):
        return Request(prompt_embeds=emb, prompt_attention_mask=mask,
                       bucket=bucket, output_type="latent", seed=seed)

    reqs = [req(i, big if i % 2 == 0 else small) for i in range(6)]
    outs = [server.submit(r) for r in reqs]
    server.start()
    try:
        done_at = {}
        for i, q in enumerate(outs):
            res = q.get(timeout=600)
            assert not isinstance(res, Exception), res
            done_at[i] = time.time()
    finally:
        server.stop()
    assert server.stats()["served"] == 6
    # no tail-starvation: the first small-bucket request (index 1) finishes
    # no later than the LAST big-bucket request (index 4)
    assert done_at[1] <= done_at[4] + 1e-6


def test_cli_serve_rejects_mesh_and_image():
    """--serve is the single-chip serving loop: --mesh and one-shot-only
    surfaces (--image, latent output) must fail fast with guidance."""
    import pytest

    from candle_video_tpu.cli import main

    with pytest.raises(SystemExit, match="single-chip serving loop"):
        main(["--serve", "--mesh", "tp=2"])
    with pytest.raises(SystemExit, match="one-shot CLI path"):
        main(["--serve", "--image", "x.png"])
    with pytest.raises(SystemExit, match="one-shot CLI path"):
        main(["--serve", "--output-type", "latent"])


def test_string_prompt_serving(tiny_pipe_vae):
    """String-prompt requests (the CLI --serve path with a real tokenizer +
    T5): the server routes them through generate(prompt=...) singly (the
    batcher only groups embed-carrying requests), and the result matches a
    direct generate() call with the same seed."""
    from candle_video_tpu.models.ltx_video.pipeline import generate

    pipe = tiny_pipe_vae
    if pipe.tokenizer is None:
        pytest.skip("fixture has no tokenizer")
    bucket = ShapeBucket(64, 64, 5, 2)
    server = VideoGenerationServer(
        pipe, [bucket], max_batch=2, max_sequence_length=8, attn_impl="xla",
        use_pcg_rng=False,
    ).warmup().start()
    try:
        out = server.generate_sync(
            Request(prompt="a cat", bucket=bucket, seed=9,
                    output_type="tensor"),
            timeout=300,
        )
    finally:
        server.stop()
    ref = generate(
        pipe, prompt="a cat", height=64, width=64, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, stg_scale=0.0,
        seed=9, output_type="tensor", max_sequence_length=8,
        attn_impl="xla", use_pcg_rng=False,
    )  # guidance_scale=1.0: the bucket's guidance=False maps there
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-3, rtol=1e-5,
    )


def test_cli_run_serve_loop(tiny_pipe_vae, tmp_path, monkeypatch):
    """The --serve REPL body (cli.run_serve): prompts stream from stdin,
    each produces a video file, 'quit' ends cleanly, served count reported.
    (Driven on the real chip in round-5 verification; this locks the loop
    logic — bucket construction, string-prompt requests, file naming.)"""
    import argparse
    import io

    from candle_video_tpu.cli import run_serve

    args = argparse.Namespace(
        height=64, width=64, num_frames=5,
        num_inference_steps=None, guidance_scale=None,
        negative_prompt="bad",
        serve_max_batch=1, pcg_rng=False, vae_stream_chunks=0,
        attn_impl="xla", output_dir=str(tmp_path), frame_rate=25.0,
        max_sequence_length=8, seed=5,
    )
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("a cat\n\na dog\nquit\nnever seen\n")
    )
    rc = run_serve(args, tiny_pipe_vae)
    assert rc == 0
    made = sorted(p.name for p in tmp_path.iterdir())
    assert len(made) == 2 and made[0].startswith("serve_000")
    assert made[1].startswith("serve_001")
