"""Tokenizer wrapper, video IO, and observability tests."""

import json
import os

import numpy as np
import pytest

from candle_video_tpu.utils.tokenizer import MockTokenizer
from candle_video_tpu.utils import video_io
from candle_video_tpu.utils.debug import StageTimer, dump_tensor, log


def test_mock_tokenizer_shapes():
    tok = MockTokenizer(vocab_size=100, model_max_length=16)
    ids, mask = tok.encode_batch(["hello world", "a longer prompt with many words"])
    assert ids.shape == mask.shape == (2, 16)
    assert mask[0].sum() == 3  # 2 words + EOS
    assert (ids < 100).all() and (ids >= 0).all()
    # deterministic? hash() is salted per-process; within-process it is stable
    ids2, _ = tok.encode_batch(["hello world", "a longer prompt with many words"])
    np.testing.assert_array_equal(ids[0], ids2[0])


def test_mock_tokenizer_truncation():
    tok = MockTokenizer(model_max_length=4)
    ids, mask = tok.encode_batch(["one two three four five six"])
    assert mask[0].sum() == 4


def test_to_uint8_frames():
    video = np.zeros((1, 3, 2, 4, 4), np.float32)
    video[0, 0] = 255.0
    frames = video_io.to_uint8_frames(video)
    assert frames.shape == (2, 4, 4, 3)
    assert frames.dtype == np.uint8
    assert (frames[..., 0] == 255).all()
    assert (frames[..., 1] == 0).all()


def test_save_frames_and_gif(tmp_path):
    rng = np.random.default_rng(0)
    video = rng.uniform(0, 255, size=(1, 3, 3, 8, 8)).astype(np.float32)
    paths = video_io.save_frames_png(video, str(tmp_path / "frames"))
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)

    gif = video_io.save_gif(video, str(tmp_path / "v.gif"), fps=10)
    assert os.path.exists(gif)

    # PNG round-trip fidelity
    from PIL import Image

    frame0 = np.asarray(Image.open(paths[0]))
    np.testing.assert_array_equal(
        frame0, video_io.to_uint8_frames(video)[0]
    )


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "_shares" in rep


def test_dump_tensor_env_gated(tmp_path, monkeypatch):
    # disabled: no writes
    monkeypatch.delenv("CVT_DUMP_TENSORS", raising=False)
    dump_tensor("x", np.ones(3))
    assert not list(tmp_path.iterdir())

    monkeypatch.setenv("CVT_DUMP_TENSORS", str(tmp_path))
    dump_tensor("x", np.ones(3), step=2)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and "x_step2" in files[0].name


def test_log_gated(monkeypatch, capsys):
    monkeypatch.setenv("CVT_LOG", "off")
    log("stage", "hidden")
    assert capsys.readouterr().err == ""
    monkeypatch.setenv("CVT_LOG", "info")
    log("stage", "visible", foo=1)
    err = capsys.readouterr().err
    rec = json.loads(err)
    assert rec["stage"] == "stage" and rec["foo"] == 1


def test_load_image_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    out = video_io.load_image(p)
    assert out.shape == (1, 3, 16, 24)
    assert out.min() >= -1.0 and out.max() <= 1.0
    back = ((out[0].transpose(1, 2, 0) + 1) / 2 * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(back, arr)

    resized = video_io.load_image(p, height=8, width=12)
    assert resized.shape == (1, 3, 8, 12)


def test_real_tokenizer_wrapper(tmp_path):
    """T5TokenizerWrapper over an actual tokenizers.Tokenizer file."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "<unk>": 1, "hello": 2, "world": 3, "a": 4, "cat": 5}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    from candle_video_tpu.utils.tokenizer import T5TokenizerWrapper

    wrapper = T5TokenizerWrapper(path, model_max_length=8)
    ids, mask = wrapper.encode_batch(["hello world", "a cat plays"])
    assert ids.shape == mask.shape == (2, 8)
    assert ids[0, 0] == 2 and ids[0, 1] == 3
    assert mask[0].sum() == 2
    assert ids[1, 2] == 1  # "plays" -> <unk>
    assert mask[1].sum() == 3


def test_init_spec_materialize_backend_invariant_stream():
    """materialize() must draw from a backend-invariant device stream, NOT
    an uncontrolled host NumPy RNG: cross-backend parity harnesses build
    the CPU oracle and the TPU run from the same key in different
    processes (regression: test_tpu_parity broke when init was host-side
    on CPU and device-side on TPU).  Round 5 replaced per-leaf threefry
    with the counter-hash + Box-Muller stream (init_spec module docstring:
    threefry's unrolled bit-op chains cost ~30 s of remote compile on the
    ~200-leaf VAE builder); the invariance contract is now 'device stream
    == the documented NumPy twin up to transcendental ULPs'."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.utils.init_spec import (
        _hash_normal_np, materialize, normal, zeros,
    )

    key = jax.random.PRNGKey(7)
    spec = {"a": {"weight": normal((4, 8), 0.5), "bias": zeros((8,))}}
    got = materialize(key, spec, jnp.float32)
    # leaf 0 in sorted-flatten order is a.bias, leaf 1 is a.weight; the
    # base seed is the low word of the key data (init_spec.materialize)
    base_seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0xFFFFFFFF
    expect = _hash_normal_np(base_seed + 1, (4, 8), 0.5)
    # integer hashing is exact everywhere; Box-Muller's log/cos may differ
    # by ULPs between backends/libm — far below the parity envelopes
    np.testing.assert_allclose(np.asarray(got["a"]["weight"]), expect,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["a"]["bias"]),
                                  np.zeros((8,), np.float32))
    # std is honored (distribution sanity on a larger draw)
    big = materialize(key, {"w": normal((256, 256), 0.5)}, jnp.float32)
    assert abs(float(jnp.std(big["w"])) - 0.5) < 0.02
    # deterministic across calls
    again = materialize(key, spec, jnp.float32)
    np.testing.assert_array_equal(np.asarray(got["a"]["weight"]),
                                  np.asarray(again["a"]["weight"]))


def test_cli_rejects_dit_int8_with_mesh():
    """--dit-int8 is a single-chip capacity path: combining it with --mesh
    must fail fast with guidance (before any weights load) — sharded BF16
    already fits at tp>=2, and the PP/TP paths cannot carry w8 leaves."""
    import pytest

    from candle_video_tpu.cli import main

    with pytest.raises(SystemExit, match="single-chip capacity path"):
        main(["--dit-int8", "--mesh", "pp=2"])
