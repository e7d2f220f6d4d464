"""Orbax checkpoint round-trip + hub resolution tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.utils.checkpoint import load_params, save_params
from candle_video_tpu.utils.hub import VERSION_REPOS, resolve_weights


def test_orbax_roundtrip(tmp_path):
    params = {
        "a": {"weight": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)},
        "b": [jnp.ones((2,), jnp.bfloat16), jnp.zeros((5,), jnp.float32)],
    }
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, template=params)
    for got, ref in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))
        assert got.dtype == ref.dtype


def test_resolve_weights_local_passthrough(tmp_path):
    f = tmp_path / "w.safetensors"
    f.write_bytes(b"x")
    assert resolve_weights("0.9.5", local_path=str(f)) == str(f)


def test_resolve_weights_unknown_version():
    with pytest.raises(ValueError, match="no known hub repo"):
        resolve_weights("9.9.9")


def test_resolve_weights_offline_error():
    # zero-egress environment: must fail with a clear message, fast
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="weights-path"):
        resolve_weights("0.9.5")


def test_version_repo_table_covers_presets():
    from candle_video_tpu.models.ltx_video.configs import _VERSIONS

    for v in ("0.9.5", "0.9.8-2b-distilled", "0.9.8-13b-dev", "0.9.8-13b-distilled"):
        assert v in _VERSIONS
        assert v in VERSION_REPOS


def test_resolve_weights_download_path_mocked(monkeypatch, tmp_path):
    """Exercise the hub download branch without egress: mock hf_hub_download
    and verify repo/filename routing for every version preset."""
    import sys
    import types

    from candle_video_tpu.utils import hub

    calls = []

    def fake_download(repo_id, filename, cache_dir=None):
        calls.append((repo_id, filename, cache_dir))
        p = tmp_path / filename
        p.write_bytes(b"x")
        return str(p)

    fake_mod = types.SimpleNamespace(hf_hub_download=fake_download)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_mod)

    for version, (repo, fname) in hub.VERSION_REPOS.items():
        got = hub.resolve_weights(version, cache_dir="/tmp/c")
        assert got.endswith(fname)
    assert [c[0] for c in calls] == [r for r, _ in hub.VERSION_REPOS.values()]
    assert all(c[2] == "/tmp/c" for c in calls)

    tok = hub.resolve_tokenizer()
    assert tok.endswith("tokenizer.json")


def test_resolve_weights_download_failure_message(monkeypatch):
    import sys
    import types

    from candle_video_tpu.utils import hub

    def boom(repo_id, filename, cache_dir=None):
        raise OSError("no network")

    monkeypatch.setitem(
        sys.modules, "huggingface_hub", types.SimpleNamespace(hf_hub_download=boom)
    )
    with pytest.raises(RuntimeError, match="offline environment"):
        hub.resolve_weights("0.9.5")


def test_resolve_weights_unknown_version():
    from candle_video_tpu.utils import hub

    with pytest.raises(ValueError, match="no known hub repo"):
        hub.resolve_weights("9.9.9-unknown")
