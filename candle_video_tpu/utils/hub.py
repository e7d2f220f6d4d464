"""HuggingFace-hub weight resolution.

Mirror of the reference CLI's hub download path (examples/ltx-video/
main.rs:229-369): resolve a version preset to its repo + filenames, download
via huggingface_hub (gated import; zero-egress environments fall back to
local paths with a clear error).
"""

from __future__ import annotations

from typing import Optional

# version -> (repo_id, unified filename or None for diffusers-layout dirs)
VERSION_REPOS = {
    "0.9.5": ("Lightricks/LTX-Video", "ltx-video-2b-v0.9.5.safetensors"),
    "0.9.6-dev": ("Lightricks/LTX-Video", "ltxv-2b-0.9.6-dev-04-25.safetensors"),
    "0.9.6-distilled": (
        "Lightricks/LTX-Video",
        "ltxv-2b-0.9.6-distilled-04-25.safetensors",
    ),
    "0.9.8-2b-distilled": ("Lightricks/LTX-Video", "ltxv-2b-0.9.8-distilled.safetensors"),
    "0.9.8-13b-dev": ("Lightricks/LTX-Video", "ltxv-13b-0.9.8-dev.safetensors"),
    "0.9.8-13b-distilled": (
        "Lightricks/LTX-Video",
        "ltxv-13b-0.9.8-distilled.safetensors",
    ),
}

T5_TOKENIZER_REPO = "google/t5-v1_1-xxl"


def resolve_weights(
    version: str,
    local_path: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """Return a local path to the checkpoint for ``version``.

    Uses ``local_path`` if given; otherwise downloads the unified file from
    the hub (raises a clear error in offline environments).
    """
    if local_path:
        return local_path
    if version not in VERSION_REPOS:
        raise ValueError(f"no known hub repo for version {version}")
    repo_id, filename = VERSION_REPOS[version]
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is not installed; pass --weights-path"
        ) from e
    try:
        return hf_hub_download(repo_id, filename, cache_dir=cache_dir)
    except Exception as e:
        raise RuntimeError(
            f"could not download {repo_id}/{filename} (offline environment?); "
            f"pass --weights-path with a local checkpoint"
        ) from e


def resolve_tokenizer(local_path: Optional[str] = None,
                      cache_dir: Optional[str] = None) -> str:
    if local_path:
        return local_path
    from huggingface_hub import hf_hub_download

    return hf_hub_download(T5_TOKENIZER_REPO, "tokenizer.json", cache_dir=cache_dir)
