"""Shared random-init machinery: spec trees + a one-jit device materializer.

Model init builders describe their parameter pytrees as trees of
``Spec(kind, shape, std)`` leaves (kind: 'normal' | 'zeros' | 'ones' |
'const') and hand them to :func:`materialize`:

- on TPU backends the WHOLE tree is generated on device by ONE jitted
  builder — per-leaf f32 normals cast to the target dtype as produced (XLA
  fuses, so the f32 temporary is one leaf at a time, not 2x the model), and
  one program means one remote compile, amortized by the persistent XLA
  compilation cache.  Host-side NumPy generation of the 1.92B-param DiT
  measured ~100-220 s on a single-core host — the bulk of the
  random-weights cold start; on-device it is ~3 s warm-cache.
- on CPU backends (tests; tiny configs) leaves are drawn host-side with
  NumPy f32 (no f64 temporaries).  ``CVT_HOST_INIT=1`` forces this path.

Real checkpoints never touch this — they come through the loaders.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class Spec(tuple):
    """('normal'|'zeros'|'ones'|'const', shape, std_or_value) leaf marker."""


def normal(shape, std=0.02):
    return Spec(("normal", tuple(shape), float(std)))


def zeros(shape):
    return Spec(("zeros", tuple(shape), 0.0))


def ones(shape):
    return Spec(("ones", tuple(shape), 0.0))


def const(value):
    return Spec(("const", (), float(value)))


def _is_spec(x):
    return isinstance(x, Spec)


def _np_rng_from_key(key) -> np.random.Generator:
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    return np.random.default_rng(seed)


def materialize(key, spec_tree, dtype=jnp.bfloat16, f32_kinds=("const",),
                f32_paths=()):
    """Realize a spec tree into a parameter pytree (see module docstring).

    Leaves of kind listed in ``f32_kinds``, or whose tree path contains a
    key named in ``f32_paths``, stay f32 regardless of ``dtype`` (scalar
    constants like timestep_scale_multiplier, latent statistics).
    """
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        spec_tree, is_leaf=_is_spec
    )
    f32_paths = set(f32_paths)

    def _path_f32(path):
        return any(
            getattr(p, "key", getattr(p, "name", None)) in f32_paths
            for p in path
        )

    leaves = [leaf for _, leaf in paths_leaves]
    leaf_f32 = [_path_f32(path) for path, _ in paths_leaves]

    def leaf_dtype(kind, i):
        return jnp.float32 if (kind in f32_kinds or leaf_f32[i]) else dtype

    if jax.default_backend() in ("tpu", "axon") and not os.environ.get(
        "CVT_HOST_INIT"
    ):

        @jax.jit
        def build(key):
            outs = []
            for i, (kind, shape, std) in enumerate(leaves):
                dt = leaf_dtype(kind, i)
                if kind == "normal":
                    x = jax.random.normal(
                        jax.random.fold_in(key, i), shape, jnp.float32
                    )
                    outs.append((x * jnp.float32(std)).astype(dt))
                elif kind == "zeros":
                    outs.append(jnp.zeros(shape, dt))
                elif kind == "ones":
                    outs.append(jnp.ones(shape, dt))
                else:  # const
                    outs.append(jnp.full(shape, std, dt))
            return outs

        return jax.tree.unflatten(treedef, build(key))

    rng = _np_rng_from_key(key)
    outs = []
    for i, (kind, shape, std) in enumerate(leaves):
        dt = leaf_dtype(kind, i)
        if kind == "normal":
            w = rng.standard_normal(size=shape, dtype=np.float32)
            w *= np.float32(std)
            outs.append(jnp.asarray(w, dt))
        elif kind == "zeros":
            outs.append(jnp.zeros(shape, dt))
        elif kind == "ones":
            outs.append(jnp.ones(shape, dt))
        else:
            outs.append(jnp.full(shape, std, dt))
    return jax.tree.unflatten(treedef, outs)
