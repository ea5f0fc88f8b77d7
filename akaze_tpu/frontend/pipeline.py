"""The one-call AKAZE front-end: `extract(image) -> Features` under jit.

Mirrors the reference entry point `Akaze::extract` (SURVEY.md §3.1) as a
single jitted program: the host-device boundary is exactly image-in /
features-out.  Batched extraction is `jax.vmap` over a leading frame axis —
the throughput path for the frames/s metric (SURVEY.md §7.1 "batch-first").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.types import Features
from akaze_tpu.frontend.describe import DescribeStatics, describe
from akaze_tpu.frontend.detect import detect
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space


@functools.lru_cache(maxsize=32)
def _statics(width: int, height: int, config: AkazeConfig):
    ss = ScaleSpaceStatics(width, height, config)
    return ss, DescribeStatics(config, ss)


def extract_fn(img: jax.Array, config: AkazeConfig) -> Features:
    """Pure (traceable) single-image pipeline; shape/config must be static."""
    height, width = img.shape[-2], img.shape[-1]
    ss_statics, d_statics = _statics(width, height, config)
    stacks = build_scale_space(img, ss_statics)
    kps = detect(stacks["Ldet"], ss_statics)
    return describe(kps, stacks, ss_statics, d_statics)


@functools.lru_cache(maxsize=32)
def _compiled_extract(config: AkazeConfig):
    @jax.jit
    def run(img):
        return extract_fn(img, config)

    return run


def extract(img, config: AkazeConfig | None = None) -> Features:
    """Jitted single-image extraction (compile cached per shape/config)."""
    config = config or AkazeConfig()
    img = jnp.asarray(img, jnp.float32)
    assert img.ndim == 2, "extract expects (H, W); use extract_batch for batches"
    return _compiled_extract(config)(img)


@functools.lru_cache(maxsize=32)
def _compiled_extract_batch(config: AkazeConfig):
    @jax.jit
    def run(imgs):
        return jax.vmap(lambda im: extract_fn(im, config))(imgs)

    return run


def extract_batch(imgs, config: AkazeConfig | None = None) -> Features:
    """Batched extraction over a leading frame axis: (B, H, W) -> Features
    with (B, K) leaves."""
    config = config or AkazeConfig()
    imgs = jnp.asarray(imgs, jnp.float32)
    assert imgs.ndim == 3
    return _compiled_extract_batch(config)(imgs)
