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


def _use_pallas_scale_space() -> bool:
    """Fused Pallas scale-space kernel on real TPU; portable XLA elsewhere
    (tests run the XLA path on CPU; kernels/fed_pallas has its own
    interpret-mode parity tests)."""
    return jax.default_backend() == "tpu"


def _as_unit_gray(img: jax.Array) -> jax.Array:
    """Integer images normalize to f32 [0, 1] like the reference's image
    loader (SURVEY.md §2 C1: `GrayFloatImage` is f32 [0, 1]); without this
    a raw uint8 frame is silently mis-scaled 255x against thresholds tuned
    for [0, 1].  Float inputs pass through untouched (trace-time branch —
    the f32 graph is byte-identical)."""
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        return img.astype(jnp.float32) / float(info.max)
    return img.astype(jnp.float32)


def extract_fn(img: jax.Array, config: AkazeConfig) -> Features:
    """Pure (traceable) single-image pipeline; shape/config must be static.

    On TPU this is the batched pipeline at B=1 (round 3): one code path —
    per-octave zero-copy level stacks, fused describe kernel and all."""
    # A 3-D input here ((H, W, C) color or an accidental batch) must not be
    # silently reinterpreted as a frame stack with only frame 0 returned.
    assert img.ndim == 2, (
        f"extract_fn expects a single (H, W) grayscale image, got shape "
        f"{img.shape}; use extract_batch_fn for batches"
    )
    if _use_pallas_scale_space():
        feats = extract_batch_fn(img[None], config)
        return jax.tree.map(lambda a: a[0], feats)
    img = _as_unit_gray(img)
    height, width = img.shape[-2], img.shape[-1]
    ss_statics, d_statics = _statics(width, height, config)
    # named_scope: stage boundaries show up in jax.profiler traces
    # (SURVEY.md §5 tracing row).
    with jax.named_scope("akaze_scale_space"):
        stacks = build_scale_space(img, ss_statics)
    with jax.named_scope("akaze_detect"):
        kps = detect(stacks["Ldet"], ss_statics)
    with jax.named_scope("akaze_describe"):
        return describe(kps, stacks, ss_statics, d_statics)


def extract_batch_fn(imgs: jax.Array, config: AkazeConfig) -> Features:
    """Traceable batched pipeline: the scale space runs with the frame batch
    on the Pallas grid natively (one program per frame per level); detection
    and description vmap over the batch."""
    imgs = _as_unit_gray(imgs)
    height, width = imgs.shape[-2], imgs.shape[-1]
    ss_statics, d_statics = _statics(width, height, config)
    with jax.named_scope("akaze_scale_space"):
        if _use_pallas_scale_space():
            from akaze_tpu.kernels.fed_pallas import build_scale_space_pallas_batched

            # with_detect: candidate scores + dense sub-pixel fields come
            # out of the scale-space build itself (XLA at native per-octave
            # resolution), replacing the separate per-(frame, level) Pallas
            # detect pass and its padded-stack HBM round trip.
            stacks = build_scale_space_pallas_batched(
                imgs, ss_statics, with_detect=True
            )
        else:
            stacks = jax.vmap(lambda im: build_scale_space(im, ss_statics))(imgs)
    with jax.named_scope("akaze_detect"):
        if _use_pallas_scale_space():
            # Candidate top-K per octave on native-resolution products, NMS
            # + sub-pixel gathers vmapped per frame — no padded
            # Ldet/score/ox/oy stacks anywhere (round 3).
            from akaze_tpu.frontend.detect import find_candidates_oct

            cand = find_candidates_oct(stacks["oct"], ss_statics)
            # Detect products are level-major (n, B, h, w): the frame axis
            # is 1 for them and 0 for the candidate dict.
            oct_axes = jax.tree.map(lambda _: 1, stacks["oct"])
            kps = jax.vmap(
                lambda oct_f, c: detect(
                    None, ss_statics, cand=c, subpix_oct=oct_f
                ),
                in_axes=(oct_axes, 0),
            )(stacks["oct"], cand)
        else:
            kps = jax.vmap(lambda ld: detect(ld, ss_statics))(stacks["Ldet"])
    with jax.named_scope("akaze_describe"):
        # Chunk-skipping describe (lax.map + scalar cond per chunk): frames
        # rarely fill the keypoint capacity, and dead chunks are skipped at
        # runtime.  Round-2 profile, batch-16 VGA @ ~210 detections: 20.5 ms
        # vs 64.3 ms for the plain vmapped path.
        from akaze_tpu.frontend.describe import describe_batched

        return describe_batched(kps, stacks, ss_statics, d_statics)


@functools.lru_cache(maxsize=32)
def _compiled_extract(config: AkazeConfig):
    @jax.jit
    def run(img):
        return extract_fn(img, config)

    return run


def extract(img, config: AkazeConfig | None = None) -> Features:
    """Jitted single-image extraction (compile cached per shape/config)."""
    config = config or AkazeConfig()
    img = jnp.asarray(img)  # dtype handled in extract_fn (_as_unit_gray)
    assert img.ndim == 2, "extract expects (H, W); use extract_batch for batches"
    return _compiled_extract(config)(img)


@functools.lru_cache(maxsize=32)
def _compiled_extract_batch(config: AkazeConfig):
    @jax.jit
    def run(imgs):
        return extract_batch_fn(imgs, config)

    return run


def extract_batch(imgs, config: AkazeConfig | None = None) -> Features:
    """Batched extraction over a leading frame axis: (B, H, W) -> Features
    with (B, K) leaves."""
    config = config or AkazeConfig()
    imgs = jnp.asarray(imgs)  # dtype handled in extract_batch_fn
    assert imgs.ndim == 3
    return _compiled_extract_batch(config)(imgs)
