"""Configuration dataclasses for the TPU-native AKAZE/SfM engine.

Defaults reproduce the reference configuration (SURVEY.md §2 C12: 4 octaves,
4 sublevels, sigma0 = 1.6, derivative_factor = 1.5, detector threshold = 1e-3,
contrast percentile 0.7 over 300 bins, PM-g2 diffusivity, 3 descriptor
channels, pattern size 10).  All fields are static (hashable) so a config can
be closed over by `jax.jit` without retracing hazards.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class Diffusivity(enum.Enum):
    """Conductivity function used by the nonlinear diffusion (SURVEY.md §2 C5)."""

    PM_G1 = "pm_g1"
    PM_G2 = "pm_g2"
    WEICKERT = "weickert"


@dataclasses.dataclass(frozen=True)
class AkazeConfig:
    """AKAZE front-end options (reference `Config` struct, SURVEY.md §2 C12)."""

    num_octaves: int = 4
    num_sublevels: int = 4
    # sigma0: scale of the first evolution level (reference `base_scale_offset`).
    base_scale_offset: float = 1.6
    # Multiplier from esigma to keypoint size / detector kernel scale.
    derivative_factor: float = 1.5
    # Det-Hessian response threshold.
    detector_threshold: float = 1e-3
    # Initial contrast factor before the percentile estimate replaces it.
    initial_contrast: float = 1e-3
    # Contrast factor estimation: percentile of the gradient histogram.
    contrast_percentile: float = 0.7
    contrast_nbins: int = 300
    # Fallback contrast factor when the histogram never reaches the percentile.
    contrast_fallback: float = 0.03
    # Contrast decay applied at each octave change during scale-space build.
    contrast_octave_decay: float = 0.75
    diffusivity: Diffusivity = Diffusivity.PM_G2
    # FED scheme maximum stable explicit step (SURVEY.md §2 C4).
    fed_tau_max: float = 0.25
    # Octaves whose min(image dim) falls below this are dropped (SURVEY.md §2 C3).
    min_octave_dim: int = 40
    # M-LDB descriptor (SURVEY.md §2 C11): 3 channels over 2x2/3x3/4x4 grids.
    descriptor_channels: int = 3
    descriptor_pattern_size: int = 10
    # Descriptor/orientation sampling safety border factor: smax = 10*sqrt(2).
    border_smax: float = 10.0 * math.sqrt(2.0)
    # De-dup radius factor applied to keypoint size (SURVEY.md §2 C9: size/2).
    dedup_radius_factor: float = 0.5
    # TPU front-end only: fixed keypoint capacity (SoA top-K with validity
    # mask).  1024 comfortably covers VGA frames at the default threshold
    # (~300-700 detections); raise for large/high-detail images.
    max_keypoints: int = 1024
    # TPU front-end only: raw extrema candidates kept per scale-space level
    # before cross-level NMS (top-K by response; SURVEY.md §7.3 extrema plan).
    # 128 would win ~0.7 ms/batch16 (smaller approx-top-k sorts) and matches
    # 256 exactly on typical content, but FAILS the repetitive-grid
    # adversarial parity gate (tests/test_scene_regression.py) — dense
    # repetitive extrema overflow a 128 cap.  256 is the measured
    # throughput/coverage default.  512 is the ACCURACY-MODE setting
    # (round 5, tools/nms_bisect.py): textured VGA levels carry up to 399
    # raw candidates, so the 256 cap drops ~25% of the reference's
    # keypoints (golden->device coverage 71% -> 93% at 512) at a measured
    # 8.7% headline cost (1074 vs 1177 fps same-session A/B).
    per_level_candidates: int = 256
    # TPU front-end only: approx_max_k recall target for candidate top-K.
    # 0.95 shrinks the PartialReduce intermediate and its sort (~2 ms /
    # batch16 vs 0.98) with IDENTICAL keypoint+match outputs measured on the
    # v5e headline content (any recall loss hits only candidates far below
    # the NMS/top-M cut).  Raise toward 1.0 for exact-parity debugging.
    # Parity cost measured round 3: +0.04 Hamming bits mean vs 1.0.
    candidate_recall: float = 0.95

    # ---- TPU execution knobs (round-3: folded from env vars so identical
    # configs always produce identical graphs; the AKAZE_* env vars remain
    # as trace-time OVERRIDES for A/B tooling only — see _env_override). ----
    # Octaves 0..N-1 run the fused Mosaic kernel chain; deeper octaves run
    # XLA convs.  Round 3: 4 (all Mosaic) + deep_octave_frames=8 measured
    # 19.5 -> 18.6 ms/batch16 over the round-2 split of 3.  Since round
    # 4's conv-precision fix BOTH sides are parity-faithful (all-XLA split
    # 0 measures Hamming mean 1.47 vs golden — BASELINE.md attribution
    # table); 4 remains the measured-fastest split.
    pallas_octaves: int = 4
    # Patch fetch: "pallas" pipelined DMA gather / "xla" vmapped
    # dynamic_slice / "auto" = pallas on TPU.
    patch_backend: str = "auto"
    # Describe stage: "fused" one-kernel describe (kernels/describe_fused,
    # TPU default), "xla" chunked one-hot einsums, "pallas" the measured-
    # losing per-keypoint kernel (kept for A/B); "auto" = fused on TPU.
    describe_backend: str = "auto"
    # Frames folded into one describe chunk step on the XLA path (bounds
    # live one-hot memory at group*chunk keypoints; values > 16 risk VMEM
    # pressure at VGA).
    describe_group: int = 8
    # XLA-describe chunk loop: "map" (lax.map), "while" (live-chunks-only
    # dynamic loop), "unroll" (static; measured a wash round 3).
    describe_loop: str = "map"
    # Frames per Mosaic program for octaves >= 2 (deep octaves are per-op-
    # issue-bound: an 80x60 level costs nearly as much per program as
    # 640x480).  8 measured best round 3 (f=4 slightly worse, f=16 explodes
    # Mosaic compile time — round-2 negative).
    deep_octave_frames: int = 8

    @property
    def num_levels(self) -> int:
        return self.num_octaves * self.num_sublevels

    @property
    def descriptor_bits(self) -> int:
        """486 = 3 channels * (C(4,2) + C(9,2) + C(16,2)) pairwise comparisons."""
        n = 0
        for cells in (4, 9, 16):
            n += cells * (cells - 1) // 2
        return self.descriptor_channels * n

    @property
    def descriptor_bytes(self) -> int:
        return (self.descriptor_bits + 7) // 8  # 61 for the default config

    @property
    def descriptor_words(self) -> int:
        """uint32 words holding the packed descriptor (16 -> 512 bits padded)."""
        return (self.descriptor_bytes + 3) // 4


def _env_override(name: str, value, allowed=None, cast=None):
    """Trace-time env override for a config knob (A/B tooling only; the
    dataclass field is the source of truth).  Malformed values are ignored
    with the config value kept."""
    import os

    env = os.environ.get(name)
    if env is None:
        return value
    if cast is not None:
        try:
            return cast(env)
        except ValueError:
            return value
    if allowed is not None and env not in allowed:
        return value
    return env


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Brute-force Hamming matcher options (SURVEY.md §3.4)."""

    # Lowe-style ratio threshold on nearest/second-nearest Hamming distances.
    ratio: float = 0.8
    # Require mutual nearest neighbors.
    mutual: bool = True
    # Absolute maximum Hamming distance for an acceptable match (<= 486).
    max_distance: int = 486
    # "pallas" one-pass VMEM reduction kernel / "xla" dense distance cube /
    # "auto" = pallas on TPU (identical outputs; round-2 measured win).
    backend: str = "auto"


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """On-device fixed-iteration RANSAC for the essential matrix (SURVEY.md §7.3)."""

    num_iterations: int = 512
    sample_size: int = 8  # 8-point algorithm
    # Inlier threshold on Sampson distance in *normalized* image coordinates.
    inlier_threshold: float = 1e-3
    seed: int = 0
    # Beam width for the guarded LO-RANSAC refit (round 5): the top
    # `refit_beam` hypotheses each get the iterated refit, and the winning
    # basin is chosen by cheirality-valid inlier count.  1 reproduces the
    # fragile round-4 single-basin behavior (1-2 catastrophic poses — rot
    # 5-8 deg / t-dir 50-83 — per 24-combo sweep); 16 still leaves one
    # (worst 7.2/66); 32 removes every catastrophic combo (worst
    # 1.85/7.74) at a ~2.8x config-2 throughput cost (540 -> 194 pairs/s
    # at P=32) that the robustness justifies.  Lower it only for
    # throughput-critical pipelines that tolerate occasional pose
    # outliers (BASELINE.md round 5).
    refit_beam: int = 32


@dataclasses.dataclass(frozen=True)
class SfmConfig:
    """Incremental SfM / bundle adjustment options (SURVEY.md §7.1 sfm/).

    There is deliberately NO max_keyframes/max_points capacity field: the
    round-2 K=64 dense-solve ceiling those fields encoded was lifted in
    round 3 (BA hands off to block-Jacobi CG past K=64 and Schur cross
    terms assemble via segment-sum — sfm/ba.py), so the solver scales with
    the problem and a config cap would only mislead."""

    ba_iterations: int = 10
    # Observations per point packed into the fixed-shape BA problem (Q
    # keyframes SPREAD evenly across each track — first + last + evenly
    # between; extra observations are dropped).  Bounds BA cost linearly
    # in Q.  Measured at 200 kf / 5 k pts (BASELINE.md round-4 Q-cap A/B):
    # Q=8 → 9.2 kf/s, ATE 0.30; Q=16 → 4.4 kf/s, ATE 0.031 — raise to 16
    # when long-trajectory accuracy matters more than BA throughput.
    ba_obs_per_point: int = 8
    # Levenberg-Marquardt damping bounds.
    lm_lambda_init: float = 1e-3
    lm_lambda_max: float = 1e6
    huber_delta: float = 3.0
    # Keyframe selection: minimum fraction of tracked matches before a new
    # keyframe is inserted (video front-end, SURVEY.md §7.2 step 5).
    keyframe_min_tracked: float = 0.6
    # Pose-graph edge information weights (1/sigma; round 5): odometry
    # edges carry BA-polished local relative poses, closure edges carry
    # monocular two-view measurement noise (~2e-3 rad — the repo's own
    # measured two-view accuracy, BASELINE.md).  Unweighted PGO trusted
    # both equally, so on a low-drift trajectory closure noise INCREASED
    # 200 kf ATE 0.010 -> 0.033; these defaults let closures correct real
    # accumulated drift without injecting their own noise when there is
    # little drift to correct.
    pgo_odometry_sigma: float = 5e-5
    pgo_closure_sigma: float = 2e-3


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the distributed paths (SURVEY.md §2 parallelism)."""

    data: int = 1  # frames / keyframe-blocks sharded along this axis
    spatial: int = 1  # image rows sharded along this axis (FED halo exchange)

    @property
    def num_devices(self) -> int:
        return self.data * self.spatial
