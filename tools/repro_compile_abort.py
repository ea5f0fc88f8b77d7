"""Minimal repro harness for the remote-compile-service failures on large
fresh programs (round-4 verdict item 6).

Known-bad shapes (2026-08-19/20, tunneled v5e remote compile):
  1. g1/Weickert variant pipeline + fused describe at batch 64 —
     deterministic "ABORTED: TPU backend error" (round 3; bench.py pins
     variants to batch 16 because of it).
  2. two-view extract+match at P=32 (batch-64 extraction + 32-pair match
     + correspondence outputs) — HANGS >40 min with no abort (round 4;
     observed twice; the g2 batch-64 HEADLINE program with 63-pair match
     compiles fine in ~6 min, so it is not batch 64 alone).

Each case lowers + compiles ONE program under a wall-clock budget and
reports ok / abort / timeout, bisecting the failure to (diffusivity,
batch, match-shape) coordinates.  Run on the TPU:

  env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_repro \
      python -u tools/repro_compile_abort.py [case ...]

(Use a FRESH cache dir: a cache hit would vacuously "pass" a case.)
Cases: g2_64 g1_16 g1_64 w_64 twoview_8 twoview_16 twoview_32
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import AkazeConfig, Diffusivity, MatchConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.matching.hamming import match_fn

CASES = {}


def case(name):
    def deco(f):
        CASES[name] = f
        return f

    return deco


def _variant(diff, batch):
    config = AkazeConfig(diffusivity=diff)
    mcfg = MatchConfig()

    def step(imgs):
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        m = jax.vmap(lambda da, va, db, vb: match_fn(da, va, db, vb, mcfg))(
            feats.descriptors[:-1], kp.valid[:-1],
            feats.descriptors[1:], kp.valid[1:],
        )
        return feats.keypoints.count(), m.count()

    return step, jnp.zeros((batch, 480, 640), jnp.float32)


def _twoview(P):
    config = AkazeConfig()
    mcfg = MatchConfig()

    def step(imgs):
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        m = jax.vmap(lambda a, va, b, vb: match_fn(a, va, b, vb, mcfg))(
            feats.descriptors[0::2], kp.valid[0::2],
            feats.descriptors[1::2], kp.valid[1::2],
        )
        return (kp.x[0::2], kp.y[0::2], kp.x[1::2], kp.y[1::2],
                m.idx_b, m.accepted)

    return step, jnp.zeros((2 * P, 480, 640), jnp.float32)


for nm, d, b in [
    ("g2_64", Diffusivity.PM_G2, 64),
    ("g1_16", Diffusivity.PM_G1, 16),
    ("g1_64", Diffusivity.PM_G1, 64),
    ("w_64", Diffusivity.WEICKERT, 64),
]:
    CASES[nm] = (lambda d=d, b=b: _variant(d, b))
for nm, p in [("twoview_8", 8), ("twoview_16", 16), ("twoview_32", 32)]:
    CASES[nm] = (lambda p=p: _twoview(p))


def run_case(name, budget_s=1200):
    step, example = CASES[name]()
    t0 = time.perf_counter()
    try:
        lowered = jax.jit(step).lower(example)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()  # blocks on the remote compile service
        print(f"{name}: OK (lower {t_lower:.0f}s, compile "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAILED after {time.perf_counter() - t0:.0f}s: {msg}",
              flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["g2_64", "g1_16", "g1_64"]
    for n in names:
        print(f"--- {n} (wall budget: run under `timeout`) ---", flush=True)
        run_case(n)
