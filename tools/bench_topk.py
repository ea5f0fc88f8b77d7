"""Microbench: candidate top-K variants on realistic score planes (round-4
verdict item 2c — the ~1.6 ms approx-top-k cascade).

Variants, per octave-group row layout (n*B, h*w) like find_candidates_oct:
  a) current: lax.approx_max_k(k=256, recall 0.95)
  b) approx_max_k(aggregate_to_topk=False) + exact lax.top_k  — splits the
     cascade: if the final aggregation dominates, (b) wins
  c) 2x2 reduce_window max + approx_max_k on the 4x-narrower plane
     (lossless for strict-3x3 maxima; position decode NOT timed here — this
     measures the available headroom before building the recovery path)

Timing: R-repetition device loop inside one jit (carry-chained so XLA
cannot parallelize or elide reps), reported as (t_R1 - t_R0) / (R1 - R0)
— immune to dispatch/tunnel overhead.  Distinct data per rep via a
carry-dependent additive perturbation.

Usage: python tools/bench_topk.py   (on the TPU)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

K = 256
RECALL = 0.95
B = 16
# (n_levels, h, w) per octave group at VGA
GROUPS = [(4, 480, 640), (4, 240, 320), (4, 120, 160), (4, 60, 80)]


def make_scores(rng, n, h, w):
    """Sparse candidate planes: sentinel floor with ~400 positives/level."""
    s = np.full((n * B, h * w), -3.0e38, np.float32)
    for r in range(n * B):
        m = rng.integers(150, 600)
        idx = rng.choice(h * w, size=m, replace=False)
        s[r, idx] = rng.uniform(1e-3, 1e2, m).astype(np.float32)
    return s


def variant_a(flat, h, w):
    resp, idx = jax.lax.approx_max_k(flat, K, recall_target=RECALL)
    return resp, idx


def variant_b(flat, h, w):
    resp, idx = jax.lax.approx_max_k(
        flat, K, recall_target=RECALL, aggregate_to_topk=False
    )
    r2, pos = jax.lax.top_k(resp, K)
    return r2, jnp.take_along_axis(idx, pos, axis=1)


def variant_c(flat, h, w):
    plane = flat.reshape(-1, h, w)
    pooled = jax.lax.reduce_window(
        plane, -3.0e38, jax.lax.max, (1, 2, 2), (1, 2, 2), "SAME"
    )
    pf = pooled.reshape(plane.shape[0], -1)
    resp, idx = jax.lax.approx_max_k(pf, K, recall_target=RECALL)
    return resp, idx


def variant_d(flat, h, w):
    # K=512: would eliminate the per-level cap parity class on textured
    # scenes (max measured 399 candidates/level; tools/nms_bisect.py)
    k = min(512, flat.shape[1])
    resp, idx = jax.lax.approx_max_k(flat, k, recall_target=RECALL)
    return resp, idx


def variant_e(flat, h, w):
    # K=512 on the 2x2-pooled plane (c + d combined)
    plane = flat.reshape(-1, h, w)
    pooled = jax.lax.reduce_window(
        plane, -3.0e38, jax.lax.max, (1, 2, 2), (1, 2, 2), "SAME"
    )
    pf = pooled.reshape(plane.shape[0], -1)
    k = min(512, pf.shape[1])
    resp, idx = jax.lax.approx_max_k(pf, k, recall_target=RECALL)
    return resp, idx


def variant_f(flat, h, w, k=512):
    # FULL exact pooled pipeline: 2x2 score pool (exact: strict-3x3 maxima
    # admit at most one candidate per 2x2 block) + pooled position plane +
    # per-row position recovery gather -> exact (resp, yi, xi).
    plane = flat.reshape(-1, h, w)
    pooled = jax.lax.reduce_window(
        plane, -3.0e38, jax.lax.max, (1, 2, 2), (1, 2, 2), "SAME"
    )
    ys = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 2)
    posv = jnp.where(plane > -1.0e38, (ys % 2) * 2 + (xs % 2), -1)
    pos_pooled = jax.lax.reduce_window(
        posv, -1, jax.lax.max, (1, 2, 2), (1, 2, 2), "SAME"
    )
    wp = pooled.shape[2]
    pf = pooled.reshape(plane.shape[0], -1)
    k = min(k, pf.shape[1])
    resp, idx = jax.lax.approx_max_k(pf, k, recall_target=RECALL)
    pos = jnp.take_along_axis(
        pos_pooled.reshape(plane.shape[0], -1), idx, axis=1
    )
    yp = idx // wp
    xp = idx - yp * wp
    yi = 2 * yp + jnp.maximum(pos, 0) // 2
    xi = 2 * xp + jnp.maximum(pos, 0) % 2
    return resp, yi * w + xi


def timed(fn, groups_np, reps):
    @jax.jit
    def run(groups):
        def body(i, carry):
            tok, acc = carry
            out = 0.0
            for g, (h, w) in zip(groups, dims):
                resp, idx = fn(g + tok, h, w)
                out = out + jnp.sum(resp) + jnp.sum(idx).astype(jnp.float32)
            # carry the (tiny) result back into the next rep's input
            return (out * 1e-30, acc + out)

        tok = jnp.float32(0.0)
        _, acc = jax.lax.fori_loop(0, reps, body, (tok, jnp.float32(0.0)))
        return acc

    dims = [(h, w) for (_, h, w) in GROUPS]
    groups = [jnp.asarray(g) for g in groups_np]
    jax.block_until_ready(run(groups))  # compile
    t0 = time.perf_counter()
    out = float(run(groups))
    dt = time.perf_counter() - t0
    return dt, out


def main():
    rng = np.random.default_rng(0)
    groups_np = [make_scores(rng, n, h, w) for (n, h, w) in GROUPS]
    r0, r1 = 4, 20
    import functools

    for name, fn in [("a_current", variant_a), ("b_noagg", variant_b),
                     ("c_pool2x2", variant_c), ("d_k512", variant_d),
                     ("e_pool_k512", variant_e),
                     ("f_full_pool_k512", variant_f),
                     ("g_full_pool_k256",
                      functools.partial(variant_f, k=256))]:
        try:
            t_small, _ = timed(fn, groups_np, r0)
            t_big, _ = timed(fn, groups_np, r1)
            per = (t_big - t_small) / (r1 - r0) * 1e3
            print(f"{name}: {per:.3f} ms/rep (batch {B}) "
                  f"[R{r0} {t_small*1e3:.1f} ms, R{r1} {t_big*1e3:.1f} ms]",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
