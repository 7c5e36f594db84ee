"""Measure the Morton-window KNN's deviation from the exact result.

VERDICT r4 #10: `ops.knn.mean_dist3_auto` switches from the exact
blocked-MXU all-pairs search to the triple-Morton-window upper bound
above 2^20 points; the reference (simple_knn.cu:136-210) is exact at any
N. This tool quantifies the deviation at the populations where the
window path actually engages.

python tools/knn_deviation.py [n_points ...]    (default: 1572864)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(n):
    import jax
    import jax.numpy as jnp
    from rain_tpu.ops import knn

    rng = np.random.default_rng(0)
    # a realistic init cloud: clustered + uniform mix (like SfM points)
    n_c = n // 2
    centers = rng.uniform(-3, 3, (64, 3))
    pts = np.concatenate([
        centers[rng.integers(0, 64, n_c)] + rng.normal(0, 0.2, (n_c, 3)),
        rng.uniform(-4, 4, (n - n_c, 3))]).astype(np.float32)
    p = jnp.asarray(pts)

    t0 = time.time()
    approx = np.asarray(knn.mean_dist3(p).block_until_ready())
    t_approx = time.time() - t0
    t0 = time.time()
    exact = np.asarray(knn.mean_dist3_matmul(p).block_until_ready())
    t_exact = time.time() - t0

    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    # the init consumes sqrt(clamped mean dist2) as log-scale
    # (gaussian_model.py:124-127) — the scale-space error is what matters
    s_rel = np.abs(np.sqrt(approx) - np.sqrt(exact)) / \
        np.maximum(np.sqrt(exact), 1e-12)
    print(f"n={n}: morton {t_approx:.1f}s exact {t_exact:.1f}s | "
          f"mean-dist2 rel err mean {rel.mean():.2e} p99 "
          f"{np.quantile(rel, 0.99):.2e} max {rel.max():.2e} | "
          f"scale rel err mean {s_rel.mean():.2e} max {s_rel.max():.2e} | "
          f"exact rows {np.mean(approx <= exact * (1 + 1e-6)) * 100:.2f}% "
          f"within-bound (morton is an upper bound)", flush=True)


def main():
    from rain_tpu.cache import enable_compile_cache
    enable_compile_cache()
    ns = [int(a) for a in sys.argv[1:]] or [1_572_864]
    for n in ns:
        run(n)


if __name__ == "__main__":
    main()
