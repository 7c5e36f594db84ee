"""Explicit bitonic sorting networks as pure XLA ops.

``jax.lax.sort`` on TPU lowers through a generic variadic-comparator
path. The same sorting network written as explicit reshape + min/max
stages compiles to plain vectorized XLA ops: every compare-exchange at
distance j is a [M/(2j), 2, j] reshape, a min/max pair, and a direction
select, with the ascending/descending pattern of stage (k, j) a
broadcasted iota on the block index. ~log²(M)/2 stages total (210 at
M=2^20).

Measured verdict (v5e, garden-proxy train step): the network wins in an
isolated microbenchmark but LOSES integrated into the full step (7.34 →
3.69 iters/s; the 210 stages don't fuse in the large graph and cost
~0.5 ms each), so ops.binning defaults to lax.sort and keeps this
available via RAIN_TPU_SORT=bitonic for A/B runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

I32_MAX = jnp.iinfo(jnp.int32).max


def _next_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


def _stage(x, k: int, j: int):
    """One compare-exchange stage: partner = i ^ j, ascending iff
    (i & k) == 0. For j < k this reduces to a block pattern on the
    reshaped view."""
    m = x.shape[0]
    v = x.reshape(m // (2 * j), 2, j)
    lo, hi = v[:, 0], v[:, 1]
    mn = jnp.minimum(lo, hi)
    mx = jnp.maximum(lo, hi)
    # ascending iff bit k of i == 0; within a block (size 2j <= k) the
    # bit is constant: block b has i-bit-k = bit (k // (2j)) of b.
    nb = m // (2 * j)
    b = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    asc = (b & (k // (2 * j))) == 0
    new_lo = jnp.where(asc, mn, mx)
    new_hi = jnp.where(asc, mx, mn)
    return jnp.stack([new_lo, new_hi], axis=1).reshape(m)


def _stage_pairs(key, val, k: int, j: int):
    """Compare-exchange on (key, value) ordered LEXICOGRAPHICALLY —
    equivalent to a 62-bit (key << 31 | value) sort, which is what the
    wide-key binning fallback needs ((tile, depth-rank) pairs that don't
    fit one int31)."""
    m = key.shape[0]
    kv = key.reshape(m // (2 * j), 2, j)
    vv = val.reshape(m // (2 * j), 2, j)
    klo, khi = kv[:, 0], kv[:, 1]
    vlo, vhi = vv[:, 0], vv[:, 1]
    nb = m // (2 * j)
    b = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    asc = (b & (k // (2 * j))) == 0
    hi_less = (khi < klo) | ((khi == klo) & (vhi < vlo))
    swap = jnp.where(asc, hi_less,
                     (klo < khi) | ((klo == khi) & (vlo < vhi)))
    nk_lo = jnp.where(swap, khi, klo)
    nk_hi = jnp.where(swap, klo, khi)
    nv_lo = jnp.where(swap, vhi, vlo)
    nv_hi = jnp.where(swap, vlo, vhi)
    return (jnp.stack([nk_lo, nk_hi], axis=1).reshape(m),
            jnp.stack([nv_lo, nv_hi], axis=1).reshape(m))


@functools.partial(jax.jit, static_argnames=("pad_value",))
def bitonic_sort(keys: jnp.ndarray, pad_value: int = I32_MAX):
    """Ascending sort of a 1-D int32 array (unstable). Non-power-of-two
    lengths are padded with ``pad_value`` (must compare >= every real
    key for the result's first len(keys) entries to be the sorted
    input)."""
    n = keys.shape[0]
    m = _next_pow2(n)
    x = keys if m == n else jnp.concatenate(
        [keys, jnp.full((m - n,), pad_value, keys.dtype)])
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            x = _stage(x, k, j)
            j //= 2
        k *= 2
    return x[:n]


@functools.partial(jax.jit, static_argnames=("pad_value",))
def bitonic_sort_pairs(keys: jnp.ndarray, values: jnp.ndarray,
                       pad_value: int = I32_MAX):
    """Ascending (key, value) sort by key (unstable w.r.t. duplicate
    keys; each value follows its key)."""
    n = keys.shape[0]
    m = _next_pow2(n)
    if m != n:
        keys = jnp.concatenate(
            [keys, jnp.full((m - n,), pad_value, keys.dtype)])
        values = jnp.concatenate(
            [values, jnp.zeros((m - n,), values.dtype)])
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            keys, values = _stage_pairs(keys, values, k, j)
            j //= 2
        k *= 2
    return keys[:n], values[:n]
