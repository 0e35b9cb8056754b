"""top_k tail at wide T: variadic lax.top_k vs packed u32 single sort.

lax.top_k lowers to a full variadic (vals, iota) sort on TPU — 15 ms at
[8192, 4096]. Packing (count<<16 | complemented idx) into one u32 halves
the data through the sort network and keeps EXACT top_k semantics
(descending count, ascending index on ties). Also tries a chunked
two-stage exact variant.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from wide_layout_probe import trace_ms

B, K = 8192, 128
N_TRACE = 3


@partial(jax.jit, static_argnames=("k",))
def topk_ref(fvals, *, k):
    tv, ti = jax.lax.top_k(fvals, k)
    return tv.astype(jnp.int32), ti.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def topk_packed(fvals, *, k):
    T = fvals.shape[1]
    idx_c = jnp.uint32(0xFFFF) - jnp.arange(T, dtype=jnp.uint32)
    packed = (fvals.astype(jnp.uint32) << jnp.uint32(16)) | idx_c
    s = jax.lax.sort(packed, dimension=1, is_stable=False)
    top = s[:, -k:][:, ::-1]
    return (
        (top >> 16).astype(jnp.int32),
        (jnp.uint32(0xFFFF) - (top & jnp.uint32(0xFFFF))).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("k", "chunk"))
def topk_packed_chunked(fvals, *, k, chunk):
    """Exact two-stage: per-chunk packed sort-topk, then merge."""
    Bb, T = fvals.shape
    C = T // chunk
    idx_c = jnp.uint32(0xFFFF) - jnp.arange(T, dtype=jnp.uint32)
    packed = (fvals.astype(jnp.uint32) << jnp.uint32(16)) | idx_c
    pc = packed.reshape(Bb, C, chunk)
    s = jax.lax.sort(pc, dimension=2, is_stable=False)
    cand = s[:, :, -min(k, chunk):].reshape(Bb, -1)
    s2 = jax.lax.sort(cand, dimension=1, is_stable=False)
    top = s2[:, -k:][:, ::-1]
    return (
        (top >> 16).astype(jnp.int32),
        (jnp.uint32(0xFFFF) - (top & jnp.uint32(0xFFFF))).astype(jnp.int32),
    )


def main():
    for T in (1024, 4096, 8192):
        rng = np.random.default_rng(T)
        fv = rng.integers(0, 400, size=(B, T)).astype(np.int32)
        fv[rng.random((B, T)) < 0.98] = 0  # sparse matches like production
        tv0, ti0 = map(np.asarray, topk_ref(jnp.asarray(fv), k=K))
        tv1, ti1 = map(np.asarray, topk_packed(jnp.asarray(fv), k=K))
        assert np.array_equal(tv0, tv1) and np.array_equal(ti0, ti1)
        tv2, ti2 = map(
            np.asarray, topk_packed_chunked(jnp.asarray(fv), k=K, chunk=512))
        assert np.array_equal(tv0, tv2) and np.array_equal(ti0, ti2)

        def mk(i):
            r = np.random.default_rng(i)
            f = r.integers(0, 400, size=(B, T)).astype(np.int32)
            f[r.random((B, T)) < 0.98] = 0
            return (jnp.asarray(f),)

        inputs = [mk(i) for i in range(N_TRACE + 1)]
        ms0 = trace_ms(lambda f: topk_ref(f, k=K), inputs)
        ms1 = trace_ms(lambda f: topk_packed(f, k=K), inputs)
        ms2 = trace_ms(
            lambda f: topk_packed_chunked(f, k=K, chunk=512), inputs)
        print(
            f"T={T}: top_k {ms0:6.2f} ms | packed {ms1:6.2f} ms | "
            f"chunked512 {ms2:6.2f} ms   (exact ok)"
        )


if __name__ == "__main__":
    main()
