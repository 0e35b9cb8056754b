"""Bisect the gather->AND->popcount->reduce chain cost on TPU.

Timing through the tunneled device is only trustworthy when every rep's
compute DEPENDS on the previous rep's output (forces serialized real
execution) and the final result is fetched to host. Plain
block_until_ready loops report physically impossible rates here.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ganon_tpu.ops.ibf_query import _popcount_u8

R = 870_575
W8 = 32
B, M, S = 8192, 64, 4
REPS = 8


def main():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 256, size=(R, W8), dtype=np.uint8))
    rows_set = [
        jnp.asarray(rng.integers(0, R, size=(B, M, S), dtype=np.int32))
        for _ in range(REPS)
    ]
    mask_set = [jnp.asarray(rng.random((B, M)) < 0.9) for _ in range(REPS)]
    bs = jnp.arange(W8, dtype=jnp.int32)
    be = bs + 1
    np.asarray(rows_set[-1])  # force staging

    def bench(name, fn):
        c = jnp.int32(0)
        c = fn(tbl, rows_set[0], mask_set[0], c)  # warm compile
        float(c)
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for i in range(REPS):
            c = fn(tbl, rows_set[i], mask_set[i], c)
        float(c)  # fetch = true barrier
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:52s} {dt*1e3:8.3f} ms")

    def chain(r, c):
        # runtime no-op the compiler cannot fold (depends on c's value)
        return r + jnp.where(c == jnp.iinfo(jnp.int32).min, 1, 0)

    @jax.jit
    def g_flat(t, r, mk, c):
        g = t[chain(r, c).reshape(-1)]
        return g[:, 0].astype(jnp.int32).sum() + c

    @jax.jit
    def g_and(t, r, mk, c):
        g = t[chain(r, c)]
        m = g[:, :, 0, :]
        for s in range(1, S):
            m = m & g[:, :, s, :]
        return m[:, :, 0].astype(jnp.int32).sum() + c

    @jax.jit
    def full(t, r, mk, c):
        g = t[chain(r, c)]
        m = g[:, :, 0, :]
        for s in range(1, S):
            m = m & g[:, :, s, :]
        m = jnp.where(mk[:, :, None], m, jnp.uint8(0))
        pc = _popcount_u8(m).astype(jnp.int32)
        return jnp.sum(pc, axis=1).sum() + c

    @jax.jit
    def full_seg(t, r, mk, c):
        g = t[chain(r, c)]
        m = g[:, :, 0, :]
        for s in range(1, S):
            m = m & g[:, :, s, :]
        m = jnp.where(mk[:, :, None], m, jnp.uint8(0))
        pc = _popcount_u8(m).astype(jnp.int32)
        cw = jnp.sum(pc, axis=1)
        cs = jnp.concatenate(
            [jnp.zeros((cw.shape[0], 1), cw.dtype), jnp.cumsum(cw, axis=1)],
            axis=1,
        )
        return (cs[:, be] - cs[:, bs]).sum() + c

    bench("gather only (+tiny reduce)", g_flat)
    bench("gather+AND", g_and)
    bench("gather+AND+mask+popcount+sumM", full)
    bench("... + cumsum segment (btc_u8)", full_seg)


if __name__ == "__main__":
    main()
