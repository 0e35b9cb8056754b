"""Measure TPU random row-gather rates across table layouts.

The classify hot loop is B*M*S random row fetches from the u8 table;
this probe finds the layout/dtype that maximizes XLA's gather rate and
sizes the speed-of-light for a Pallas variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

R = 870_575          # table rows (bench db)
W8 = 32              # bytes per row
N = 8192 * 64 * 4    # probes per batch (B*M*S)
REPS = 10


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    rate = N / dt / 1e6
    print(f"{name:44s} {dt*1e3:8.3f} ms   {rate:8.1f} Mrows/s")
    return out


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, R, size=(N,), dtype=np.int32))
    tbl_u8 = jnp.asarray(rng.integers(0, 256, size=(R, W8), dtype=np.uint8))
    tbl_u8_128 = jnp.asarray(
        rng.integers(0, 256, size=(R, 128), dtype=np.uint8)
    )
    tbl_u32 = jnp.asarray(
        rng.integers(0, 2**31, size=(R, W8 // 4), dtype=np.uint32)
    )
    R4 = (R + 3) // 4
    tbl_pack4 = jnp.asarray(
        rng.integers(0, 256, size=(R4, 128), dtype=np.uint8)
    )
    R16 = (R + 15) // 16
    tbl_pack16 = jnp.asarray(
        rng.integers(0, 256, size=(R16, 512), dtype=np.uint8)
    )

    @jax.jit
    def g_u8(t, r):
        return t[r].sum(dtype=jnp.int32)

    @jax.jit
    def g_u8_sum(t, r):
        # sum to avoid materializing full output
        return t[r]

    @jax.jit
    def g_pack4(t, r):
        phys = t[r >> 2]                       # [N, 128]
        q = (r & 3).astype(jnp.int32)
        off = q[:, None] * 32 + jnp.arange(32, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(phys, off, axis=1).sum(dtype=jnp.int32)

    @jax.jit
    def g_pack16(t, r):
        phys = t[r >> 4]                       # [N/?, 512]
        q = (r & 15).astype(jnp.int32)
        off = q[:, None] * 32 + jnp.arange(32, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(phys, off, axis=1).sum(dtype=jnp.int32)

    timeit("u8 [R,32] gather+sum", g_u8, tbl_u8, rows)
    timeit("u8 [R,32] gather only", g_u8_sum, tbl_u8, rows)
    timeit("u8 [R,128] gather+sum", g_u8, tbl_u8_128, rows)
    timeit("u32 [R,8] gather+sum", g_u8, tbl_u32, rows)
    timeit("pack4 u8 [R/4,128] gather+select+sum", g_pack4, tbl_pack4, rows)
    timeit("pack16 u8 [R/16,512] gather+select+sum", g_pack16, tbl_pack16,
           rows)

    # fewer probes, wider rows: S folded into the row (h=2 scenario)
    rows2 = rows[: N // 2]
    timeit("u8 [R,32] HALF probes (h=2)", g_u8, tbl_u8, rows2)


if __name__ == "__main__":
    main()
