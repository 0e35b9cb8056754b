"""Production u8 vs u32 count path on wide tables (trace-based).

Validates bulk_target_counts_u32 == bulk_target_counts_u8 bit-exactly
(small table) and measures both through the production segment matmul
(device-generated wide tables; host upload through the tunnel is 35 MB/s).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

from ganon_tpu.ops.ibf_query import (
    bulk_target_counts_u8,
    bulk_target_counts_u32,
    table_as_u32,
)
from wide_layout_probe import trace_ms

B, M, S = 2048, 48, 4
N_TRACE = 3


def main():
    rng = np.random.default_rng(0)
    # correctness: small host table, W8 not a multiple of 4 to hit padding
    Rs, Ts = 4096, 37
    tbl8_h = rng.integers(0, 256, size=(Rs, Ts), dtype=np.uint8)
    bstarts = np.arange(Ts, dtype=np.int32)
    bends = bstarts + 1
    rows_h = rng.integers(0, Rs, size=(B, M, S), dtype=np.int32)
    mask_h = rng.random((B, M)) < 0.9
    c8 = np.asarray(bulk_target_counts_u8(
        jnp.asarray(tbl8_h), jnp.asarray(rows_h), jnp.asarray(mask_h),
        jnp.asarray(bstarts), jnp.asarray(bends)))
    c32 = np.asarray(bulk_target_counts_u32(
        jnp.asarray(table_as_u32(tbl8_h)), jnp.asarray(rows_h),
        jnp.asarray(mask_h), jnp.asarray(bstarts), jnp.asarray(bends)))
    assert np.array_equal(c8, c32), "u8/u32 path mismatch"
    print("exactness ok")

    for T, R in [(1024, 2723899), (4096, 680975)]:
        W8 = T  # 1 byte (8 technical bins) per target
        key = jax.random.key(T)
        bs = jnp.arange(T, dtype=jnp.int32)
        be = bs + 1

        mk8 = jax.jit(lambda k: jax.random.bits(k, (R, W8), dtype=jnp.uint8))
        tbl8 = mk8(key)
        tbl8.block_until_ready()

        def mk(i):
            r = np.random.default_rng(i)
            return (
                jnp.asarray(r.integers(0, R, size=(B, M, S), dtype=np.int32)),
                jnp.asarray(r.random((B, M)) < 0.9),
            )

        inputs = [mk(i) for i in range(N_TRACE + 1)]
        ms8 = trace_ms(lambda rr, mm: bulk_target_counts_u8(
            tbl8, rr, mm, bs, be), inputs)
        del tbl8
        mk32 = jax.jit(
            lambda k: jax.random.bits(k, (R, W8 // 4), dtype=jnp.uint32))
        tbl32 = mk32(key)
        tbl32.block_until_ready()
        ms32 = trace_ms(lambda rr, mm: bulk_target_counts_u32(
            tbl32, rr, mm, bs, be), inputs)
        del tbl32
        probes = B * M * S
        print(
            f"T={T}: u8 {ms8:7.2f} ms ({ms8*1e6/probes:5.1f} ns/probe) | "
            f"u32 {ms32:7.2f} ms ({ms32*1e6/probes:5.1f} ns/probe)"
        )


if __name__ == "__main__":
    main()
