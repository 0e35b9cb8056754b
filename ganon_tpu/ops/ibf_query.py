"""Interleaved Bloom filter bit-matrix: hash family and bulk-count query.

The IBF is a dense bit-matrix ``[bin_size_bits rows x technical_bins cols]``
held as ``uint32[bin_size, n_words]`` (bin ``b`` lives in word ``b // 32``,
bit ``b % 32``; ``technical_bins = 32 * n_words`` is the 64-padded bin
count). This maps directly onto HBM and lets a read's whole hash set query
every bin with gathers + bitwise AND + bit-plane accumulation.

Hash family (seqan3-style multiply/xor-shift/multiply + fastrange; build and
query must agree — membership semantics only depend on this file):

    g  = ((h * seed_i) ^ ((h * seed_i) >> hash_shift)) * GOLDEN   (mod 2^64)
    row = mulhi64(g, bin_size)          # fastrange to [0, bin_size)

with ``hash_shift = clz64(bin_size)``. Functional equivalent of the seqan3
IBF used by the reference (``GanonBuild.cpp:694``, ``GanonClassify.cpp:514``);
cross-loading reference ``.ibf`` files additionally requires byte-level
cereal parsing (see ganon_tpu.index.serialize).

Bulk count (reference semantics ``GanonClassify.cpp:504-541``): per read,
``counts[bin] = #hashes whose g-rows are all set for that bin``; per-target
counts sum the target's technical bins and clamp at ``n_hashes``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 2^64 / golden ratio — spreads the xor-folded value over the full range.
GOLDEN = 0x9E3779B97F4A7C15
# seqan3 IBF hash seeds (fixed family constants, max 5 hash functions)
HASH_SEEDS = (
    13572355802537770549,  # 2**64 / (e/2)
    13043817825332782213,  # 2**64 / sqrt(2)
    10650232656628343401,  # 2**64 / sqrt(5)
    16499269484942379435,  # 2**64 / (sqrt(3)/2)
    4893150838803335377,  # 2**64 / (3/(2*sqrt(e)))
)
MAX_HASH_FUNCTIONS = 5


def clz64(x: int) -> int:
    """Count leading zeros of a 64-bit value (host-side, static)."""
    assert 0 < x < 1 << 64
    return 64 - x.bit_length()


def _mulhi64(a, b):
    """High 64 bits of a 64x64 multiply, via 32-bit limbs (u64 lanes)."""
    m32 = jnp.uint64(0xFFFFFFFF)
    s32 = jnp.uint64(32)
    ah, al = a >> s32, a & m32
    bh, bl = b >> s32, b & m32
    lo = al * bl
    m1 = ah * bl
    m2 = al * bh
    carry = ((lo >> s32) + (m1 & m32) + (m2 & m32)) >> s32
    return ah * bh + (m1 >> s32) + (m2 >> s32) + carry


@partial(jax.jit, static_argnames=("bin_size", "hash_functions"))
def ibf_row_indices(hashes, *, bin_size: int, hash_functions: int):
    """Row indices into the bit-matrix for each hash and hash function.

    Args:
      hashes: uint64 ``[...,]`` minimizer values.
      bin_size: rows in the bit-matrix (static).
      hash_functions: number of hash functions 1..5 (static).

    Returns int32 ``[..., hash_functions]`` row indices in [0, bin_size).
    """
    shift = jnp.uint64(clz64(bin_size))
    bsz = jnp.uint64(bin_size)
    rows = []
    for i in range(hash_functions):
        g = hashes * jnp.uint64(HASH_SEEDS[i])
        g = g ^ (g >> shift)
        g = g * jnp.uint64(GOLDEN)
        rows.append(_mulhi64(g, bsz))
    return jnp.stack(rows, axis=-1).astype(jnp.int32)


def ibf_row_indices_np(hashes: np.ndarray, *, bin_size: int, hash_functions: int):
    """NumPy twin of :func:`ibf_row_indices` (used by the host-side builder)."""
    h = hashes.astype(np.uint64)
    shift = np.uint64(clz64(bin_size))
    rows = np.empty(h.shape + (hash_functions,), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(hash_functions):
            g = h * np.uint64(HASH_SEEDS[i])
            g = g ^ (g >> shift)
            g = g * np.uint64(GOLDEN)
            # mulhi via 32-bit limbs
            m32 = np.uint64(0xFFFFFFFF)
            s32 = np.uint64(32)
            ah, al = g >> s32, g & m32
            b = np.uint64(bin_size)
            bh, bl = b >> s32, b & m32
            lo = al * bl
            m1 = ah * bl
            m2 = al * bh
            carry = ((lo >> s32) + (m1 & m32) + (m2 & m32)) >> s32
            rows[..., i] = (ah * bh + (m1 >> s32) + (m2 >> s32) + carry).astype(
                np.int64
            )
    return rows


@jax.jit
def bulk_count_bins(bits, rows, hash_mask):
    """Per-bin hash hit counts for a batch of reads.

    Args:
      bits: uint32 ``[bin_size, n_words]`` IBF bit-matrix.
      rows: int32 ``[B, M, S]`` row indices (S = hash functions).
      hash_mask: bool ``[B, M]`` valid-hash mask (padding excluded).

    Returns int32 ``[B, technical_bins]`` counts (one per hash occurrence
    whose S rows are all set for the bin).
    """
    n_words = bits.shape[1]
    gathered = bits[rows]  # [B, M, S, W]
    member = gathered[:, :, 0, :]
    for s in range(1, rows.shape[2]):
        member = member & gathered[:, :, s, :]
    member = jnp.where(hash_mask[:, :, None], member, jnp.uint32(0))  # [B, M, W]
    # bit-plane accumulation: counts[b, w*32 + bit] = sum_m (member >> bit) & 1
    shifts = jnp.arange(32, dtype=jnp.uint32)
    planes = (member[:, :, :, None] >> shifts) & jnp.uint32(1)  # [B, M, W, 32]
    counts = jnp.sum(planes.astype(jnp.int32), axis=1)  # [B, W, 32]
    return counts.reshape(counts.shape[0], n_words * 32)


@partial(jax.jit, static_argnames=("num_targets",))
def target_counts(bin_counts, bin_to_target, *, num_targets: int):
    """Sum technical-bin counts into per-target counts (MXU matmul).

    Args:
      bin_counts: int32 ``[B, technical_bins]``.
      bin_to_target: int32 ``[technical_bins]`` target id per bin
        (``num_targets`` for padding bins).
      num_targets: static target count T.

    Returns int32 ``[B, T]``. Exact: counts are < 2^24 so f32 matmul is exact.
    """
    onehot = jax.nn.one_hot(bin_to_target, num_targets + 1, dtype=jnp.float32)
    out = jnp.dot(
        bin_counts.astype(jnp.float32), onehot, preferred_element_type=jnp.float32
    )
    return out[:, :num_targets].astype(jnp.int32)
