"""Multi-chip sharding of the classify pipeline.

Replaces the reference's CPU-thread data parallelism (reader/classifier
thread pools over SafeQueues, GanonClassify.cpp:1220-1287,1579-1597) with
a 2-D device mesh:

* axis ``batch``: read batches are data-parallel (each chip hashes and
  thresholds its shard of reads),
* axis ``bins``: the IBF bit-matrix is column-sharded (each chip holds a
  slice of the Bloom bins; a read's hash set queries all local bins).

Per-bin counts are summed into per-target counts with an MXU matmul whose
contraction runs over the sharded bin axis — GSPMD inserts the required
``psum`` over ``bins`` automatically, which is the all-reduce the
reference never needed (single-host shared memory) but a pod does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganon_tpu.ops.minimizers import minimizers_masked_jax
from ganon_tpu.ops.ibf_query import (
    ibf_row_indices,
    bulk_count_bins,
    target_counts,
    target_segments,
)


def make_mesh(devices=None, batch_axis: int | None = None) -> Mesh:
    """Build a (batch, bins) mesh over the given/available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch_axis is None:
        # prefer splitting both axes when possible
        batch_axis = 1
        for cand in (2, 4, 8):
            if n % cand == 0 and n // cand >= 1 and cand <= n:
                batch_axis = cand
                break
        if n in (2, 4):
            batch_axis = n // 2 if n > 2 else 1
    bins_axis = n // batch_axis
    dev = np.asarray(devices[: batch_axis * bins_axis]).reshape(
        batch_axis, bins_axis
    )
    return Mesh(dev, ("batch", "bins"))


@partial(
    jax.jit,
    static_argnames=("k", "w", "m1", "bin_size", "hash_functions", "num_targets"),
)
def _classify_step(
    bits, bin_to_target, codes, lengths, *,
    k: int, w: int, m1: int, bin_size: int, hash_functions: int, num_targets: int,
):
    """Single-call classify compute: codes -> per-target clamped counts.

    Keeps the per-bin-count + one-hot matmul formulation: with ``bits``
    column-sharded over the ``bins`` mesh axis the contraction over bins
    is what GSPMD turns into the per-shard partial sum + ``psum`` — the
    collective pattern the sharded classifier is built around. (The
    single-chip fast path uses the cumsum segment-sum instead,
    ganon_tpu.ops.ibf_query.bulk_target_counts.)
    """
    hashes, mask, n_hashes = minimizers_masked_jax(codes, lengths, k=k, w=w)
    hashes, mask = hashes[:, :m1], mask[:, :m1]
    rows = ibf_row_indices(hashes, bin_size=bin_size, hash_functions=hash_functions)
    bc = bulk_count_bins(bits, rows, mask)
    tc = target_counts(bc, bin_to_target, num_targets=num_targets)
    return jnp.minimum(tc, n_hashes[:, None]), n_hashes


class ShardedClassifier:
    """An IBF sharded over a mesh, classifying read batches end to end."""

    def __init__(self, ibf, mesh: Mesh):
        self.mesh = mesh
        self.cfg = ibf.ibf_config
        self.num_targets = len(ibf.targets())
        n_bins_shards = mesh.shape["bins"]
        self.batch_mult = mesh.shape["batch"]
        # pad the word axis so the bin shard is even across devices
        bits = ibf.bits
        b2t = ibf.bin_to_target_ids()
        W = bits.shape[1]
        W_pad = -(-W // n_bins_shards) * n_bins_shards
        if W_pad != W:
            bits = np.pad(bits, ((0, 0), (0, W_pad - W)))
            b2t = np.pad(
                b2t, (0, (W_pad - W) * 32), constant_values=self.num_targets
            )
        self.bits = jax.device_put(bits, NamedSharding(mesh, P(None, "bins")))
        self.bin_to_target = jax.device_put(b2t, NamedSharding(mesh, P()))

    def counts(self, codes: np.ndarray, lengths: np.ndarray):
        """codes uint8 [B, L] / lengths int32 [B] -> (counts [B, T], n_hashes)."""
        B, L = codes.shape
        B_pad = -(-B // self.batch_mult) * self.batch_mult
        if B_pad != B:
            codes = np.pad(codes, ((0, B_pad - B), (0, 0)))
            lengths = np.pad(lengths, (0, B_pad - B))
        m1 = max(L - self.cfg.window_size + 1, 1)
        sb = NamedSharding(self.mesh, P("batch", None))
        codes = jax.device_put(codes, sb)
        lengths = jax.device_put(lengths, NamedSharding(self.mesh, P("batch")))
        counts, n_hashes = _classify_step(
            self.bits,
            self.bin_to_target,
            codes,
            lengths,
            k=self.cfg.kmer_size,
            w=self.cfg.window_size,
            m1=m1,
            bin_size=self.cfg.bin_size_bits,
            hash_functions=self.cfg.hash_functions,
            num_targets=self.num_targets,
        )
        return counts[:B], n_hashes[:B]
