"""Merged-bin pruned forest: a coarse IBF gates a grouped fine table.

This is the TPU-native re-expression of the reference HIBF's actual query
trick — threshold-gated descent into merged bins
(``hierarchical_interleaved_bloom_filter.hpp:432-460``): the reference
only counts a merged bin's child IBF when the merged-bin count reaches
the read's threshold, slashing probed bytes on wide databases. The
pointer-chasing recursion is hostile to TPUs, so the same gating becomes
two data-parallel stages:

1. **Coarse stage** — targets are partitioned into groups of
   ``group_size`` (count-sorted, so group members have similar sizes);
   one small IBF holds one bin per group containing the union of the
   group's minimizers (a superset Bloom: any hash that hits a member
   target's fine bin with a TRUE hash also hits the group bin, so a
   group whose count is below the read's rel-cutoff threshold cannot
   contain a passing target through true hashes). Bulk-counting it
   costs ``B x M x h_coarse`` probes of ``G/8``-byte rows — VMEM-cheap.
2. **Fine stage** — only the top ``S`` surviving groups per read are
   probed. Every target owns exactly ONE fine bin (per-group bin sizes
   replace the flat IBF's technical-bin splitting), and all groups
   flatten into one ``[sum_g bin_size_g, group_size/8]`` byte matrix;
   a probe's row index is computed with the group's own
   ``(bin_size, shift, row_offset)`` gathered per slot — dynamic
   fastrange, all vector ALU. Probed bytes drop from the full table
   width to ``S x group_size/8`` per probe.

Semantics (the reference's, by design): a target is reported only when
BOTH its fine count and its group's coarse count reach the read's
rel-cutoff threshold — "prune-only": gating can drop false-positive-only
borderline matches whose hashes are not in the coarse union, exactly
like the reference's non-descent, and can never add matches. The
probe-all fallback (``DevicePrunedForest.counts_gated``) applies the
same gate, so fast path and fallback are bit-identical.

File format (``.hibf``): npz with a JSON header (magic
``ganon-tpu-pruned-v1``) or the raw mmap-able container.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ganon_tpu.index.config import IBFConfig
from ganon_tpu.index.sizing import bin_size_fp_hf, false_positive
from ganon_tpu.ops.ibf_query import ibf_row_indices_np

MAGIC = "ganon-tpu-pruned-v1"
RAW_MAGIC = b"GANON-TPU-PRUNED-RAW1\n"


def _scatter_or_u8(table: np.ndarray, rows: np.ndarray, bits: np.ndarray):
    """OR bit ``bits[i]`` of row ``rows[i]`` into a u8 [R, W] matrix.

    Sort-and-reduce (like ibf._scatter_bits) — orders of magnitude
    faster than ``np.bitwise_or.at`` for tens of millions of inserts.
    """
    W = table.shape[1]
    widx = rows.astype(np.int64) * W + (bits >> 3).astype(np.int64)
    mask = (np.uint8(1) << (bits & 7).astype(np.uint8)).astype(np.uint8)
    order = np.argsort(widx, kind="stable")
    widx = widx[order]
    mask = mask[order]
    boundaries = np.flatnonzero(np.r_[True, widx[1:] != widx[:-1]])
    merged = np.bitwise_or.reduceat(mask, boundaries)
    flat = table.reshape(-1)
    flat[widx[boundaries]] |= merged


class PrunedForest:
    """Grouped one-bin-per-target fine table + coarse merged-bin IBF."""

    hashes_count_is_estimate = False

    def __init__(
        self,
        fine: np.ndarray,          # u8 [R_total, group_size // 8]
        coarse: np.ndarray,        # u8 [coarse_bin_size, ceil(G/8)]
        *,
        targets: list[str],        # count-sorted canonical order
        hashes_count: dict[str, int],
        grp_bin_size: np.ndarray,  # int64 [G]
        grp_row_off: np.ndarray,   # int64 [G]
        grp_ntargets: np.ndarray,  # int32 [G]
        group_size: int,
        coarse_bin_size: int,
        kmer_size: int,
        window_size: int,
        max_fp: float,
        fine_h: int,
        coarse_fp: float,
        coarse_h: int,
    ):
        self.fine = fine
        self.coarse = coarse
        self._targets = list(targets)
        self.hashes_count = dict(hashes_count)
        self.grp_bin_size = np.asarray(grp_bin_size, dtype=np.int64)
        self.grp_row_off = np.asarray(grp_row_off, dtype=np.int64)
        self.grp_ntargets = np.asarray(grp_ntargets, dtype=np.int32)
        self.group_size = int(group_size)
        self.coarse_bin_size = int(coarse_bin_size)
        self.max_fp = float(max_fp)
        self.fine_h = int(fine_h)
        self.coarse_fp = float(coarse_fp)
        self.coarse_h = int(coarse_h)
        fprs = self.target_fpr()
        self.ibf_config = IBFConfig(
            kmer_size=kmer_size,
            window_size=window_size,
            max_fp=max_fp,
            n_bins=len(targets),
            # one bin per target: max_hashes_bin never splits
            max_hashes_bin=max(hashes_count.values(), default=1),
            hash_functions=fine_h,
            bin_size_bits=int(self.grp_bin_size.max(initial=1)),
            true_max_fp=max(fprs.values(), default=0.0),
            true_avg_fp=(
                sum(fprs.values()) / len(fprs) if fprs else 0.0
            ),
        )

    @property
    def num_groups(self) -> int:
        return len(self.grp_bin_size)

    def targets(self) -> list[str]:
        return list(self._targets)

    def target_fpr(self) -> dict[str, float]:
        """Per-target achieved fp: single fine bin, direct formula."""
        out = {}
        for gi in range(len(self.grp_bin_size)):
            bsz = int(self.grp_bin_size[gi])
            for j in range(int(self.grp_ntargets[gi])):
                t = self._targets[gi * self.group_size + j]
                out[t] = false_positive(bsz, self.fine_h,
                                        self.hashes_count[t])
        return out

    def group_of(self, target: str) -> int:
        return self._targets.index(target) // self.group_size

    # --- persistence -------------------------------------------------------

    def _header(self) -> dict:
        return {
            "magic": MAGIC,
            "kmer_size": self.ibf_config.kmer_size,
            "window_size": self.ibf_config.window_size,
            "max_fp": self.max_fp,
            "fine_h": self.fine_h,
            "coarse_fp": self.coarse_fp,
            "coarse_h": self.coarse_h,
            "group_size": self.group_size,
            "coarse_bin_size": self.coarse_bin_size,
            "targets": self._targets,
            "hashes_count": [self.hashes_count[t] for t in self._targets],
            "grp_bin_size": self.grp_bin_size.tolist(),
            "grp_row_off": self.grp_row_off.tolist(),
            "grp_ntargets": self.grp_ntargets.tolist(),
        }

    def save(self, path: str) -> None:
        arrays = {
            "header": np.frombuffer(
                json.dumps(self._header()).encode(), dtype=np.uint8
            ),
            "fine": self.fine,
            "coarse": self.coarse,
        }
        np.savez_compressed(path + ".tmp.npz", **arrays)
        os.replace(path + ".tmp.npz", path)

    def save_raw(self, path: str) -> None:
        """mmap-able container (``--filter-format tpu-raw``); load time
        independent of table size (see IBF.save_raw for rationale)."""
        header = self._header()
        header["magic"] = MAGIC + "-raw"
        header["fine_shape"] = list(self.fine.shape)
        header["coarse_shape"] = list(self.coarse.shape)
        blob = json.dumps(header).encode()
        with open(path + ".tmp", "wb") as f:
            f.write(RAW_MAGIC)
            f.write(len(blob).to_bytes(8, "little"))
            f.write(blob)
            f.write(b"\0" * (-f.tell() % 4096))
            f.write(np.ascontiguousarray(self.fine).tobytes())
            f.write(b"\0" * (-f.tell() % 4096))
            f.write(np.ascontiguousarray(self.coarse).tobytes())
        os.replace(path + ".tmp", path)

    @classmethod
    def _from_header(cls, header, fine, coarse) -> "PrunedForest":
        return cls(
            fine, coarse,
            targets=header["targets"],
            hashes_count=dict(
                zip(header["targets"], header["hashes_count"])
            ),
            grp_bin_size=np.asarray(header["grp_bin_size"], np.int64),
            grp_row_off=np.asarray(header["grp_row_off"], np.int64),
            grp_ntargets=np.asarray(header["grp_ntargets"], np.int32),
            group_size=header["group_size"],
            coarse_bin_size=header["coarse_bin_size"],
            kmer_size=header["kmer_size"],
            window_size=header["window_size"],
            max_fp=header["max_fp"],
            fine_h=header["fine_h"],
            coarse_fp=header["coarse_fp"],
            coarse_h=header["coarse_h"],
        )

    @classmethod
    def load(cls, path: str) -> "PrunedForest":
        import zipfile

        if not zipfile.is_zipfile(path):
            with open(path, "rb") as f:
                if f.read(len(RAW_MAGIC)) != RAW_MAGIC:
                    raise ValueError(f"not a ganon-tpu pruned file: {path}")
                hlen = int.from_bytes(f.read(8), "little")
                header = json.loads(f.read(hlen).decode())
                off = len(RAW_MAGIC) + 8 + hlen
                off += -off % 4096
            fine = np.memmap(path, mode="r", dtype=np.uint8, offset=off,
                             shape=tuple(header["fine_shape"]))
            off2 = off + fine.size
            off2 += -off2 % 4096
            coarse = np.memmap(path, mode="r", dtype=np.uint8, offset=off2,
                               shape=tuple(header["coarse_shape"]))
            return cls._from_header(header, fine, coarse)
        with np.load(path, allow_pickle=False) as z:
            header = json.loads(bytes(z["header"].tobytes()).decode())
            if header.get("magic") != MAGIC:
                raise ValueError(f"not a ganon-tpu pruned file: {path}")
            return cls._from_header(header, z["fine"], z["coarse"])


def is_pruned_file(path: str) -> bool:
    """Sniff a ``.hibf`` path for the pruned container (npz or raw)."""
    import zipfile

    try:
        with open(path, "rb") as f:
            if f.read(len(RAW_MAGIC)) == RAW_MAGIC:
                return True
        if not zipfile.is_zipfile(path):
            return False
        with np.load(path, allow_pickle=False) as z:
            if "header" not in z:
                return False
            header = json.loads(bytes(z["header"].tobytes()).decode())
            return header.get("magic") == MAGIC
    except Exception:
        return False


def build_pruned(
    target_hashes: dict[str, np.ndarray],
    *,
    kmer_size: int,
    window_size: int,
    max_fp: float = 0.05,
    fine_h: int = 1,
    coarse_fp: float = 0.1,
    coarse_h: int = 1,
    group_size: int = 64,
) -> PrunedForest:
    """Build the pruned forest from per-target distinct-minimizer arrays.

    Targets sort by hash count descending (stable), so groups hold
    similar-sized targets and per-group bin sizes waste little space —
    the role the reference's DP layout (raptor) plays for merged bins.
    Defaults measured on v5e (scripts/pruned_sweep.py): ``fine_h=1``
    and ``coarse_h=1`` minimize probes — the gathers are
    transaction-bound per probe, so one probe per hash beats a denser
    table in every regime tried (fh=2 measured 1.4-2x slower despite a
    2.4x smaller table); ``coarse_fp=0.1`` keeps the coarse table small
    while the threshold gating crushes group-level fp (a group survives
    only when >= cutoff of the read's hashes hit — a binomial tail, not
    a per-hash fp; fp 0.05 doubled the coarse table for a measured
    -27%).
    """
    if not target_hashes:
        raise ValueError("no targets to build")
    names = list(target_hashes.keys())
    counts = np.asarray([len(target_hashes[t]) for t in names])
    order = np.argsort(-counts, kind="stable")
    targets = [names[i] for i in order]
    hashes_count = {t: int(len(target_hashes[t])) for t in targets}

    G = -(-len(targets) // group_size)
    grp_bin_size = np.empty(G, dtype=np.int64)
    grp_ntargets = np.empty(G, dtype=np.int32)
    unions = []
    for g in range(G):
        members = targets[g * group_size:(g + 1) * group_size]
        grp_ntargets[g] = len(members)
        mx = max(1, max(hashes_count[t] for t in members))
        grp_bin_size[g] = max(64, bin_size_fp_hf(max_fp, mx, fine_h))
        unions.append(
            np.unique(np.concatenate(
                [np.asarray(target_hashes[t], dtype=np.uint64)
                 for t in members]
            ))
        )
    grp_row_off = np.concatenate([[0], np.cumsum(grp_bin_size)[:-1]])
    R_total = int(grp_bin_size.sum())
    Wf = group_size // 8
    if group_size % 8:
        raise ValueError("group_size must be a multiple of 8")

    fine = np.zeros((R_total, Wf), dtype=np.uint8)
    for g in range(G):
        members = targets[g * group_size:(g + 1) * group_size]
        hs = [np.asarray(target_hashes[t], dtype=np.uint64)
              for t in members]
        gh = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        gl = np.repeat(np.arange(len(members), dtype=np.int64),
                       [len(h) for h in hs])
        if not len(gh):
            continue
        rows = ibf_row_indices_np(
            gh, bin_size=int(grp_bin_size[g]), hash_functions=fine_h
        )  # [N, fine_h]
        rows = rows + int(grp_row_off[g])
        _scatter_or_u8(
            fine,
            rows.reshape(-1),
            np.repeat(gl, fine_h),
        )

    cmax = max(1, max(len(u) for u in unions))
    coarse_bin_size = max(64, bin_size_fp_hf(coarse_fp, cmax, coarse_h))
    Wc = -(-G // 8)
    coarse = np.zeros((coarse_bin_size, Wc), dtype=np.uint8)
    for g, u in enumerate(unions):
        if not len(u):
            continue
        rows = ibf_row_indices_np(
            u, bin_size=coarse_bin_size, hash_functions=coarse_h
        )
        _scatter_or_u8(
            coarse,
            rows.reshape(-1),
            np.full(rows.size, g, dtype=np.int64),
        )

    return PrunedForest(
        fine, coarse,
        targets=targets, hashes_count=hashes_count,
        grp_bin_size=grp_bin_size, grp_row_off=grp_row_off,
        grp_ntargets=grp_ntargets, group_size=group_size,
        coarse_bin_size=coarse_bin_size,
        kmer_size=kmer_size, window_size=window_size, max_fp=max_fp,
        fine_h=fine_h, coarse_fp=coarse_fp, coarse_h=coarse_h,
    )
