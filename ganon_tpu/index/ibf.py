"""IBF container: host build (vectorized scatter), save/load, device query.

File format (``.ibf``): a NumPy ``.npz`` with a JSON header — our own
TPU-native format, functionally equivalent to the reference's cereal
archive contents (version, IBFConfig, hashes_count, bin_map, bit data;
reference layout: GanonBuild.cpp:251-288).
"""

from __future__ import annotations

import io
import json
import math
import zipfile

import numpy as np

from ganon_tpu.index.config import IBFConfig
from ganon_tpu.index import sizing
from ganon_tpu.ops.ibf_query import ibf_row_indices_np

MAGIC = "ganon-tpu-ibf-v1"


class IBF:
    """Interleaved Bloom filter as a dense ``uint32[bin_size, n_words]``.

    Attributes:
      bits: uint32 [bin_size_bits, n_words] bit-matrix (numpy, host).
      ibf_config: IBFConfig.
      hashes_count: {target: distinct-minimizer count} (insertion order is
        the canonical target order).
      bin_map: list[(binno, target)] technical-bin ownership.
    """

    def __init__(self, bits, ibf_config: IBFConfig, hashes_count, bin_map):
        self.bits = bits
        self.ibf_config = ibf_config
        self.hashes_count = dict(hashes_count)
        self.bin_map = list(bin_map)

    # --- derived views -----------------------------------------------------

    @property
    def bin_count(self) -> int:
        return self.ibf_config.n_bins

    @property
    def technical_bins(self) -> int:
        return self.bits.shape[1] * 32

    def target_bins(self) -> dict[str, list[int]]:
        out: dict[str, list[int]] = {}
        for binno, target in self.bin_map:
            out.setdefault(target, []).append(binno)
        return out

    def targets(self) -> list[str]:
        return list(self.hashes_count.keys())

    def bin_to_target_ids(self) -> np.ndarray:
        """int32 [technical_bins]; padding bins get id == num_targets."""
        tids = {t: i for i, t in enumerate(self.targets())}
        arr = np.full((self.technical_bins,), len(tids), dtype=np.int32)
        for binno, target in self.bin_map:
            arr[binno] = tids[target]
        return arr

    def target_fpr(self) -> dict[str, float]:
        return sizing.target_fpr(self.hashes_count, self.ibf_config)

    # --- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        header = {
            "magic": MAGIC,
            "ibf_config": self.ibf_config.to_dict(),
            "targets": self.targets(),
            "hashes_count": [self.hashes_count[t] for t in self.targets()],
            "bin_map": self.bin_map,
        }
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".tmp.npz",
            header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
            bits=self.bits,
        )
        if not path.endswith(".npz"):
            import os

            os.replace(path + ".tmp.npz", path)

    @classmethod
    def load(cls, path: str) -> "IBF":
        if not zipfile.is_zipfile(path):
            # reference-format cereal archive (cross-compatibility)
            from ganon_tpu.index import serialize

            if serialize.is_cereal_ibf(path):
                return serialize.read_ibf(path)
            raise ValueError(f"unrecognized IBF file format: {path}")
        with np.load(path, allow_pickle=False) as z:
            header = json.loads(bytes(z["header"].tobytes()).decode())
            if header.get("magic") != MAGIC:
                raise ValueError(f"not a ganon-tpu IBF file: {path}")
            bits = z["bits"]
        cfg = IBFConfig.from_dict(header["ibf_config"])
        hashes_count = dict(zip(header["targets"], header["hashes_count"]))
        bin_map = [(int(b), t) for b, t in header["bin_map"]]
        return cls(bits, cfg, hashes_count, bin_map)


def is_ganon_tpu_ibf(path: str) -> bool:
    try:
        if not zipfile.is_zipfile(path):
            return False
        with np.load(path, allow_pickle=False) as z:
            if "header" not in z:
                return False
            header = json.loads(bytes(z["header"].tobytes()).decode())
            return header.get("magic") == MAGIC
    except Exception:
        return False


def _scatter_bits(bits: np.ndarray, rows: np.ndarray, bins: np.ndarray) -> None:
    """OR bit ``bins[i]`` into row ``rows[i]`` for all i (duplicate-safe).

    Sort-and-reduce instead of ``np.bitwise_or.at`` (orders of magnitude
    faster for large inserts).
    """
    n_words = bits.shape[1]
    widx = rows.astype(np.int64) * n_words + (bins >> 5)
    mask = (np.uint32(1) << (bins & 31).astype(np.uint32)).astype(np.uint32)
    order = np.argsort(widx, kind="stable")
    widx = widx[order]
    mask = mask[order]
    boundaries = np.flatnonzero(np.r_[True, widx[1:] != widx[:-1]])
    merged = np.bitwise_or.reduceat(mask, boundaries)
    flat = bits.reshape(-1)
    flat[widx[boundaries]] |= merged


def build_ibf(
    target_hashes: dict[str, np.ndarray],
    *,
    kmer_size: int,
    window_size: int,
    max_fp: float = 0.05,
    filter_size: float = 0.0,
    hash_functions: int = 0,
    mode: str = "avg",
) -> IBF:
    """Build an IBF from per-target minimizer arrays (sorted, deduplicated).

    ``target_hashes`` values are uint64 arrays of distinct minimizers in a
    deterministic (sorted) order; the split of a target across technical
    bins follows index ranges over that order.
    """
    hashes_count = {t: int(len(h)) for t, h in target_hashes.items()}
    cfg = IBFConfig(kmer_size=kmer_size, window_size=window_size)
    sizing.optimal_hashes(
        max_fp if not filter_size else 0.0,
        filter_size,
        cfg,
        hashes_count,
        hash_functions=hash_functions,
        mode=mode,
    )
    cfg.true_max_fp, cfg.true_avg_fp = sizing.true_false_positive(
        hashes_count, cfg.max_hashes_bin, cfg.bin_size_bits, cfg.hash_functions
    )
    if cfg.n_bins == 0:
        raise ValueError("no valid sequences to build")

    splits = sizing.split_target_bins(cfg, hashes_count)
    technical = sizing.optimal_bins(cfg.n_bins)
    n_words = technical // 32
    bits = np.zeros((cfg.bin_size_bits, n_words), dtype=np.uint32)

    all_rows = []
    all_bins = []
    for binno, target, st, en in splits:
        h = np.asarray(target_hashes[target][st : en + 1], dtype=np.uint64)
        rows = ibf_row_indices_np(
            h, bin_size=cfg.bin_size_bits, hash_functions=cfg.hash_functions
        )  # [n, S]
        all_rows.append(rows.reshape(-1))
        all_bins.append(np.full(rows.size, binno, dtype=np.int64))
    if all_rows:
        _scatter_bits(bits, np.concatenate(all_rows), np.concatenate(all_bins))

    bin_map = [(binno, target) for binno, target, _, _ in splits]
    return IBF(bits, cfg, hashes_count, bin_map)
