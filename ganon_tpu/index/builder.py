"""Index construction engine (ganon-build equivalent).

Reads a ``target_info`` table (``file [<tab> target]`` rows,
reference contract GanonBuild.cpp:86-136), extracts per-target minimizer
sets with the device kernel (long sequences are chunked with ``w-1``
overlap so every window is covered by exactly one chunk pass), sizes the
filter, and builds/saves the IBF.

Reference behaviors kept:
* hashes are deduplicated per *file* (duplicates across files of the same
  target are stored and counted twice — GanonBuild.cpp:225-240),
* sequences shorter than ``min_length`` are skipped,
* a missing/empty input file is a warning, not an error.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field

import numpy as np

from ganon_tpu.index.ibf import IBF, build_ibf
from ganon_tpu.io.sequence import SequenceReader
from ganon_tpu.ops.minimizers import encode_seqs, window_mins_jax

# chunk length for device minimizer extraction over long sequences
CHUNK = 1 << 18


@dataclass
class BuildStats:
    files: int = 0
    invalid_files: int = 0
    sequences: int = 0
    skipped_sequences: int = 0
    length_bp: int = 0


@dataclass
class BuildConfig:
    input_file: str = ""
    output_file: str = ""
    kmer_size: int = 19
    window_size: int = 31
    max_fp: float = 0.05
    filter_size: float = 0.0
    hash_functions: int = 0
    mode: str = "avg"
    min_length: int = 0
    quiet: bool = True
    verbose: bool = False
    filter_format: str = "tpu"  # tpu (npz) | reference (cereal, cross-loadable)

    def validate(self):
        if not self.input_file:
            raise ValueError("--input-file is mandatory")
        if not self.output_file:
            raise ValueError("--output-file is mandatory")
        if self.hash_functions > 5:
            raise ValueError("--hash-functions must be <=5")
        if self.filter_size == 0 and self.max_fp == 0:
            raise ValueError("--max-fp or --filter-size is mandatory")
        if self.filter_size > 0:
            self.max_fp = 0
        if self.window_size < self.kmer_size:
            raise ValueError("--window-size has to be >= --kmer-size")
        if self.kmer_size > 32:
            raise ValueError("--kmer-size has to be <= 32")
        if self.mode not in ("avg", "smaller", "smallest", "faster", "fastest"):
            raise ValueError("invalid --mode")


def parse_target_info(
    input_file: str, quiet: bool, stats: BuildStats
) -> dict[str, list[str]]:
    """``file [<tab> target]`` rows -> {target: [files]} (insertion order)."""
    input_map: dict[str, list[str]] = {}
    seen_files = set()
    with open(input_file) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            path = fields[0]
            seen_files.add(path)
            if not os.path.exists(path) or os.path.getsize(path) == 0:
                if not quiet:
                    print(
                        f"WARNING: input file not found/empty: {path}",
                        file=sys.stderr,
                    )
                stats.invalid_files += 1
                continue
            target = fields[1] if len(fields) >= 2 else os.path.basename(path)
            input_map.setdefault(target, []).append(path)
    stats.files = len(seen_files)
    return input_map


def sequence_hashes(
    seq: str, k: int, w: int, _batch: list | None = None
) -> np.ndarray:
    """Distinct minimizer values of one sequence (device, chunked).

    Uses the compaction-free window-min kernel: the set of window minima
    equals the set of emitted minimizers, and build deduplicates anyway.
    """
    if len(seq) < w:
        return np.empty(0, dtype=np.uint64)
    step = CHUNK - (w - 1)
    pieces = [seq[s : s + CHUNK] for s in range(0, max(len(seq) - w + 1, 1), step)]
    out = []
    for piece in pieces:
        L = CHUNK if len(piece) == CHUNK else _bucket(len(piece))
        codes, lengths = encode_seqs([piece], max_len=L)
        mv, valid = window_mins_jax(codes, lengths, k=k, w=w)
        mv, valid = np.asarray(mv)[0], np.asarray(valid)[0]
        vals = mv[valid]
        if len(vals):
            out.append(np.unique(vals))
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(out))


def _bucket(n: int, minimum: int = 4096) -> int:
    b = minimum
    while b < n:
        b *= 2
    return min(b, CHUNK)


def file_hash_set(
    path: str, k: int, w: int, min_length: int, stats: BuildStats
) -> np.ndarray:
    """Sorted unique minimizers over all sequences of one file."""
    parts = []
    for _id, seq in SequenceReader(path):
        if len(seq) < min_length:
            stats.skipped_sequences += 1
            continue
        stats.sequences += 1
        stats.length_bp += len(seq)
        parts.append(sequence_hashes(seq, k, w))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def count_target_hashes(
    input_map: dict[str, list[str]],
    *,
    kmer_size: int,
    window_size: int,
    min_length: int = 0,
    stats: BuildStats | None = None,
) -> dict[str, np.ndarray]:
    """{target: concatenated per-file unique minimizer arrays}."""
    stats = stats if stats is not None else BuildStats()
    out: dict[str, np.ndarray] = {}
    for target, files in input_map.items():
        per_file = [
            file_hash_set(f, kmer_size, window_size, min_length, stats)
            for f in files
        ]
        out[target] = (
            np.concatenate(per_file) if per_file else np.empty(0, dtype=np.uint64)
        )
    return out


def run_build(cfg: BuildConfig) -> IBF:
    """Full ganon-build equivalent: parse, count, size, build, save."""
    cfg.validate()
    stats = BuildStats()
    input_map = parse_target_info(cfg.input_file, cfg.quiet, stats)
    if not input_map:
        raise ValueError("No valid input files")
    target_hashes = count_target_hashes(
        input_map,
        kmer_size=cfg.kmer_size,
        window_size=cfg.window_size,
        min_length=cfg.min_length,
        stats=stats,
    )
    # drop targets with zero hashes (sequences all too short)
    target_hashes = {t: h for t, h in target_hashes.items() if len(h)}
    if not target_hashes:
        raise ValueError("No valid sequences to build")
    ibf = build_ibf(
        target_hashes,
        kmer_size=cfg.kmer_size,
        window_size=cfg.window_size,
        max_fp=cfg.max_fp,
        filter_size=cfg.filter_size,
        hash_functions=cfg.hash_functions,
        mode=cfg.mode,
    )
    if cfg.output_file:
        if cfg.filter_format == "reference":
            from ganon_tpu.index import serialize

            serialize.write_ibf(ibf, cfg.output_file)
        else:
            ibf.save(cfg.output_file)
    if not cfg.quiet:
        c = ibf.ibf_config
        mb = (len(ibf.bits.tobytes())) / 1048576
        print(
            f"ganon-tpu build processed {stats.sequences} sequences "
            f"({stats.length_bp / 1e6:.2f} Mbp) — max fp {c.true_max_fp:.4f} "
            f"(avg {c.true_avg_fp:.4f}), filter size {mb:.2f}MB",
            file=sys.stderr,
        )
    return ibf
