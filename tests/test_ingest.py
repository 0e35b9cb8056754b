"""Parallel file ingest: identical stream + identical IBF vs serial."""

import gzip

import numpy as np
import pytest

from ganon_tpu.index.builder import (
    BuildConfig,
    BuildStats,
    iter_pieces,
    run_build,
)

K, W = 19, 31
BASES = "ACGT"


def _write_fastas(tmp_path, rng, n_files=7, seqs_per_file=3, seq_len=700):
    """A mix of plain and gzipped fastas, several targets."""
    input_map = {}
    for i in range(n_files):
        name = f"f{i}.fna" + (".gz" if i % 2 else "")
        path = tmp_path / name
        opener = gzip.open if i % 2 else open
        with opener(path, "wt") as f:
            for j in range(seqs_per_file):
                # vary length; include one short (skipped by window) seq
                n = 40 if (i == 2 and j == 0) else seq_len + 37 * j
                seq = "".join(BASES[b] for b in rng.integers(0, 4, size=n))
                f.write(f">s{i}.{j}\n{seq}\n")
        target = f"T{i % 3}"  # several files per target
        input_map.setdefault(target, []).append(str(path))
    return input_map


def _collect(input_map, threads):
    stats = BuildStats()
    stream = [
        (key, row.tobytes())
        for key, row in iter_pieces(
            input_map, window_size=W, min_length=0, stats=stats,
            threads=threads,
        )
    ]
    return stream, stats


def test_parallel_stream_identical(tmp_path):
    rng = np.random.default_rng(7)
    input_map = _write_fastas(tmp_path, rng)
    serial, s_stats = _collect(input_map, threads=1)
    for threads in (2, 4, 16):
        par, p_stats = _collect(input_map, threads=threads)
        assert par == serial
        assert (
            p_stats.sequences,
            p_stats.skipped_sequences,
            p_stats.length_bp,
        ) == (s_stats.sequences, s_stats.skipped_sequences, s_stats.length_bp)


def test_parallel_stream_long_sequence_chunking(tmp_path):
    """Sequences longer than CHUNK split identically under threading."""
    from ganon_tpu.index.builder import CHUNK

    rng = np.random.default_rng(11)
    p1 = tmp_path / "long1.fna"
    p2 = tmp_path / "long2.fna"
    for p in (p1, p2):
        seq = "".join(BASES[b] for b in rng.integers(0, 4, size=CHUNK + 5000))
        p.write_text(f">long\n{seq}\n")
    input_map = {"A": [str(p1)], "B": [str(p2)]}
    serial, _ = _collect(input_map, threads=1)
    par, _ = _collect(input_map, threads=2)
    assert par == serial


def test_parallel_build_identical_ibf(tmp_path):
    rng = np.random.default_rng(3)
    input_map = _write_fastas(tmp_path, rng, n_files=5)
    rows = []
    for target, files in input_map.items():
        for path in files:
            rows.append(f"{path}\t{target}")
    info = tmp_path / "target_info.tsv"
    info.write_text("\n".join(rows) + "\n")

    outs = []
    for threads in (1, 4):
        out = tmp_path / f"db{threads}.ibf"
        run_build(
            BuildConfig(
                input_file=str(info),
                output_file=str(out),
                kmer_size=K,
                window_size=W,
                max_fp=0.05,
                threads=threads,
            )
        )
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_parallel_reader_error_propagates(tmp_path):
    rng = np.random.default_rng(5)
    input_map = _write_fastas(tmp_path, rng, n_files=3)
    # corrupt gz content under a .gz name -> reader error mid-stream
    bad = tmp_path / "bad.fna.gz"
    bad.write_bytes(b"\x1f\x8b not actually gzip")
    input_map["T9"] = [str(bad)]
    with pytest.raises(Exception):
        _collect(input_map, threads=4)


def test_xz_input_matches_plain(tmp_path):
    """xz-compressed fastq reads identically to the plain file (the
    native reader bows out for .xz; the Python xopen handles it by
    magic bytes)."""
    import lzma

    import numpy as np

    from ganon_tpu.io.pipeline import encoded_batches

    payload = b"".join(
        b"@q%d\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n" % i
        for i in range(25)
    )
    plain = tmp_path / "r.fq"
    plain.write_bytes(payload)
    xz = tmp_path / "r.fq.xz"
    xz.write_bytes(lzma.compress(payload))

    def collect(p):
        ids, codes = [], []
        for b in encoded_batches(str(p), None, "", 8, use_native=False):
            ids.extend(b.ids)
            codes.append(b.codes1)
        return ids, np.concatenate(codes)

    ids_p, c_p = collect(plain)
    ids_x, c_x = collect(xz)
    assert ids_p == ids_x == [f"q{i}" for i in range(25)]
    assert np.array_equal(c_p, c_x)


def test_misnamed_bz2_routes_to_python_reader(tmp_path):
    """A bz2 file without the .bz2 extension must still route to the
    Python reader (magic sniffing) and parse correctly."""
    import bz2

    from ganon_tpu.io.pipeline import encoded_batches, native_supported

    payload = b"@q0\nACGTACGT\n+\nIIIIIIII\n"
    p = tmp_path / "reads.fq"  # lies about its format
    p.write_bytes(bz2.compress(payload))
    assert not native_supported(str(p))
    batches = list(encoded_batches(str(p), None, "", 8))
    assert [i for b in batches for i in b.ids] == ["q0"]
