"""Long-read semantics must be identical across the two read paths.

The native C++ reader grows rows to the longest record; the Python
fallback (used for bz2/xz inputs) must do the same — never truncate.
The reference never truncates either: reads whose minimizer count
exceeds the counter width are SKIPPED (GanonClassify.cpp:705,739-741).
A silent 16 KB prefix truncation (pre round-4 behavior) classified
reads the reference would have scored differently.
"""

import bz2
import os

import numpy as np
import pytest

from ganon_tpu.classify.engine import ClassifyConfig, run_classify
from ganon_tpu.io.pipeline import encoded_batches

from test_classify import build_db

K, W = 19, 31
BASES = "ACGT"


def _long_genome(rng, n):
    return "".join(BASES[int(b)] for b in rng.integers(0, 4, size=n))


def _write_fastq_bytes(entries):
    out = []
    for name, seq in entries:
        out.append(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return "".join(out).encode()


@pytest.fixture(scope="module")
def longread_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("longread")
    rng = np.random.default_rng(3)
    genome = _long_genome(rng, 40_000)
    db = build_db(tmp, {"G1": genome}, k=K, w=W, max_fp=0.001)
    # one 20 kb read (well past the old 16 KB cap), one short read, and
    # one random (unclassifiable) read
    reads = [
        ("long20k", genome[5_000:25_000]),
        ("short", genome[100:250]),
        ("junk", _long_genome(np.random.default_rng(9), 150)),
    ]
    payload = _write_fastq_bytes(reads)
    plain = tmp / "reads.fq"
    plain.write_bytes(payload)
    bz = tmp / "reads.fq.bz2"
    bz.write_bytes(bz2.compress(payload))
    return tmp, db, str(plain), str(bz)


def test_python_reader_never_truncates(longread_setup):
    _, _, _, bz = longread_setup
    batches = list(encoded_batches(bz, None, "", 64, use_native=False))
    lens = np.concatenate([b.len1 for b in batches])
    assert int(lens.max()) == 20_000  # the full read, not a 16 KB prefix


def test_bz2_python_path_matches_native_plain_path(longread_setup):
    tmp, db, plain, bz = longread_setup

    def classify(reads_file, tag):
        out = str(tmp / tag)
        run_classify(
            ClassifyConfig(
                ibf=[db],
                single_reads=[reads_file],
                output_prefix=out,
                rel_cutoff=[0.25],
                output_all=True,
                output_unclassified=True,
                quiet=True,
            )
        )
        def rows(p):
            if not os.path.exists(p):
                return []
            with open(p) as f:
                return sorted(f.read().splitlines())

        return {ext: rows(out + ext) for ext in (".all", ".one", ".unc", ".rep")}

    got_native = classify(plain, "native")   # native reader (plain file)
    got_python = classify(bz, "python")      # python reader (bz2)
    assert got_native == got_python
    # and the long read actually classified (it is under hashes_limit)
    assert any("long20k" in r for r in got_native[".all"])


def test_over_limit_read_is_skipped_not_truncated(longread_setup):
    """A read whose window count exceeds hashes_limit must be skipped
    as 'big' (reference semantics), on both reader paths."""
    tmp, db, _, _ = longread_setup
    rng = np.random.default_rng(4)
    genome_like = _long_genome(rng, 2_000)
    reads = [("tiny", genome_like[:200])]
    payload = _write_fastq_bytes(reads)
    for tag, path in (
        ("plain_big", tmp / "big.fq"),
        ("bz2_big", tmp / "big.fq.bz2"),
    ):
        if str(path).endswith(".bz2"):
            path.write_bytes(bz2.compress(payload))
        else:
            path.write_bytes(payload)
        out = str(tmp / tag)
        stats = run_classify(
            ClassifyConfig(
                ibf=[db],
                single_reads=[str(path)],
                output_prefix=out,
                rel_cutoff=[0.25],
                # a 200 bp read carries ~13 distinct minimizers at
                # k=19/w=31 — limit 5 forces the big-read skip
                hashes_limit=5,
                output_unclassified=True,
                quiet=True,
            )
        )
        with open(out + ".unc") as f:
            unc = f.read().splitlines()
        assert unc == ["tiny"]
        tot = stats["totals"][""]
        assert tot.seqs_classified == 0
        assert tot.seqs_skipped_big == 1
