"""Native C++ sequence reader: parity with the Python reader."""

import gzip

import numpy as np
import pytest

from ganon_tpu.native import NativeSeqReader
from ganon_tpu.io.sequence import SequenceReader
from ganon_tpu.ops.minimizers import encode_seqs

pytestmark = pytest.mark.skipif(
    not NativeSeqReader.available(), reason="no native toolchain"
)


def _write_fastq(path, records, compress=False):
    op = gzip.open if compress else open
    with op(path, "wt") as f:
        for rid, seq in records:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")


def _write_fasta(path, records, wrap=0):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n")
            if wrap:
                for i in range(0, len(seq), wrap):
                    f.write(seq[i : i + wrap] + "\n")
            else:
                f.write(seq + "\n")


RECORDS = [
    ("read1 with description", "ACGTACGTAC"),
    ("read2", "TTTTNNNGGGG"),
    ("read3", "acgtu"),
    ("read4", "A" * 300),
]


@pytest.mark.parametrize("compress", [False, True])
def test_fastq_parity(tmp_path, compress):
    p = str(tmp_path / ("r.fq.gz" if compress else "r.fq"))
    _write_fastq(p, RECORDS, compress)

    r = NativeSeqReader(p)
    ids, codes, lengths = r.next_batch(10, 128)
    assert ids == [rid for rid, _ in RECORDS]
    want_codes, want_lengths = encode_seqs([s for _, s in RECORDS], max_len=128)
    assert (codes == want_codes).all()
    assert (lengths == want_lengths).all()
    ids2, c2, l2 = r.next_batch(10, 128)
    assert ids2 == []


def test_fasta_multiline(tmp_path):
    p = str(tmp_path / "r.fa")
    _write_fasta(p, RECORDS, wrap=7)
    r = NativeSeqReader(p)
    ids, codes, lengths = r.next_batch(10, 512)
    py = list(SequenceReader(p))
    assert ids == [rid for rid, _ in py]
    for i, (_, seq) in enumerate(py):
        assert lengths[i] == len(seq)
    want_codes, _ = encode_seqs([s for _, s in py], max_len=512)
    assert (codes == want_codes).all()


def test_batching(tmp_path):
    p = str(tmp_path / "many.fq")
    recs = [(f"r{i}", "ACGT" * 10) for i in range(25)]
    _write_fastq(p, recs)
    r = NativeSeqReader(p)
    seen = []
    while True:
        ids, codes, lengths = r.next_batch(10, 64)
        if not ids:
            break
        seen.extend(ids)
        assert (lengths == 40).all()
    assert seen == [f"r{i}" for i in range(25)]
