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


def test_next_pieces_matches_python_reader(tmp_path):
    """Native piece streaming == python chunking for mixed-length fasta."""
    import gzip

    import numpy as np

    from ganon_tpu.native import NativeSeqReader
    from ganon_tpu.io.sequence import SequenceReader
    from ganon_tpu.ops.minimizers import encode_seqs

    if not NativeSeqReader.available():
        import pytest

        pytest.skip("no compiler")

    rng = np.random.default_rng(5)
    CH, OV = 4096, 30
    seqs = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
        for n in (10000, 4096, 4095, 100, 31, 30, 12000)
    ]
    path = tmp_path / "mix.fna.gz"
    with gzip.open(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n")
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + "\n")

    # python reference chunking
    expect = []
    for _id, s in SequenceReader(str(path)):
        if len(s) < 31:  # min_len
            continue
        step = CH - OV
        for st in range(0, max(len(s) - OV, 1), step):
            piece = s[st : st + CH]
            if len(piece) <= OV and st > 0:
                continue
            enc, _ = encode_seqs([piece], max_len=len(piece))
            expect.append(enc[0])

    got = []
    r = NativeSeqReader(str(path))
    tot = [0, 0, 0]
    while True:
        codes, lens, st = r.next_pieces(3, CH, OV, 31)
        for a, b in zip(tot, st):
            pass
        tot = [a + b for a, b in zip(tot, st)]
        if not len(codes):
            break
        for i in range(len(codes)):
            got.append(codes[i, : lens[i]])
    assert tot[0] == len(seqs)
    assert tot[1] == 1  # the 30bp sequence skipped
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        np.testing.assert_array_equal(g, e)


def test_adaptive_batch_growth_no_truncation(tmp_path):
    """next_batch_adaptive grows its row width for long records instead
    of truncating, splitting the batch at the growth point; _read_exact
    keeps mate pairing aligned across the splits."""
    import random

    rng = random.Random(5)
    long_seq = "".join(rng.choice("ACGT") for _ in range(5000))
    recs = [(f"s{i}", "ACGT" * 30) for i in range(6)]
    recs.insert(3, ("long", long_seq))
    p = str(tmp_path / "mix.fq")
    _write_fastq(p, recs)

    r = NativeSeqReader(p)
    got = []
    while True:
        ids, codes, lengths = r.next_batch_adaptive(100)
        if not ids:
            break
        for i, rid in enumerate(ids):
            got.append((rid, int(lengths[i]), codes[i, :lengths[i]]))
    assert [g[0] for g in got] == [rid for rid, _ in recs]
    by_id = {g[0]: g for g in got}
    assert by_id["long"][1] == 5000  # NOT truncated
    want, _ = encode_seqs([long_seq], max_len=5000)
    assert (by_id["long"][2] == want[0]).all()
    assert r._cur_width >= 5000  # width grew

    # _read_exact pairs across the growth split
    from ganon_tpu.io.pipeline import _read_exact

    r2 = NativeSeqReader(p)
    codes, lengths = _read_exact(r2, len(recs))
    assert len(lengths) == len(recs)
    assert int(lengths[3]) == 5000
