"""End-to-end runs on the reference's bundled miniature data (read-only).

Uses the real genome assemblies, taxdump, assembly_summary and simulated
paired reads shipped in the reference's test data (data only — no code),
mirroring its integration suite. Skipped when the reference mount is
absent.
"""

import os

import pytest

from ganon_tpu.cli import main
from ganon_tpu.config import Config

DATA = "/root/reference/tests/ganon/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available"
)


@pytest.fixture(scope="module")
def real_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("realdb")
    db = str(tmp / "db")
    files_dir = os.path.join(DATA, "build-custom/files")
    ok = main(
        cfg=Config(
            "build-custom",
            db_prefix=db,
            input=[files_dir],
            input_extension="fna.gz",
            taxonomy="ncbi",
            taxonomy_files=[os.path.join(DATA, "build-custom/taxdump.tar.gz")],
            ncbi_file_info=[os.path.join(DATA, "build-custom/assembly_summary.txt")],
            genome_size_files=[
                os.path.join(DATA, "build-custom/species_genome_size.txt.gz")
            ],
            quiet=True,
        )
    )
    assert ok
    return db


def test_build_real_assemblies(real_db):
    from ganon_tpu.index.ibf import IBF

    ibf = IBF.load(real_db + ".ibf")
    # one target per assembly accession
    assert len(ibf.targets()) == 4
    for t in ibf.targets():
        assert t.startswith(("GCA_", "GCF_"))
    assert ibf.ibf_config.true_max_fp <= 0.05 * 1.05

    # .tax connects assemblies to the NCBI tree with genome sizes
    with open(real_db + ".tax") as f:
        rows = {r.split("\t")[0]: r.rstrip("\n").split("\t") for r in f}
    assert "1" in rows
    for t in ibf.targets():
        assert t in rows
        assert int(rows[t][4]) > 0


def test_classify_sim_reads_paired(real_db, tmp_path):
    out = str(tmp_path / "sim")
    ok = main(
        cfg=Config(
            "classify",
            db_prefix=[real_db],
            paired_reads=[
                os.path.join(DATA, "classify/sim.1.fq.gz"),
                os.path.join(DATA, "classify/sim.2.fq.gz"),
            ],
            output_prefix=out,
            multiple_matches="em",
            rel_cutoff=[0.25],
            output_one=True,
            output_all=True,
            output_unclassified=True,
            output_stats=True,
            quiet=True,
        )
    )
    assert ok
    # sanity oracle: classified + unclassified == input reads
    with open(out + ".rep") as f:
        trailer = {
            r.split("\t")[0]: int(r.split("\t")[1])
            for r in f
            if r.startswith("#")
        }
    import gzip

    n_reads = sum(
        1 for _ in gzip.open(os.path.join(DATA, "classify/sim.1.fq.gz"), "rt")
    ) // 4
    assert trailer["#total_classified"] + trailer["#total_unclassified"] == n_reads
    # simulated reads come from these genomes: most should classify
    assert trailer["#total_classified"] > 0.5 * n_reads

    with open(out + ".unc") as f:
        n_unc = sum(1 for _ in f)
    assert n_unc == trailer["#total_unclassified"]

    # chained EM + report outputs exist
    assert os.path.isfile(out + ".one")
    assert os.path.isfile(out + ".tre")
    assert os.path.isfile(out + ".sta")


def test_gtdb_taxonomy_build(tmp_path):
    db = str(tmp_path / "gtdb")
    files_dir = os.path.join(DATA, "build-custom/files")
    ok = main(
        cfg=Config(
            "build-custom",
            db_prefix=db,
            input=[files_dir],
            input_extension="fna.gz",
            taxonomy="skip",
            quiet=True,
        )
    )
    assert ok
    from ganon_tpu.index.ibf import IBF

    assert len(IBF.load(db + ".ibf").targets()) == 4
    assert not os.path.isfile(db + ".tax")  # taxonomy skipped


def test_table_on_reference_golden_tre(tmp_path):
    """Parse the reference's own golden .tre files (real ganon output)."""
    from ganon_tpu.report.table import TableConfig, table

    tre_files = [
        os.path.join(DATA, "table", f"report_reads{i}.tre") for i in (1, 2, 3)
    ]
    out = str(tmp_path / "table.tsv")
    assert table(
        TableConfig(input=tre_files, output_file=out, header="taxid")
    )
    with open(out) as f:
        rows = [r.rstrip("\n").split("\t") for r in f]
    assert len(rows) > 2
    assert len(rows[0]) == 4  # header + 3 samples
    # counts fully de-cumulated: sum per sample == classified reads (root)
    import gzip

    for col in (1, 2, 3):
        total = sum(int(r[col]) for r in rows[1:])
        assert total > 0

    # rank selection on real data
    out2 = str(tmp_path / "species.tsv")
    assert table(
        TableConfig(
            input=tre_files, output_file=out2, rank="species", header="name",
            output_value="percentage",
        )
    )
    with open(out2) as f:
        rows2 = [r.rstrip("\n").split("\t") for r in f]
    for col in (1, 2, 3):
        s = sum(float(r[col]) for r in rows2[1:])
        assert s <= 1.0 + 1e-9
