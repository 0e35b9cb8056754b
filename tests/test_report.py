"""Report/.tre generation: arithmetic invariants and formats.

Mirrors the reference integration oracles (tests/ganon/utils.py:351-455):
percentages <= 100 and consistent, children <= cumulative, redistribution
conserves reads, genome-size correction conserves totals.
"""

import os

import pytest

from ganon_tpu.report.report import ReportConfig, report, parse_rep
from ganon_tpu.report.table import TableConfig, table


TAX_ROWS = [
    # node, parent, rank, name, genome_size
    ("1", "0", "root", "root", "1000"),
    ("B", "1", "domain", "Bacteria", "1000"),
    ("P1", "B", "phylum", "Phylum1", "1000"),
    ("G1", "P1", "genus", "Genus1", "1000"),
    ("S1", "G1", "species", "Species1", "800"),
    ("S2", "G1", "species", "Species2", "1200"),
    ("G2", "P1", "genus", "Genus2", "2000"),
    ("S3", "G2", "species", "Species3", "2000"),
]


def write_tax(path):
    with open(path, "w") as f:
        for row in TAX_ROWS:
            f.write("\t".join(row) + "\n")
    return str(path)


def write_rep(path, rows, classified, unclassified):
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(str(v) for v in row) + "\n")
        f.write(f"#total_classified\t{classified}\n")
        f.write(f"#total_unclassified\t{unclassified}\n")
    return str(path)


REP_ROWS = [
    # hierarchy, target, direct_matches, unique, lca
    ("H1", "S1", 30, 20, 5),
    ("H1", "S2", 15, 10, 2),
    ("H1", "S3", 8, 6, 1),
    ("H1", "G1", 12, 0, 7),  # lca reads at genus -> redistribute to S1/S2
]


def read_tre(path):
    with open(path) as f:
        return [line.rstrip("\n").split("\t") for line in f]


@pytest.fixture()
def setup(tmp_path):
    tax = write_tax(tmp_path / "db.tax")
    classified = sum(r[3] + r[4] for r in REP_ROWS)
    rep = write_rep(tmp_path / "results.rep", REP_ROWS, classified, 10)
    return tmp_path, tax, rep, classified


def test_report_reads(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "out")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out, report_type="reads",
        ranks=["all"],
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    assert rows[0][0] == "unclassified"
    assert int(rows[0][7]) == 10
    by_node = {r[1]: r for r in rows[1:]}
    total = classified + 10
    # root cumulative == classified
    assert int(by_node["1"][7]) == classified
    assert abs(float(by_node["1"][8]) - classified / total * 100) < 1e-3
    # children <= cumulative; unique+shared+children == cum
    for node, r in by_node.items():
        unique, shared, children, cum = map(int, r[4:8])
        assert unique + shared + children == cum
        assert children >= 0
    # parent cumulative >= child cumulative
    assert int(by_node["G1"][7]) >= int(by_node["S1"][7])
    # lineage column
    assert by_node["S1"][2].split("|") == ["1", "B", "P1", "G1", "S1"]


def test_report_abundance_redistribution(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "ab")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out,
        report_type="dist", ranks=["all"],
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    by_node = {r[1]: r for r in rows[1:]}
    # G1's 7 lca reads redistributed to S1/S2 proportionally to unique
    # (20:10): S1 +4 (floor 4.67->4, +1 leftover to top), S2 +2
    s1_shared = int(by_node["S1"][5])
    s2_shared = int(by_node["S2"][5])
    assert s1_shared + s2_shared == 5 + 2 + 7  # original lca + redistributed
    # G1 keeps no lca of its own; its cum = children sums
    assert int(by_node["G1"][5]) == 0
    # total reads conserved at root
    assert int(by_node["1"][7]) == classified


def test_report_abundance_genome_size(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "gs")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out,
        report_type="abundance",
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    by_node = {r[1]: r for r in rows[1:]}
    # percentages at species rank should not sum above 100
    perc = sum(float(r[8]) for n, r in by_node.items() if r[0] == "species")
    assert perc <= 100.0 + 1e-6


def test_report_matches_type(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "mt")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out, report_type="matches",
        ranks=["all"],
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    assert rows[0][0] != "unclassified"  # no unclassified line for matches
    by_node = {r[1]: r for r in rows}
    total_matches = sum(r[2] for r in REP_ROWS)
    assert int(by_node["1"][7]) == total_matches


def test_report_filters(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "fl")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out, report_type="reads",
        ranks=["all"], min_count=20,
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    for r in rows[1:]:
        if r[1] == "1":
            continue
        assert int(r[7]) >= 20


def test_report_ranks_selection(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "rk")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out, report_type="reads",
        ranks=["species"],
    )
    assert report(cfg)
    rows = read_tre(out + ".tre")
    ranks = {r[0] for r in rows[1:]}
    assert ranks <= {"root", "species"}


def test_report_bioboxes(setup):
    tmp, tax, rep, classified = setup
    out = str(tmp / "bb")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out, report_type="reads",
        output_format="bioboxes",
    )
    assert report(cfg)
    with open(out + ".tre") as f:
        lines = [line.rstrip("\n") for line in f]
    assert lines[0] == "@Version:0.10.0"
    assert lines[4].startswith("@@TAXID")
    data = [line.split("\t") for line in lines[5:]]
    for row in data:
        assert len(row) == 5
        assert row[1] in {"domain", "phylum", "class", "order", "family",
                          "genus", "species", "assembly", "na"}


def test_table_from_tre(setup, tmp_path):
    tmp, tax, rep, classified = setup
    out1 = str(tmp / "s1")
    out2 = str(tmp / "s2")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out1, report_type="reads",
        ranks=["all"],
    )
    assert report(cfg)
    cfg.output_prefix = out2
    assert report(cfg)

    tbl_file = str(tmp_path / "table.tsv")
    tcfg = TableConfig(
        input=[out1 + ".tre", out2 + ".tre"], output_file=tbl_file,
        header="taxid",
    )
    assert table(tcfg)
    with open(tbl_file) as f:
        rows = [line.rstrip("\n").split("\t") for line in f]
    header = rows[0]
    # default orientation: taxa as rows, samples as columns
    assert header[1:] == [out1 + ".tre", out2 + ".tre"]
    data = {r[0]: [int(v) for v in r[1:]] for r in rows[1:]}
    # de-cumulated: species S1 keeps its own reads only
    classified_total = sum(v[0] for v in data.values())
    assert classified_total == classified  # every read counted exactly once


def test_table_rank_selection(setup, tmp_path):
    tmp, tax, rep, classified = setup
    out1 = str(tmp / "r1")
    cfg = ReportConfig(
        input=[rep], db_prefix=[tax], output_prefix=out1, report_type="reads",
        ranks=["all"],
    )
    assert report(cfg)
    tbl_file = str(tmp_path / "tr.tsv")
    tcfg = TableConfig(
        input=[out1 + ".tre"], output_file=tbl_file, rank="species",
        header="taxid",
    )
    assert table(tcfg)
    with open(tbl_file) as f:
        rows = [line.rstrip("\n").split("\t") for line in f]
    taxids = [r[0] for r in rows[1:]]
    assert set(taxids) <= {"S1", "S2", "S3"}
