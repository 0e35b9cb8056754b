"""ganon table: the reference's full integration matrix on its golden
.tre fixtures (tests/ganon/integration/test_table.py — same inputs, same
exact expectations: column counts, count sums, filter invariants)."""

import os

import pandas as pd
import pytest

from ganon_tpu.config import Config
from ganon_tpu.report.table import TableConfig, table

DATA = "/root/reference/tests/ganon/data/table"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference golden .tre not available"
)

READS = [f"{DATA}/report_reads{i}.tre" for i in (1, 2, 3)]
MATCHES = [f"{DATA}/report_matches{i}.tre" for i in (1, 2, 3)]


def run_table(tmp_path, **params):
    out = str(tmp_path / "out.tsv")
    defaults = dict(
        input=READS, rank="species", transpose=True, output_file=out,
        quiet=True,
    )
    defaults.update(params)
    cfg = Config("table", **defaults)
    tcfg = TableConfig(**{
        k: getattr(cfg, k)
        for k in (
            "input", "input_extension", "output_file", "output_value",
            "output_format", "top_sample", "top_all", "min_frequency",
            "rank", "header", "unclassified_label", "filtered_label",
            "skip_zeros", "transpose", "no_root", "min_count", "max_count",
            "taxids", "names", "names_with", "quiet",
        )
    })
    assert table(tcfg)
    df = pd.read_table(out, sep="\t", index_col=0)
    assert (df.values >= 0).all()
    if defaults.get("output_value") == "percentage":
        assert (df.values <= 1).all()
        assert (df.sum(axis=1) <= 1 + 1e-9).all()
    return df


def test_default(tmp_path):
    df = run_table(tmp_path)
    assert df.shape[0] == 3  # three samples


def test_input_directory(tmp_path):
    df = run_table(tmp_path, input=[DATA], input_extension=".tre")
    assert df.shape[0] == 6  # all six fixture files


def test_rank_superkingdom(tmp_path):
    df = run_table(tmp_path, rank="superkingdom")
    assert df.columns.size == 1  # just Bacteria


def test_no_rank(tmp_path):
    df = run_table(tmp_path, rank="", header="lineage")
    assert df.columns.size == 50
    assert "1|2" in df.columns.values
    assert "1|2|1239|909932|1843489|31977" in df.columns.values
    assert df.sum().sum() == 1973568


def test_no_rank_unclassified(tmp_path):
    df = run_table(tmp_path, rank="", header="lineage",
                   unclassified_label="unclassified")
    assert df.columns.size == 51
    assert df.sum().sum() == 3786439


def test_no_rank_no_root(tmp_path):
    df = run_table(tmp_path, rank="", header="lineage", no_root=True)
    assert df.columns.size == 49
    assert "2" in df.columns.values
    assert "2|1239|909932|1843489|31977" in df.columns.values
    assert df.sum().sum() == 1703834


def test_no_rank_no_root_unclassified(tmp_path):
    df = run_table(tmp_path, rank="", header="lineage", no_root=True,
                   unclassified_label="unclassified")
    assert df.columns.size == 50
    assert "unclassified" in df.columns.values
    assert df.sum().sum() == 3786439


@pytest.mark.parametrize("value,bound,kind", [
    ("counts", 15000, "min"), ("percentage", 0.01, "min"),
    ("counts", 14000, "max"), ("percentage", 0.02, "max"),
])
def test_min_max_count(tmp_path, value, bound, kind):
    key = "min_count" if kind == "min" else "max_count"
    df = run_table(tmp_path, output_value=value, **{key: bound})
    if kind == "min":
        assert ((df == 0) | (df >= bound)).all(axis=None)
    else:
        assert ((df == 0) | (df <= bound)).all(axis=None)


def test_taxids_relative(tmp_path):
    df = run_table(tmp_path, taxids=["838"])  # genus Prevotella
    assert all("Prevotella" in c for c in df.columns.values)
    assert df.columns.size > 0


def test_taxids_direct(tmp_path):
    df = run_table(tmp_path, taxids=["1110546"])
    assert list(df.columns.values) == ["Veillonella tobetsuensis"]


def test_names(tmp_path):
    df = run_table(tmp_path, names=["Veillonella tobetsuensis"])
    assert list(df.columns.values) == ["Veillonella tobetsuensis"]


def test_names_with(tmp_path):
    df = run_table(tmp_path, names_with=["Prevotella"])
    assert all("Prevotella" in c for c in df.columns.values)
    assert df.columns.size > 0


def test_top_sample(tmp_path):
    df = run_table(tmp_path, top_sample=1, rank="genus")
    assert df.shape[1] == 3  # each sample has a different top genus


def test_top_all(tmp_path):
    df = run_table(tmp_path, top_all=1, rank="genus")
    assert df.shape[1] == 1


@pytest.mark.parametrize("min_frequency", [3, 0.9])
def test_min_frequency(tmp_path, min_frequency):
    df = run_table(tmp_path, min_frequency=min_frequency, rank="phylum")
    assert (df.values > 0).all()


def test_extra_cols(tmp_path):
    df1 = run_table(tmp_path, min_count=0.02, rank="genus",
                    unclassified_label="UNC", filtered_label="FIL")
    assert set(df1.columns.values[-2:]) <= {"UNC", "FIL"}
    df2 = run_table(tmp_path, min_count=0.02, rank="genus",
                    unclassified_label="UNC", filtered_label="")
    assert df2.columns.values[-1] == "UNC" and "FIL" not in df2.columns
    df3 = run_table(tmp_path, min_count=0.02, rank="genus",
                    unclassified_label="", filtered_label="FIL")
    assert df3.columns.values[-1] == "FIL" and "UNC" not in df3.columns
    df4 = run_table(tmp_path, min_count=0.02, rank="genus",
                    unclassified_label="UNASSIGNED",
                    filtered_label="UNASSIGNED")
    assert df4.columns.values[-1] == "UNASSIGNED"
    assert (df1[["UNC", "FIL"]].sum(axis=1) == df4["UNASSIGNED"]).all()


def test_skip_zeros(tmp_path):
    df = run_table(tmp_path, skip_zeros=True, min_count=0.02, no_root=True)
    assert df.shape[0] == 1


def test_matches_input(tmp_path):
    df = run_table(tmp_path, input=MATCHES,
                   unclassified_label="unclassified")
    assert df["unclassified"].sum() == 0


def test_headers(tmp_path):
    df = run_table(tmp_path, header="lineage")
    assert all("|" in c for c in df.columns.values)
    df = run_table(tmp_path, header="taxid")
    assert all(c.isdigit() for c in df.columns.values)


def test_csv_output(tmp_path):
    out = str(tmp_path / "out.csv")
    cfg = TableConfig(input=READS, rank="species", transpose=True,
                      output_file=out, output_format="csv", quiet=True)
    assert table(cfg)
    df = pd.read_csv(out, index_col=0)
    assert df.shape[0] == 3


def test_no_transpose_orientation(tmp_path):
    df_t = run_table(tmp_path, transpose=True)
    df = run_table(tmp_path, transpose=False)
    assert df.shape == (df_t.shape[1], df_t.shape[0])
