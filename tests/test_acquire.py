"""ganon build / update with the acquisition layer (genome_updater
equivalent), driven against the reference's bundled fake repository tree
via the same ``local_dir`` contract its integration tests use
(tests/ganon/integration/test_build.py:39-40, test_update.py).
"""

import os
import pickle

import pytest

from ganon_tpu.cli import main
from ganon_tpu.config import Config

REPO = "/root/reference/tests/ganon/data/build"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REPO), reason="reference fake repository not available"
)


@pytest.fixture(autouse=True)
def local_repo(monkeypatch):
    monkeypatch.setenv("local_dir", REPO)


def _build(tmp_path, name, **kwargs):
    params = dict(
        db_prefix=str(tmp_path / name),
        organism_group=["archaea", "bacteria", "viral"],
        source=["genbank"],
        taxonomy="skip",
        level="assembly",
        threads=1,
        filter_type="ibf",
        write_info_file=True,
        keep_files=True,
        quiet=True,
    )
    params.update(kwargs)
    cfg = Config("build", **params)
    assert main(cfg=cfg)
    return params["db_prefix"]


def _load_cfg(db_prefix):
    with open(db_prefix + "_files/config.pkl", "rb") as f:
        return pickle.load(f)


def test_build_organism_groups(tmp_path):
    """3 assemblies across archaea+bacteria+viral genbank groups."""
    dbp = _build(tmp_path, "og_all")
    assert os.path.isfile(dbp + ".ibf")
    saved = _load_cfg(dbp)
    with open(dbp + ".info.tsv") as f:
        rows = [r for r in f if r.strip()]
    assert len(rows) == 3
    assert saved["input_target"] == "file"
    # top-level summary is a symlink into the current snapshot
    link = dbp + "_files/assembly_summary.txt"
    assert os.path.islink(link)
    version_dir = os.path.dirname(os.readlink(link))
    files = os.listdir(os.path.join(dbp + "_files", version_dir, "files"))
    assert len([f for f in files if f.endswith("_genomic.fna.gz")]) == 3


def test_build_taxid_lineage_filter(tmp_path):
    """--taxid 131567 (cellular organisms) keeps only bac + arc."""
    dbp = _build(tmp_path, "taxid", organism_group=[], taxid=["131567"])
    with open(dbp + ".info.tsv") as f:
        rows = [r for r in f if r.strip()]
    assert len(rows) == 2


def test_build_ncbi_taxonomy_autofetch(tmp_path):
    """taxonomy=ncbi with no --taxonomy-files auto-fetches the taxdump
    from the (local) repository and writes .tax."""
    dbp = _build(tmp_path, "ncbi_tax", taxonomy="ncbi", level="")
    assert os.path.isfile(dbp + ".tax")
    with open(dbp + ".tax") as f:
        taxa = {line.split("\t")[0] for line in f}
    # the 3 fixture assemblies' taxids + lineage parents resolve through
    # the trimmed (lineage-only) taxdump
    assert "1" in taxa and len(taxa) > 3


def test_build_resume_download(tmp_path):
    """An interrupted build (download-state present) skips the download on
    rerun instead of creating a new snapshot (build_update.py:41-54)."""
    from ganon_tpu.util import save_state

    dbp = _build(tmp_path, "resume")
    files_folder = dbp + "_files/"
    # states are cleared on success; restore the download checkpoint to
    # simulate a run that died after downloading
    save_state("build_download", files_folder)
    versions_before = [
        d for d in os.listdir(files_folder)
        if os.path.isdir(os.path.join(files_folder, d)) and d != "build"
    ]
    cfg = Config(
        "build",
        db_prefix=dbp,
        organism_group=["archaea", "bacteria", "viral"],
        source=["genbank"],
        taxonomy="skip",
        level="assembly",
        filter_type="ibf",
        keep_files=True,
        quiet=True,
    )
    assert main(cfg=cfg)
    versions_after = [
        d for d in os.listdir(files_folder)
        if os.path.isdir(os.path.join(files_folder, d)) and d != "build"
    ]
    assert versions_before == versions_after


@pytest.mark.parametrize("output_db_prefix", [False, True])
def test_update_adds_group(tmp_path, output_db_prefix):
    """Build arc+bac, edit history.tsv to add viral, update -> 3 targets
    (the reference's own update test trick, test_update.py:67-72)."""
    import time

    dbp = _build(tmp_path, "upd", organism_group=["archaea", "bacteria"])
    with open(dbp + ".info.tsv") as f:
        assert len([r for r in f if r.strip()]) == 2

    hist = dbp + "_files/history.tsv"
    with open(hist) as f:
        content = f.read()
    assert "archaea,bacteria" in content
    with open(hist, "w") as f:
        f.write(content.replace("archaea,bacteria", "archaea,bacteria,viral"))
    time.sleep(1.1)  # snapshot names are second-resolution timestamps

    update_params = dict(
        db_prefix=dbp,
        threads=1,
        write_info_file=True,
        keep_files=True,
        quiet=True,
    )
    if output_db_prefix:
        update_params["output_db_prefix"] = str(tmp_path / "upd2")
    cfg = Config("update", **update_params)
    assert main(cfg=cfg)

    out_prefix = update_params.get("output_db_prefix", dbp)
    assert os.path.isfile(out_prefix + ".ibf")
    with open(out_prefix + ".info.tsv") as f:
        assert len([r for r in f if r.strip()]) == 3
    saved = _load_cfg(out_prefix)
    # saved config points at the migrated folder so further updates work
    assert saved["input"][0].startswith(out_prefix + "_files")
    assert os.path.isfile(out_prefix + "_files/history.tsv")


def test_fetch_retries_and_atomic(tmp_path, monkeypatch):
    """Remote fetches retry with backoff and never leave a partial file
    at the destination path."""
    from ganon_tpu import acquire

    calls = {"n": 0}

    def flaky(url, part):
        calls["n"] += 1
        if calls["n"] < 3:
            with open(part, "w") as f:
                f.write("partial")  # simulated torn download
            raise IOError("connection reset")
        with open(part, "w") as f:
            f.write("payload")

    monkeypatch.setattr(acquire.urllib.request, "urlretrieve", flaky)
    monkeypatch.setattr(acquire.time, "sleep", lambda s: None)
    dest = tmp_path / "f.txt"
    acquire._fetch("https://example.org/f.txt", str(dest))
    assert dest.read_text() == "payload"
    assert calls["n"] == 3
    assert not (tmp_path / "f.txt.part").exists()

    calls["n"] = -10  # always failing
    with pytest.raises(IOError):
        acquire._fetch("https://example.org/g.txt", str(tmp_path / "g.txt"))
    assert not (tmp_path / "g.txt").exists()
    assert not (tmp_path / "g.txt.part").exists()


def test_download_md5_verification(tmp_path, monkeypatch):
    """A wrong md5checksums.txt entry fails the download loudly; a
    correct one (or none) passes."""
    import hashlib

    from ganon_tpu import acquire

    monkeypatch.delenv("local_dir", raising=False)
    asm = tmp_path / "repo" / "GCA_1_v1"
    asm.mkdir(parents=True)
    payload = b"fake genome bytes"
    (asm / "GCA_1_v1_genomic.fna.gz").write_bytes(payload)
    good = hashlib.md5(payload).hexdigest()

    import pandas as pd

    summary = pd.DataFrame({"ftp_path": [str(asm)]})

    # correct checksum -> ok
    (asm / "md5checksums.txt").write_text(
        f"{good}  ./GCA_1_v1_genomic.fna.gz\n"
    )
    out = tmp_path / "files_ok"
    got = acquire._download_rows(summary, str(out), None, 1, True)
    assert (out / "GCA_1_v1_genomic.fna.gz").read_bytes() == payload

    # corrupted checksum -> loud failure, no file left behind
    (asm / "md5checksums.txt").write_text(
        f"{'0'*32}  ./GCA_1_v1_genomic.fna.gz\n"
    )
    out2 = tmp_path / "files_bad"
    with pytest.raises(IOError, match="md5 mismatch"):
        acquire._download_rows(summary, str(out2), None, 1, True)
    assert not (out2 / "GCA_1_v1_genomic.fna.gz").exists()

    # no checksum file -> verification skipped
    (asm / "md5checksums.txt").unlink()
    out3 = tmp_path / "files_nosum"
    acquire._download_rows(summary, str(out3), None, 1, True)
    assert (out3 / "GCA_1_v1_genomic.fna.gz").exists()


def test_acquire_changes_and_rollback(tmp_path, monkeypatch):
    """Snapshot change report (changes.tsv A/R rows) + rollback -B
    analogue: symlink repoints, history gains the rolled-back selection
    so a later update re-acquires it."""
    from ganon_tpu import acquire

    versions = iter(["2026-01-01_00-00-00", "2026-01-02_00-00-00",
                     "2026-01-03_00-00-00"])
    monkeypatch.setattr(acquire.time, "strftime",
                        lambda fmt: next(versions))
    out = str(tmp_path / "repo")

    v1 = acquire.acquire(out, sources=["genbank"],
                         organism_groups=["archaea"], quiet=True)
    with open(os.path.join(out, v1, "changes.tsv")) as f:
        ch1 = [r.split("\t") for r in f.read().splitlines()]
    assert ch1 and all(op == "A" for op, _ in ch1)  # all new

    v2 = acquire.acquire(out, sources=["genbank"],
                         organism_groups=["archaea", "bacteria"],
                         quiet=True)
    with open(os.path.join(out, v2, "changes.tsv")) as f:
        ch2 = dict(
            (acc, op) for op, acc in
            (r.split("\t") for r in f.read().splitlines())
        )
    # archaea assemblies carried over (not re-added), bacteria added
    assert "A" in ch2.values()
    assert all(op != "R" for op in ch2.values())
    for _, acc in ch1:
        assert acc not in ch2  # unchanged rows are not reported

    assert acquire.current_version(out) == v2
    back = acquire.rollback(out)
    assert back == v1
    assert acquire.current_version(out) == v1
    # update after rollback re-acquires v1's selection (archaea only)
    last = acquire.read_history(out)[-1]
    assert last["organism_group"] == "archaea"


def test_acquire_assembly_levels_filter(tmp_path):
    """-l level-list analogue: selection filters by assembly_level."""
    from ganon_tpu import acquire

    out = str(tmp_path / "repo")
    sel_all = acquire.select_assemblies(
        ["genbank"], organism_groups=["archaea", "bacteria", "viral"],
        workdir=out, quiet=True,
    )
    levels = set(sel_all["assembly_level"])
    assert levels  # fake repo carries at least one level
    lv = sorted(levels)[0]
    sel = acquire.select_assemblies(
        ["genbank"], organism_groups=["archaea", "bacteria", "viral"],
        assembly_levels=[lv.upper()],  # case-insensitive
        workdir=out, quiet=True,
    )
    assert set(sel["assembly_level"]) == {lv}
    assert len(sel) <= len(sel_all)


def test_acquire_date_range_filter(tmp_path):
    """genome_updater -D analogue: seq_rel_date range selection."""
    from ganon_tpu import acquire

    out = str(tmp_path / "repo")
    sel = acquire.select_assemblies(
        ["genbank"], organism_groups=["archaea", "bacteria", "viral"],
        workdir=out, quiet=True,
    )
    dates = sorted(set(sel["seq_rel_date"].str.replace("-", "/")))
    assert len(dates) >= 2, "fake repo needs distinct dates for this test"
    cut = dates[len(dates) // 2]
    early = acquire.select_assemblies(
        ["genbank"], organism_groups=["archaea", "bacteria", "viral"],
        date_end=cut, workdir=out, quiet=True,
    )
    late = acquire.select_assemblies(
        ["genbank"], organism_groups=["archaea", "bacteria", "viral"],
        date_start=cut, workdir=out, quiet=True,
    )
    assert (early["seq_rel_date"].str.replace("-", "/") <= cut).all()
    assert (late["seq_rel_date"].str.replace("-", "/") >= cut).all()
    # the cut row appears on both sides; union covers everything
    acc = set(early["assembly_accession"]) | set(late["assembly_accession"])
    assert acc == set(sel["assembly_accession"])
