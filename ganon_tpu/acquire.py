"""Reference-genome acquisition: the genome_updater equivalent (C16).

The reference shells out to the external bash tool genome_updater.sh to
download RefSeq/GenBank assemblies selected by organism group, taxid,
assembly level, RefSeq category or top-N, and to manage versioned
snapshots + incremental updates (call sites
/root/reference/src/ganon/build_update.py:68-93,177-188). This module is a
native Python re-implementation of the subset ganon drives, keeping the
same on-disk contract so the build/update orchestration (and the
reference's own offline test style) works unchanged:

* a versioned snapshot folder ``{out}/{YYYY-MM-DD_HH-MM-SS}/files/`` with
  the downloaded ``*_genomic.fna.gz``,
* ``{version}/assembly_summary.txt`` with the selected rows and a
  top-level ``assembly_summary.txt`` **symlink** into the current version
  (consumed via ``os.readlink`` by the orchestration, mirroring
  build_update.py:1004-1008),
* an append-only ``history.tsv`` recording the selection parameters of
  every snapshot; ``update`` re-reads the last row, so editing it (the
  trick the reference integration tests use) changes what an update
  fetches,
* the ``local_dir`` environment variable redirects all fetches to a local
  copy of the NCBI/GTDB repository tree (exactly how the reference test
  suite fakes the network, tests/ganon/integration/test_build.py:39-40).
"""

from __future__ import annotations

import gzip
import os
import shutil
import time
import urllib.request

import pandas as pd

from ganon_tpu.util import print_log

NCBI_BASE = "https://ftp.ncbi.nlm.nih.gov"
GTDB_BASE = "https://data.gtdb.ecogenomic.org"

ASSEMBLY_SUMMARY_COLS = [
    "assembly_accession", "bioproject", "biosample", "wgs_master",
    "refseq_category", "taxid", "species_taxid", "organism_name",
    "infraspecific_name", "isolate", "version_status", "assembly_level",
    "release_type", "genome_rep", "seq_rel_date", "asm_name", "submitter",
    "gbrs_paired_asm", "paired_asm_comp", "ftp_path", "excluded_from_refseq",
    "relation_to_type_material", "asm_not_live_date",
]

HISTORY_COLS = [
    "version", "source", "organism_group", "taxid", "complete_genomes",
    "reference_genomes", "top", "gtdb", "assembly_levels",
    "date_start", "date_end",
]


def _base(kind: str) -> str:
    """Repository base URL/path; ``local_dir`` (the genome_updater
    contract) points both NCBI and GTDB trees at a local folder."""
    local = os.environ.get("local_dir")
    if local:
        return local.rstrip("/")
    return NCBI_BASE if kind == "ncbi" else GTDB_BASE


def _fetch(url: str, dest: str, quiet: bool = True, retries: int = 3) -> str:
    """Fetch a repository file to ``dest`` (copy when the base is local).

    Remote fetches stream into ``dest + '.part'`` and rename atomically
    on success, so an interrupted download can never masquerade as a
    complete file; failures retry with backoff (the reference's tooling
    retries 3x, scripts/ganon-get-seq-info.sh:2-3 / genome_updater).
    """
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.isfile(url):
        shutil.copyfile(url, dest)
        return dest
    if not url.startswith(("http://", "https://", "ftp://")):
        raise FileNotFoundError(url)
    print_log("Downloading " + url, quiet)
    part = dest + ".part"
    last: Exception | None = None
    for attempt in range(max(retries, 1)):
        try:
            urllib.request.urlretrieve(url, part)
            os.replace(part, dest)
            return dest
        except Exception as e:  # noqa: BLE001 — network layer, retry all
            last = e
            if os.path.exists(part):
                os.remove(part)
            if attempt + 1 < retries:
                time.sleep(2**attempt)
    raise last


def _md5_expected(ftp_path: str, name: str, quiet: bool) -> str | None:
    """Expected md5 of ``name`` from the assembly's md5checksums.txt.

    None when the repository does not carry checksums (the local test
    mirrors) — verification is then skipped, matching genome_updater's
    behavior of checking only when the file exists (-m flag, reference
    build_update.py call sites).
    """
    import tempfile

    try:
        with tempfile.TemporaryDirectory() as td:
            p = _fetch(
                _remap(ftp_path) + "/md5checksums.txt",
                os.path.join(td, "md5checksums.txt"),
                quiet=True, retries=1,
            )
            with open(p) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2 and os.path.basename(
                        parts[-1]
                    ) == name:
                        return parts[0]
    except Exception:
        return None
    return None


def _md5_of(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def _remap(ftp_path: str) -> str:
    """Rewrite an assembly_summary ftp_path against ``local_dir``."""
    local = os.environ.get("local_dir")
    if not local:
        return ftp_path
    for base in (NCBI_BASE, "ftp://ftp.ncbi.nlm.nih.gov", "http://ftp.ncbi.nlm.nih.gov"):
        if ftp_path.startswith(base):
            return local.rstrip("/") + ftp_path[len(base):]
    return ftp_path


def read_assembly_summary(path_or_buf) -> pd.DataFrame:
    rows = pd.read_csv(
        path_or_buf,
        sep="\t",
        comment="#",
        header=None,
        dtype=str,
        keep_default_na=False,
    )
    rows = rows.iloc[:, : len(ASSEMBLY_SUMMARY_COLS)]
    rows.columns = ASSEMBLY_SUMMARY_COLS[: rows.shape[1]]
    return rows


def _load_summaries(sources, organism_groups, workdir, quiet) -> pd.DataFrame:
    """Concatenate assembly_summary.txt for the selection scope."""
    frames = []
    for source in sources:
        base = _base("ncbi")
        if organism_groups:
            for group in organism_groups:
                url = f"{base}/genomes/{source}/{group}/assembly_summary.txt"
                local = _fetch(url, os.path.join(
                    workdir, f"assembly_summary_{source}_{group}.txt"), quiet)
                frames.append(read_assembly_summary(local))
        else:
            url = f"{base}/genomes/{source}/assembly_summary_{source}.txt"
            local = _fetch(url, os.path.join(
                workdir, f"assembly_summary_{source}.txt"), quiet)
            frames.append(read_assembly_summary(local))
    summary = pd.concat(frames, ignore_index=True)
    summary.drop_duplicates(subset=["assembly_accession"], inplace=True)
    return summary


def _filter_taxids(summary: pd.DataFrame, taxids, workdir, quiet):
    """Keep assemblies whose lineage passes through any of ``taxids``
    (genome_updater's -T filter, driven by taxidlineage.dmp from the NCBI
    new_taxdump)."""
    import tarfile

    base = _base("ncbi")
    url = f"{base}/pub/taxonomy/new_taxdump/new_taxdump.tar.gz"
    local = _fetch(url, os.path.join(workdir, "new_taxdump.tar.gz"), quiet)
    wanted = set(str(t) for t in taxids)
    ok = set()
    with tarfile.open(local, "r:gz") as tar:
        with tar.extractfile("taxidlineage.dmp") as f:
            for raw in f:
                fields = [x.strip() for x in raw.decode().split("|")]
                node, lineage = fields[0], fields[1].split()
                if node in wanted or any(t in wanted for t in lineage):
                    ok.add(node)
    keep = summary["taxid"].map(lambda t: t in ok)
    return summary[keep]


def _filter_gtdb(summary: pd.DataFrame, workdir, quiet):
    """Keep assemblies present in the current GTDB release (``-M gtdb``)."""
    base = _base("gtdb")
    accs = set()
    for name in ("ar53_taxonomy.tsv.gz", "bac120_taxonomy.tsv.gz"):
        url = f"{base}/releases/latest/{name}"
        try:
            local = _fetch(url, os.path.join(workdir, name), quiet)
        except FileNotFoundError:
            continue
        with gzip.open(local, "rt") as f:
            for line in f:
                acc = line.split("\t", 1)[0]
                # GTDB prefixes: RS_ (refseq) / GB_ (genbank)
                accs.add(acc[3:] if acc[:3] in ("RS_", "GB_") else acc)
    return summary[summary["assembly_accession"].isin(accs)]


def _select_top(summary: pd.DataFrame, top: int):
    """Top N assemblies per species, ranked like genome_updater: refseq
    category, then assembly level, then newest release date."""
    cat_rank = {"reference genome": 0, "representative genome": 1}
    lvl_rank = {"Complete Genome": 0, "Chromosome": 1, "Scaffold": 2,
                "Contig": 3}
    s = summary.copy()
    s["_cat"] = s["refseq_category"].map(lambda c: cat_rank.get(c, 2))
    s["_lvl"] = s["assembly_level"].map(lambda v: lvl_rank.get(v, 4))
    s["_date"] = s["seq_rel_date"]
    s.sort_values(["_cat", "_lvl", "_date"],
                  ascending=[True, True, False], inplace=True)
    s = s.groupby("species_taxid", sort=False).head(top)
    return s.drop(columns=["_cat", "_lvl", "_date"]).sort_index()


def select_assemblies(
    sources,
    organism_groups=(),
    taxids=(),
    complete_genomes=False,
    reference_genomes=False,
    top=0,
    gtdb=False,
    assembly_levels=(),
    date_start="",
    date_end="",
    workdir=".",
    quiet=True,
) -> pd.DataFrame:
    summary = _load_summaries(sources, organism_groups, workdir, quiet)
    summary = summary[summary["version_status"] == "latest"]
    summary = summary[summary["ftp_path"] != "na"]
    if taxids:
        summary = _filter_taxids(summary, taxids, workdir, quiet)
    if complete_genomes:
        summary = summary[summary["assembly_level"] == "Complete Genome"]
    if assembly_levels:
        # genome_updater -l accepts a level list ("complete genome,
        # chromosome,..."); ganon itself only drives 'complete genome'
        # (build_update.py:77) but the tool supports the full set
        summary = summary[
            summary["assembly_level"].str.lower().isin(
                {lv.lower() for lv in assembly_levels}
            )
        ]
    if reference_genomes:
        summary = summary[summary["refseq_category"] == "reference genome"]
    if date_start or date_end:
        # genome_updater -D start_date:end_date (seq_rel_date is
        # YYYY/MM/DD, so string comparison orders correctly)
        d = summary["seq_rel_date"].str.replace("-", "/")
        if date_start:
            summary = summary[d >= date_start.replace("-", "/")]
            d = summary["seq_rel_date"].str.replace("-", "/")
        if date_end:
            summary = summary[d <= date_end.replace("-", "/")]
    if gtdb:
        summary = _filter_gtdb(summary, workdir, quiet)
    if top:
        summary = _select_top(summary, top)
    return summary


def _download_rows(summary: pd.DataFrame, files_folder: str,
                   previous_files: str | None, threads: int, quiet: bool):
    """Fetch ``{ftp_path}/{asm}_genomic.fna.gz`` per row; reuse files from
    the previous snapshot via hard links (genome_updater's incremental
    behavior)."""
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(files_folder, exist_ok=True)

    def fetch_one(ftp_path: str):
        name = os.path.basename(ftp_path) + "_genomic.fna.gz"
        dest = os.path.join(files_folder, name)
        if os.path.isfile(dest):
            return dest
        if previous_files:
            prev = os.path.join(previous_files, name)
            if os.path.isfile(prev):
                os.link(prev, dest)
                return dest
        _fetch(_remap(ftp_path) + "/" + name, dest, quiet)
        # checksum verification when the repository provides one
        # (genome_updater -m); one re-download on mismatch
        expect = _md5_expected(ftp_path, name, quiet)
        if expect is not None and _md5_of(dest) != expect:
            os.remove(dest)
            _fetch(_remap(ftp_path) + "/" + name, dest, quiet)
            got = _md5_of(dest)
            if got != expect:
                os.remove(dest)
                raise IOError(
                    f"md5 mismatch for {name}: expected {expect}, got {got}"
                )
        return dest

    with ThreadPoolExecutor(max_workers=max(1, threads)) as pool:
        return list(pool.map(fetch_one, summary["ftp_path"].tolist()))


def _write_summary(summary: pd.DataFrame, path: str):
    with open(path, "w") as f:
        f.write("# ganon-tpu acquire\n# " + "\t".join(
            ASSEMBLY_SUMMARY_COLS[: summary.shape[1]]) + "\n")
        summary.to_csv(f, sep="\t", header=False, index=False)


def _append_history(output_folder: str, row: dict):
    path = os.path.join(output_folder, "history.tsv")
    new = not os.path.isfile(path)
    with open(path, "a") as f:
        if new:
            f.write("\t".join(HISTORY_COLS) + "\n")
        f.write("\t".join(str(row.get(c, "")) for c in HISTORY_COLS) + "\n")


def read_history(output_folder: str) -> list[dict]:
    path = os.path.join(output_folder, "history.tsv")
    rows = []
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            rows.append(dict(zip(header, line.rstrip("\n").split("\t"))))
    return rows


def current_version(output_folder: str) -> str:
    """Current snapshot folder name, from the top-level symlink
    (the reference reads it the same way, build_update.py:1004-1008)."""
    link = os.path.join(output_folder, "assembly_summary.txt")
    return os.path.dirname(os.readlink(link))


def acquire(
    output_folder: str,
    sources,
    organism_groups=(),
    taxids=(),
    complete_genomes=False,
    reference_genomes=False,
    top=0,
    gtdb=False,
    assembly_levels=(),
    date_start="",
    date_end="",
    threads: int = 1,
    quiet: bool = True,
) -> str:
    """Create one versioned snapshot; returns the version folder name."""
    os.makedirs(output_folder, exist_ok=True)
    version = time.strftime("%Y-%m-%d_%H-%M-%S")
    version_folder = os.path.join(output_folder, version)
    os.makedirs(version_folder, exist_ok=True)

    summary = select_assemblies(
        sources, organism_groups, taxids, complete_genomes,
        reference_genomes, top, gtdb, assembly_levels,
        date_start, date_end,
        workdir=version_folder, quiet=quiet,
    )
    print_log(f" - {summary.shape[0]} assemblies selected", quiet)
    if summary.empty:
        raise ValueError("no assemblies match the given selection")

    previous_files = None
    previous_summary = None
    top_link = os.path.join(output_folder, "assembly_summary.txt")
    if os.path.islink(top_link):
        prev_version = current_version(output_folder)
        previous_files = os.path.join(output_folder, prev_version, "files")
        prev_sum_path = os.path.join(
            output_folder, prev_version, "assembly_summary.txt")
        if os.path.isfile(prev_sum_path):
            previous_summary = read_assembly_summary(prev_sum_path)

    _download_rows(summary, os.path.join(version_folder, "files"),
                   previous_files, threads, quiet)
    _write_summary(summary,
                   os.path.join(version_folder, "assembly_summary.txt"))
    _write_changes(summary, previous_summary, version_folder, quiet)

    if os.path.islink(top_link) or os.path.isfile(top_link):
        os.remove(top_link)
    os.symlink(os.path.join(version, "assembly_summary.txt"), top_link)

    _append_history(output_folder, {
        "version": version,
        "source": ",".join(sources),
        "organism_group": ",".join(organism_groups or []),
        "taxid": ",".join(str(t) for t in (taxids or [])),
        "complete_genomes": int(bool(complete_genomes)),
        "reference_genomes": int(bool(reference_genomes)),
        "top": int(top or 0),
        "gtdb": int(bool(gtdb)),
        "assembly_levels": ",".join(assembly_levels or []),
        "date_start": date_start,
        "date_end": date_end,
    })
    return version


def acquire_update(output_folder: str, threads: int = 1,
                   quiet: bool = True) -> str:
    """Re-acquire using the last history.tsv row (the update flow;
    editing history.tsv changes the selection, as the reference tests do)."""
    last = read_history(output_folder)[-1]
    split = lambda v: [x for x in v.split(",") if x]  # noqa: E731
    return acquire(
        output_folder,
        sources=split(last["source"]) or ["refseq"],
        organism_groups=split(last["organism_group"]),
        taxids=split(last["taxid"]),
        complete_genomes=bool(int(last.get("complete_genomes") or 0)),
        reference_genomes=bool(int(last.get("reference_genomes") or 0)),
        top=int(last.get("top") or 0),
        gtdb=bool(int(last.get("gtdb") or 0)),
        assembly_levels=split(last.get("assembly_levels") or ""),
        date_start=last.get("date_start") or "",
        date_end=last.get("date_end") or "",
        threads=threads,
        quiet=quiet,
    )


def _write_changes(summary, previous_summary, version_folder: str,
                   quiet: bool) -> None:
    """Per-snapshot change report (genome_updater writes added/updated/
    removed accession lists per version): ``changes.tsv`` rows are
    ``A|R <tab> assembly_accession``; A = newly selected vs the previous
    snapshot, R = no longer selected."""
    cur = set(summary["assembly_accession"])
    prev = (
        set(previous_summary["assembly_accession"])
        if previous_summary is not None
        else set()
    )
    added = sorted(cur - prev)
    removed = sorted(prev - cur)
    with open(os.path.join(version_folder, "changes.tsv"), "w") as f:
        for a in added:
            f.write(f"A\t{a}\n")
        for a in removed:
            f.write(f"R\t{a}\n")
    if prev:
        print_log(
            f" - {len(added)} added, {len(removed)} removed vs previous "
            "snapshot", quiet,
        )


def rollback(output_folder: str, version: str | None = None) -> str:
    """Repoint the snapshot symlink to an earlier version
    (genome_updater -B): default = the version before the current one.
    Appends that version's original history row so a later ``update``
    re-acquires the rolled-back selection. Returns the new current
    version."""
    history = read_history(output_folder)
    versions = [r["version"] for r in history]
    cur = current_version(output_folder)
    if version is None:
        # "earlier" by position in the append-only history, not by
        # lexicographic name comparison (a rollback row re-appends an
        # old version name at the end, so names are not ordered)
        try:
            i = len(versions) - 1 - versions[::-1].index(cur)
        except ValueError:
            i = len(versions)
        earlier = [v for v in versions[:i] if v != cur]
        if not earlier:
            raise ValueError("no earlier snapshot to roll back to")
        version = earlier[-1]
    if version not in versions:
        raise ValueError(f"unknown snapshot version {version}")
    target_summary = os.path.join(version, "assembly_summary.txt")
    if not os.path.isfile(os.path.join(output_folder, target_summary)):
        raise ValueError(f"snapshot {version} has no assembly_summary.txt")
    top_link = os.path.join(output_folder, "assembly_summary.txt")
    if os.path.islink(top_link) or os.path.exists(top_link):
        os.remove(top_link)
    os.symlink(target_summary, top_link)
    row = next(r for r in history if r["version"] == version)
    _append_history(output_folder, row)
    return version


def fetch_taxdump(workdir: str, quiet: bool = True) -> str:
    """Download the NCBI new_taxdump archive (used when no
    --taxonomy-files are given, mirroring multitax's auto-download)."""
    base = _base("ncbi")
    return _fetch(f"{base}/pub/taxonomy/new_taxdump/new_taxdump.tar.gz",
                  os.path.join(workdir, "new_taxdump.tar.gz"), quiet)


def fetch_genome_size_files(taxonomy: str, workdir: str,
                            quiet: bool = True) -> list[str]:
    """Download the genome-size auxiliary files (reference
    tax_util.parse_genome_size_files:77-105): NCBI species_genome_size or
    GTDB metadata."""
    if taxonomy.startswith("ncbi"):
        base = _base("ncbi")
        return [_fetch(
            f"{base}/genomes/ASSEMBLY_REPORTS/species_genome_size.txt.gz",
            os.path.join(workdir, "species_genome_size.txt.gz"), quiet)]
    if taxonomy.startswith("gtdb"):
        base = _base("gtdb")
        out = []
        for name in ("ar53_metadata.tsv.gz", "bac120_metadata.tsv.gz"):
            try:
                out.append(_fetch(f"{base}/releases/latest/{name}",
                                  os.path.join(workdir, name), quiet))
            except FileNotFoundError:
                pass
        if not out:
            raise FileNotFoundError("no GTDB metadata files found")
        return out
    raise ValueError(f"no genome size source for taxonomy {taxonomy}")


def fetch_gtdb_tax(workdir: str, quiet: bool = True) -> list[str]:
    """Download the GTDB taxonomy files for the current release."""
    base = _base("gtdb")
    out = []
    for name in ("ar53_taxonomy.tsv.gz", "bac120_taxonomy.tsv.gz"):
        try:
            out.append(_fetch(f"{base}/releases/latest/{name}",
                              os.path.join(workdir, name), quiet))
        except FileNotFoundError:
            pass
    if not out:
        raise FileNotFoundError("no GTDB taxonomy files found")
    return out
