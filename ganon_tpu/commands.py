"""Top-level command orchestration: classify chaining and build download.

Equivalent of ``/root/reference/src/ganon/classify.py`` (db detection,
engine invocation, EM-reassign and report chaining) and the download front
of ``build_update.build`` (genome_updater acquisition; offline operation
uses local assembly_summary files).
"""

from __future__ import annotations

import os

from ganon_tpu.config import Config
from ganon_tpu.util import check_file, find_rep_files, print_log


def classify(cfg) -> bool:
    """ganon classify: engine + optional reassign (EM) + report."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    filter_files = []
    tax_files = []
    for dbp in cfg.db_prefix:
        if check_file(dbp + ".hibf"):
            filter_files.append(dbp + ".hibf")
        elif check_file(dbp + ".ibf"):
            filter_files.append(dbp + ".ibf")
        else:
            raise ValueError(f"no .ibf/.hibf found for db prefix {dbp}")
        if check_file(dbp + ".tax"):
            tax_files.append(dbp + ".tax")
    # only use tax if all dbs have one (classify.py:24-27)
    if len(tax_files) != len(filter_files):
        tax_files = []

    ecfg = ClassifyConfig(
        ibf=filter_files,
        tax=tax_files,
        single_reads=cfg.single_reads,
        paired_reads=cfg.paired_reads,
        batch_reads=cfg.batch_reads,
        output_prefix=cfg.output_prefix,
        hierarchy_labels=cfg.hierarchy_labels or ["H1"],
        rel_cutoff=cfg.rel_cutoff or [0.75],
        rel_filter=cfg.rel_filter or [0.1],
        fpr_query=cfg.fpr_query or [1e-5],
        skip_lca=cfg.multiple_matches != "lca",
        output_lca=cfg.multiple_matches == "lca" and cfg.output_one,
        output_all=cfg.output_all or cfg.multiple_matches == "em",
        output_unclassified=cfg.output_unclassified,
        output_stats=cfg.output_stats,
        output_single=cfg.output_single,
        tax_root_node=cfg.tax_root_node,
        n_reads=cfg.n_reads,
        hashes_limit=(1 << 32) - 1 if getattr(cfg, "longreads", False) else 65535,
        quiet=cfg.quiet,
        verbose=cfg.verbose,
    )
    run_classify(ecfg)

    if cfg.batch_reads:
        prefixes = set()
        for br in cfg.batch_reads:
            with open(br) as f:
                prefixes.update(
                    cfg.output_prefix + row.split("\t")[0] for row in f
                )
        prefixes = sorted(prefixes)
    else:
        prefixes = [cfg.output_prefix]

    if cfg.multiple_matches == "em":
        from ganon_tpu.reassign import ReassignConfig, reassign

        reassign(
            ReassignConfig(
                input_prefix=list(prefixes),
                remove_all=not cfg.output_all,
                skip_one=not cfg.output_one,
                max_iter=cfg.reassign_max_iter,
                threshold=cfg.reassign_threshold,
                quiet=cfg.quiet,
                verbose=cfg.verbose,
            )
        )

    if tax_files and not cfg.skip_report:
        from ganon_tpu.report.report import ReportConfig, report

        report(
            ReportConfig(
                input=[
                    str(r) for pre in prefixes for r in find_rep_files(pre)
                ],
                db_prefix=list(cfg.db_prefix),
                min_count=cfg.min_count,
                ranks=cfg.ranks,
                output_format="tsv",
                report_type=cfg.report_type,
                quiet=cfg.quiet,
                verbose=cfg.verbose,
            )
        )
    return True


def build(cfg) -> bool:
    """ganon build: acquire reference genomes, then build-custom.

    The reference shells out to genome_updater.sh (build_update.py:68-93).
    Network acquisition is not implemented yet — point --input at local
    genome files or use build-custom with --input-file (the offline path
    the reference test-suite itself exercises).
    """
    raise NotImplementedError(
        "ganon-tpu build (NCBI/GTDB download) requires network acquisition, "
        "not yet implemented; use 'build-custom' with --input/--input-file "
        "and --taxonomy-files for offline builds"
    )
