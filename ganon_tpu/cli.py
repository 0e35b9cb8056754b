"""CLI entry: dispatch the 7 subcommands.

Equivalent of ``/root/reference/src/ganon/ganon.py`` — ``main(which, cfg)``
is also the internal/programmatic API used by tests.
"""

from __future__ import annotations

import sys

from ganon_tpu.config import Config
from ganon_tpu.util import print_log


def main(which: str = None, cfg=None, **kwargs) -> bool:
    if cfg is None:
        cfg = Config(which, **kwargs)
    cfg.validate()

    if cfg.which == "build":
        from ganon_tpu.commands import build

        return build(cfg)
    if cfg.which == "build_custom":
        from ganon_tpu.build import build_custom

        return build_custom(cfg)
    if cfg.which == "update":
        from ganon_tpu.build import update

        return update(cfg)
    if cfg.which == "classify":
        from ganon_tpu.commands import classify

        return classify(cfg)
    if cfg.which == "reassign":
        from ganon_tpu.reassign import ReassignConfig, reassign

        return reassign(
            ReassignConfig(
                input_prefix=cfg.input_prefix,
                output_prefix=cfg.output_prefix,
                max_iter=cfg.max_iter,
                threshold=cfg.threshold,
                remove_all=cfg.remove_all,
                skip_one=cfg.skip_one,
                skip_rep=cfg.skip_rep,
                quiet=cfg.quiet,
                verbose=cfg.verbose,
            )
        )
    if cfg.which == "report":
        from ganon_tpu.report.report import ReportConfig, report

        return report(
            ReportConfig(
                input=cfg.input,
                input_extension=cfg.input_extension,
                output_prefix=cfg.output_prefix,
                db_prefix=cfg.db_prefix,
                taxonomy=cfg.taxonomy,
                taxonomy_files=cfg.taxonomy_files,
                genome_size_files=cfg.genome_size_files,
                skip_genome_size=cfg.skip_genome_size,
                report_type=cfg.report_type,
                output_format=cfg.output_format,
                sort=cfg.sort,
                ranks=cfg.ranks,
                min_count=cfg.min_count,
                max_count=cfg.max_count,
                taxids=cfg.taxids,
                names=cfg.names,
                names_with=cfg.names_with,
                top_percentile=cfg.top_percentile,
                no_orphan=cfg.no_orphan,
                normalize=cfg.normalize,
                split_hierarchy=cfg.split_hierarchy,
                skip_hierarchy=cfg.skip_hierarchy,
                keep_hierarchy=cfg.keep_hierarchy,
                quiet=cfg.quiet,
                verbose=cfg.verbose,
            )
        )
    if cfg.which == "table":
        from ganon_tpu.report.table import TableConfig, table

        return table(
            TableConfig(
                input=cfg.input,
                input_extension=cfg.input_extension,
                output_file=cfg.output_file,
                output_format=cfg.output_format,
                output_value=cfg.output_value,
                rank=cfg.rank,
                header=cfg.header,
                unclassified_label=cfg.unclassified_label,
                filtered_label=cfg.filtered_label,
                skip_zeros=cfg.skip_zeros,
                transpose=cfg.transpose,
                no_root=cfg.no_root,
                min_count=cfg.min_count,
                max_count=cfg.max_count,
                taxids=cfg.taxids,
                names=cfg.names,
                names_with=cfg.names_with,
                top_sample=cfg.top_sample,
                top_all=cfg.top_all,
                min_frequency=cfg.min_frequency,
                quiet=cfg.quiet,
                verbose=cfg.verbose,
            )
        )
    raise ValueError(f"unknown subcommand: {cfg.which}")


def main_cli() -> None:
    try:
        ok = main()
    except (ValueError, FileNotFoundError) as e:
        print_log(f"ERROR: {e}")
        sys.exit(1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main_cli()
