from ganon_tpu.report.report import report
from ganon_tpu.report.table import table

__all__ = ["report", "table"]
