from ganon_tpu.ops.minimizers import (
    adjust_seed,
    encode_seqs,
    minimizers_jax,
    minimizers_golden,
)
from ganon_tpu.ops.ibf_query import (
    ibf_row_indices,
    bulk_count_bins,
    bulk_target_counts,
    target_counts,
    target_segments,
)

__all__ = [
    "adjust_seed",
    "encode_seqs",
    "minimizers_jax",
    "minimizers_golden",
    "ibf_row_indices",
    "bulk_count_bins",
    "bulk_target_counts",
    "target_counts",
    "target_segments",
]
