"""Production MSA pipeline: host orchestration over batched device DP."""

from .pipeline import (
    batched_all_pairs,
    batched_preprofiles,
    batched_progressive_merge,
    msa_align,
)

__all__ = [
    "batched_all_pairs",
    "batched_preprofiles",
    "batched_progressive_merge",
    "msa_align",
]
