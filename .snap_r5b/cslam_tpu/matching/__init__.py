"""Descriptor banks and sparse loop-closure matching."""

from cslam_tpu.matching.nns_bank import DescriptorBank  # noqa: F401
from cslam_tpu.matching.sparse_matching import LoopClosureSparseMatching  # noqa: F401
