"""Kernel layer: distance matmuls, running top-k, quantised scans."""

from .topk import blocked_query_topk, chunked_topk, merge_topk, topk_smallest

__all__ = [
    "topk_smallest",
    "merge_topk",
    "chunked_topk",
    "blocked_query_topk",
]
