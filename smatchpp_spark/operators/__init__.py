"""Bulk operators: rewrites, degrees, subgraphs, iterative link-graph ops,
alignment/scoring kernels, dedup/similarity/text pipeline operators."""
