"""Comparative gene prediction (CGP) — the multi-genome mode.

Reference: src/compgenepred.cc (driver), src/alignment.cc / genomicMSA.cc
(MAF handling and gene ranges), src/exoncand.cc (exon candidates),
src/orthoexon.cc / geneMSA.cc (ortho exon tuples), src/phylotree.cc /
contTimeMC.cc (phylogenetic models), src/speciesgraph.cc / orthograph.cc
(per-species DAGs + dual decomposition).

TPU-first re-architecture: per-species Viterbi decodes run on the device
DP engines; phylogenetic likelihood (Felsenstein pruning over the exon
gain/loss model) is a small vmapped JAX kernel batched over all ortho
exons at once instead of the reference's per-HECT GSL loops.
"""

from .compgenepred import CompGenePred  # noqa: F401
