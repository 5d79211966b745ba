"""Characterization stage: fit statistical models from real read alignments.

The reference (`read_analysis.py` + helpers) reads BAM via pysam and MAF
text; this implementation parses SAM text directly (and MAF), so the
alignment step asks minimap2 for SAM output instead of piping through
samtools.  All model files are written in the exact reference formats
(SURVEY.md §2.1), so models trained here drive either simulator.
"""
