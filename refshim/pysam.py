"""Minimal pysam stub so the reference implementation imports without pysam.

Only the attributes touched at import time (and genome-mode simulation, which
never exercises pysam at runtime) are provided.  Any actual use raises.
"""


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError("pysam stub: BAM/FASTA access not available in this environment")


AlignmentFile = _Unavailable
Fastafile = _Unavailable
FastaFile = _Unavailable
