"""Minimal HTSeq stub so the reference implementation imports without HTSeq."""


class GenomicInterval:
    def __init__(self, chrom, start, end, strand="."):
        self.chrom = chrom
        self.start = start
        self.end = end
        self.strand = strand

    @property
    def length(self):
        return self.end - self.start


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError("HTSeq stub: GFF/array access not available in this environment")


GFF_Reader = _Unavailable
GenomicArrayOfSets = _Unavailable
