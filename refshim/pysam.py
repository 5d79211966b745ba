"""Minimal pure-python pysam stand-ins so the reference implementation runs
without pysam.  Fastafile supports the fetch(chrom, start, end) calls the
IR-transcriptome simulation path makes (simulator.py:1172); BAM access is
not needed by the simulation side and raises."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError("pysam stub: BAM access not available in this environment")


AlignmentFile = _Unavailable


class Fastafile:
    def __init__(self, path):
        self._seqs = {}
        name = None
        chunks = []
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        self._seqs[name] = "".join(chunks)
                    name = line[1:].split()[0]
                    chunks = []
                else:
                    chunks.append(line)
        if name is not None:
            self._seqs[name] = "".join(chunks)

    def fetch(self, reference=None, start=None, end=None):
        seq = self._seqs[reference]
        if start is None:
            return seq
        return seq[start:end]

    def get_reference_length(self, name):
        return len(self._seqs[name])

    @property
    def references(self):
        return list(self._seqs)


FastaFile = Fastafile
