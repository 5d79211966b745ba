"""Minimal pure-python pysam stand-ins so the reference implementation runs
without pysam.  Fastafile supports the fetch(chrom, start, end) calls the
IR-transcriptome simulation path makes (simulator.py:1172).  AlignmentFile
parses SAM TEXT (regardless of the .bam filename / 'rb' mode) with exactly
the attribute surface the reference's characterization modules touch
(besthit_to_histogram.py:317-324, head_align_tail_dist.py:65-229,
get_primary_sam.py) — enough to run them as CPU oracles against fixture
alignments."""

_CONSUME_REF = {0, 2, 3, 7, 8}  # M D N = X
_CONSUME_READ = {0, 1, 4, 7, 8}  # M I S = X
_OPS = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6, "=": 7, "X": 8}


def _parse_cigar(s):
    if s in ("*", ""):
        return None
    out = []
    n = 0
    for ch in s:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            out.append((_OPS[ch], n))
            n = 0
    return out


class AlignedSegment:
    def __init__(self, fields):
        self.query_name = fields[0]
        self.flag = int(fields[1])
        self.reference_name = fields[2]
        self.reference_start = int(fields[3]) - 1
        self.mapping_quality = int(fields[4])
        self.cigarstring = None if fields[5] == "*" else fields[5]
        self.cigartuples = _parse_cigar(fields[5])
        self.query_sequence = None if fields[9] == "*" else fields[9]
        if len(fields) > 10 and fields[10] != "*":
            self.query_qualities = [ord(c) - 33 for c in fields[10]]
        else:
            self.query_qualities = None
        self._tags = {}
        for t in fields[11:]:
            name, typ, val = t.split(":", 2)
            if typ == "i":
                val = int(val)
            elif typ == "f":
                val = float(val)
            self._tags[name] = val

    @property
    def is_unmapped(self):
        return bool(self.flag & 4)

    @property
    def is_reverse(self):
        return bool(self.flag & 16)

    @property
    def is_secondary(self):
        return bool(self.flag & 256)

    @property
    def is_supplementary(self):
        return bool(self.flag & 2048)

    @property
    def reference_end(self):
        if self.cigartuples is None:
            return None
        return self.reference_start + sum(
            ln for op, ln in self.cigartuples if op in _CONSUME_REF
        )

    @property
    def reference_length(self):
        if self.cigartuples is None:
            return None
        return sum(ln for op, ln in self.cigartuples if op in _CONSUME_REF)

    @property
    def query_alignment_length(self):
        if self.cigartuples is None:
            return 0
        return sum(ln for op, ln in self.cigartuples
                   if op in (0, 1, 7, 8))

    @property
    def query_length(self):
        if self.query_sequence is not None:
            return len(self.query_sequence)
        if self.cigartuples is None:
            return 0
        return sum(ln for op, ln in self.cigartuples if op in _CONSUME_READ)

    def infer_read_length(self):
        # pysam semantics: read length inferred from CIGAR incl. hard clips
        if self.cigartuples is None:
            return None
        return sum(ln for op, ln in self.cigartuples
                   if op in (0, 1, 4, 5, 7, 8))

    def get_tag(self, name):
        return self._tags[name]

    def has_tag(self, name):
        return name in self._tags


class AlignmentFile:
    """SAM-text reader (file may be named *.bam; content must be SAM)."""

    def __init__(self, path, mode="r", **kw):
        self._path = path
        self.header = {"SQ": []}
        self._data_start = 0
        with open(path) as f:
            pos = 0
            for line in f:
                if line.startswith("@"):
                    if line.startswith("@SQ"):
                        d = {}
                        for fld in line.rstrip("\n").split("\t")[1:]:
                            k, v = fld.split(":", 1)
                            d[k] = int(v) if k == "LN" else v
                        self.header["SQ"].append(d)
                    pos += len(line)
                else:
                    break
            self._data_start = pos

    def fetch(self, until_eof=False, **kw):
        with open(self._path) as f:
            f.seek(self._data_start)
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("@"):
                    continue
                yield AlignedSegment(line.split("\t"))

    def close(self):
        pass


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
