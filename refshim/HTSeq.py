"""Minimal pure-python HTSeq stand-ins so the reference implementation runs
without the HTSeq package.  Only the surface the reference touches is
implemented (GFF_Reader for the IR annotation walk at simulator.py:426-453,
GenomicInterval construction in extract_read_pos)."""


class GenomicInterval:
    def __init__(self, chrom, start, end, strand="."):
        self.chrom = chrom
        self.start = start
        self.end = end
        self.strand = strand

    @property
    def length(self):
        return self.end - self.start


class _Feature:
    def __init__(self, type_, iv, attr, name):
        self.type = type_
        self.iv = iv
        self.attr = attr
        self.name = name


def _parse_attrs(col9):
    """GFF3 `k=v;...` and GTF `k "v"; ...` attribute strings."""
    attr = {}
    for part in col9.strip().split(";"):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
        elif " " in part:
            k, v = part.split(" ", 1)
            v = v.strip('"')
        else:
            continue
        attr[k.strip()] = v.strip()
    return attr


class GFF_Reader:
    """Iterate a GFF3/GTF file yielding HTSeq-like feature records.

    HTSeq converts coordinates to 0-based half-open: start = col4 - 1;
    end = col5 when end_included (the GFF convention) else col5 - 1.
    """

    def __init__(self, path, end_included=True):
        self.path = path
        self.end_included = end_included

    def __iter__(self):
        with open(self.path) as f:
            for line in f:
                if not line.strip() or line.startswith("#"):
                    continue
                cols = line.rstrip("\n").split("\t")
                if len(cols) < 9:
                    continue
                chrom, _src, ftype, start, end, _score, strand, _frame, attrs = cols[:9]
                s = int(start) - 1
                e = int(end) if self.end_included else int(end) - 1
                attr = _parse_attrs(attrs)
                name = attr.get("ID", attr.get("Parent", ""))
                yield _Feature(ftype, GenomicInterval(chrom, s, e, strand), attr, name)


class GenomicArrayOfSets:
    """Interval->set map over chromosomes (steps() queries used by the
    reference's characterization paths)."""

    def __init__(self, chroms="auto", stranded=False):
        self._features = {}  # chrom -> list of (start, end, value)

    def __getitem__(self, iv):
        return _ArraySlice(self, iv)

    def add(self, iv, value):
        self._features.setdefault(iv.chrom, []).append((iv.start, iv.end, value))


class _ArraySlice:
    def __init__(self, arr, iv):
        self.arr = arr
        self.iv = iv

    def __iadd__(self, value):
        self.arr.add(self.iv, value)
        return self

    def steps(self):
        """Yield (GenomicInterval, frozenset) pieces covering the query."""
        feats = self.arr._features.get(self.iv.chrom, [])
        bounds = {self.iv.start, self.iv.end}
        for s, e, _v in feats:
            if e > self.iv.start and s < self.iv.end:
                bounds.add(max(s, self.iv.start))
                bounds.add(min(e, self.iv.end))
        bounds = sorted(bounds)
        for a, b in zip(bounds, bounds[1:]):
            vals = frozenset(
                v for s, e, v in feats if s <= a and e >= b
            )
            yield GenomicInterval(self.iv.chrom, a, b, self.iv.strand), vals
