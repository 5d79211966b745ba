"""BAM (BGZF) reader/writer: round-trip parity with the SAM text parser."""

import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nanosim_tpu.characterization import bam, sam

SAM_TEXT = """\
@HD\tVN:1.6\tSO:unsorted
@SQ\tSN:chr1\tLN:48000
@SQ\tSN:chr2\tLN:12000
r1\t0\tchr1\t101\t60\t5S20M3D15M2I10M4S\tchr1\t0\t0\t{seq1}\t{q1}\tNM:i:5\tcs:Z::20-acg:15+tt:10
r2\t16\tchr2\t501\t13\t30M\tchr2\t0\t0\t{seq2}\t*\tNM:i:0\tXs:f:1.5
r3\t4\t*\t1\t0\t*\t*\t0\t0\tACGTACGTAC\t*
r4\t2048\tchr1\t900\t60\t10M40H\t*\t0\t0\t{seq4}\t*\tSA:Z:chr1,100,+,5S51M,60,5;
"""


def _mk_sam(tmp_path):
    import random

    random.seed(0)
    seq1 = "".join(random.choice("ACGT") for _ in range(56))
    q1 = "".join(chr(33 + random.randrange(0, 60)) for _ in range(56))
    seq2 = "".join(random.choice("ACGT") for _ in range(30))
    seq4 = "".join(random.choice("ACGT") for _ in range(10))
    p = tmp_path / "t.sam"
    p.write_text(SAM_TEXT.format(seq1=seq1, q1=q1, seq2=seq2, seq4=seq4)
                 .replace("\tchr1\t0\t0\t", "\t*\t0\t0\t", 1)
                 .replace("\tchr2\t0\t0\t", "\t*\t0\t0\t", 1))
    return str(p)


def _records(path):
    heads, alns = [], []
    for kind, item in sam.read_sam(path):
        (heads if kind == "header" else alns).append(item)
    return heads, alns


def test_bam_round_trip(tmp_path):
    sam_path = _mk_sam(tmp_path)
    heads, alns = _records(sam_path)

    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, heads, alns)
    assert bam.is_bam(bam_path)
    heads2, alns2 = _records(bam_path)

    assert [h for h in heads2 if h.startswith("@SQ")] == [
        h for h in heads if h.startswith("@SQ")
    ]
    assert len(alns2) == len(alns)
    for a, b in zip(alns, alns2):
        assert (a.qname, a.flag, a.rname, a.pos, a.mapq, a.cigar) == (
            b.qname, b.flag, b.rname, b.pos, b.mapq, b.cigar)
        assert a.seq == b.seq and a.qual == b.qual
        assert a.tags.get("NM") == b.tags.get("NM")
        assert a.tags.get("cs") == b.tags.get("cs")
        assert a.tags.get("SA") == b.tags.get("SA")
        # synthesized text line parses back identically
        assert b.line.split("\t")[:6] == a.line.split("\t")[:6]
        assert (a.query_alignment_start, a.query_alignment_length,
                a.reference_length, a.infer_read_length()) == (
            b.query_alignment_start, b.query_alignment_length,
            b.reference_length, b.infer_read_length())


def test_bam_sq_lengths(tmp_path):
    sam_path = _mk_sam(tmp_path)
    heads, alns = _records(sam_path)
    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, heads, alns)
    assert sam.read_sq_lengths(bam_path) == {"chr1": 48000, "chr2": 12000}
    assert sam.read_sq_lengths(sam_path) == {"chr1": 48000, "chr2": 12000}


def test_bgzf_blocks_are_spec_compliant(tmp_path):
    """Each member carries the BC/BSIZE extra field and the file ends with
    the canonical 28-byte EOF block, so htslib-based tools accept it."""
    sam_path = _mk_sam(tmp_path)
    heads, alns = _records(sam_path)
    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, heads, alns)
    raw = open(bam_path, "rb").read()
    assert raw.endswith(bam._BGZF_EOF)
    # first member: FLG has FEXTRA, subfield id 'BC', BSIZE points at the
    # next member boundary (which must start with the gzip magic)
    assert raw[0:2] == b"\x1f\x8b" and raw[3] == 4
    assert raw[12:14] == b"BC"
    bsize = int.from_bytes(raw[16:18], "little") + 1
    assert raw[bsize : bsize + 2] == b"\x1f\x8b"
    # and stock gzip decodes the whole stream
    assert gzip.decompress(raw)[:4] == b"BAM\x01"


def test_primary_filtering_from_bam_matches_sam(tmp_path):
    """-ga with a BAM drives the pipeline identically to SAM text."""
    from nanosim_tpu.characterization import primary

    sam_path = _mk_sam(tmp_path)
    heads, alns = _records(sam_path)
    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, heads, alns)

    ul_s, strand_s, _ = primary.primary_and_unaligned(sam_path, str(tmp_path / "s"))
    ul_b, strand_b, _ = primary.primary_and_unaligned(bam_path, str(tmp_path / "b"))
    assert list(ul_s) == list(ul_b)
    assert strand_s == strand_b
    out_s = [l.split("\t")[:11] for l in open(str(tmp_path / "s") + "_primary.sam")]
    out_b = [l.split("\t")[:11] for l in open(str(tmp_path / "b") + "_primary.sam")]
    assert [r[:6] + r[9:] for r in out_s if not r[0].startswith("@")] == [
        r[:6] + r[9:] for r in out_b if not r[0].startswith("@")
    ]


def test_is_bam_rejects_text_and_gz(tmp_path):
    sam_path = _mk_sam(tmp_path)
    assert not bam.is_bam(sam_path)
    gz = str(tmp_path / "t.sam.gz")
    with gzip.open(gz, "wt") as f:
        f.write(open(sam_path).read())
    assert not bam.is_bam(gz)
    # gzipped SAM still parses through the dispatching reader
    heads, alns = _records(gz)
    assert len(alns) == 4
