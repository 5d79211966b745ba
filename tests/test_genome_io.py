"""Genome/metagenome loading: RefSeq URL streaming (simulator.py:295-315)."""

import gzip
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nanosim_tpu.io import genome as genome_mod

FNA = """\
>NZ_CP013218.1 Acinetobacter baumannii strain XH386 chromosome
ACGTACGTACGTACGTACGT
TTTTAAAACCCCGGGG
>NZ_CP013219.1 Acinetobacter baumannii plasmid p1
GGGGCCCCAAAATTTT
"""


def test_refseq_stream_and_genome_list(tmp_path, monkeypatch):
    requested = []

    def fake_urlopen(req):
        requested.append(req.full_url)
        return io.BytesIO(gzip.compress(FNA.encode()))

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)

    local_fa = tmp_path / "ecoli.fa"
    local_fa.write_text(">chr1 local\n" + "ACGT" * 64 + "\n")
    gl = tmp_path / "genomes.tsv"
    gl.write_text(
        "Acinetobacter baumannii\tftp://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/988/155/GCF_000988155.1_ASM98815v1\n"
        f"Escherichia coli\t{local_fa}\n"
    )
    mset = genome_mod.MetagenomeSet.from_genome_list(str(gl))

    # ftp rewritten to http, _genomic.fna.gz appended
    assert requested == [
        "http://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/988/155/"
        "GCF_000988155.1_ASM98815v1/GCF_000988155.1_ASM98815v1_genomic.fna.gz"
    ]
    assert mset.species_names == ["Acinetobacter_baumannii", "Escherichia_coli"]
    # URL naming rule: header split on _/whitespace, first token dropped,
    # dash-joined, truncated at the first dot
    assert mset.packed.names[0] == "CP013218"
    assert mset.packed.names[1] == "CP013219"
    assert mset.packed.names[2] == "chr1"
    assert list(mset.packed.lengths) == [36, 16, 256]
    # topology defaults: linear for streamed, circular for local files
    assert list(mset.packed.circular) == [False, False, True]
    seq0 = mset.packed.slice(0, 0, 36).tobytes().decode()
    assert seq0 == "ACGTACGTACGTACGTACGTTTTTAAAACCCCGGGG"
