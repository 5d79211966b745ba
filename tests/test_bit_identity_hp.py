"""Bit-identity for the -hp homopolymer config (genome FASTQ `-hp -k`).

The hardest remaining parity surface: error suppression in homopolymer runs
(mutate_read, simulator.py:1920-1950) followed by run resizing with in-run
mismatches and quality patching (mutate_homo, simulator.py:618-705).  The
reference is driven with our stream — raw walk events replayed host-side,
suppression recomputed, mutate_homo's normal/uniform/choice draws and the
quality pools valued by back-mapping our final output through the
reference's own index arithmetic (refshim/bitident.build_hp_feed) — and the
FASTQ records plus ground-truth error logs must match byte for byte.
"""

import numpy as np
import pytest

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


class RecordingHpWriter(out_mod.GenomeBatchWriter):
    """Captures per-accepted-read records from the padded-dict fetch path
    (-hp uses PipelinedFetcher with the pre-resize middle buffer)."""

    def __init__(self, fastx, error_log):
        super().__init__(fastx, error_log)
        self.records = []

    def write_run(self, sim, d, lanes, accepted_so_far: int) -> int:
        assert not hasattr(d, "reads_flat"), "-hp capture expects the dict path"
        slots = d["slots"]
        assert slots is not None
        for b in lanes:
            t = int(d["total"][b])
            self.records.append(dict(
                slot=int(slots[b]),
                head=int(d["head"][b]),
                tail=int(d["tail"][b]),
                l_new=int(d["l_new"][b]),
                total=t,
                rev=bool(d["rev"][b]),
                chrom=int(d["chrom"][b]),
                pos=int(d["pos"][b]),
                middle_ref=int(d["middle_ref"][b]),
                read=d["read"][b, :t].copy(),
                quals=d["quals"][b, :t].copy() if sim.fastq else None,
                prehp=d["prehp"][b].copy(),
            ))
        return super().write_run(sim, d, lanes, accepted_so_far)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("bihp")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=600, sd_read_len=200)
    ref_fa = str(d / "ref.fa")
    # hp_bias raises run density so suppression + resizing fire often
    fixtures.make_reference_fasta(ref_fa, [40000, 20000], seed=17, hp_bias=0.6)
    return d, prefix, ref_fa


@pytest.mark.parametrize("fastq,n,batch", [
    (False, 100, 64),
    (True, 100, 64),
    # dense sampling of run-boundary / suppression / resize interactions —
    # the chimeric-scaling lesson (n=1000 flushed real bugs there)
    (True, 1000, 256),
])
def test_bit_identity_genome_hp(setup, fastq, n, batch, monkeypatch):
    d, prefix, ref_fa = setup
    seed, k = 3, 5
    # the capture needs the device-materializing dict path (prehp buffer);
    # device==recon equality is separately enforced by test_reconstruct
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq, homopolymer=True)
    sim = GenomeSimulator(genome, prof, batch=batch, fastq=fastq, kmer_bias=k)

    tag = ("q" if fastq else "a") + str(n)
    ours_reads = str(d / f"ours{tag}.{'fastq' if fastq else 'fasta'}")
    ours_err = str(d / f"ours{tag}.err")
    fw = out_mod.FastxWriter(ours_reads, fastq)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingHpWriter(fw, el)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n
    assert len(w.records) == n
    # non-vacuity: homopolymer runs must actually occur (and with them the
    # suppression + resize machinery the config exists to prove)
    import re

    run_re = re.compile(("A{%d,}|C{%d,}|G{%d,}|T{%d,}" % (k, k, k, k)).encode())
    n_with_runs = sum(
        1 for r in w.records if run_re.search(bytes(r["prehp"][: int(r["l_new"]) + 64]))
    )
    assert n_with_runs >= 20, f"only {n_with_runs} reads with >=k runs"

    from refshim.bitident import run_reference_fed_hp

    ref_reads, ref_err = run_reference_fed_hp(
        prefix, ref_fa, w.records, prof, genome, seed, str(d), n, sim, k,
        fastq=fastq,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        sep = b"@" if fastq else b">"
        a_recs = ours_b.split(sep)
        r_recs = ref_b.split(sep)
        for i, (x, y) in enumerate(zip(a_recs, r_recs)):
            assert x == y, f"record {i} differs:\nOURS: {x[:400]}\nREF : {y[:400]}"
        assert len(a_recs) == len(r_recs)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()
