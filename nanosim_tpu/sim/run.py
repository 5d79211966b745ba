"""Top-level simulation runs: the equivalent of the reference's `simulation`
orchestrator (simulator.py:1571-1672) for each mode.

Single-process by design: the batch engine saturates the chip, so the
reference's fork/merge machinery reduces to writing the final files directly.
Multi-host runs shard slot ranges instead (see parallel/)."""

from __future__ import annotations

import sys
from time import strftime
from typing import Optional

from ..io.genome import PackedGenome
from ..profiles import profile as profile_mod
from . import output
from .genome_mode import GenomeSimulator
from .unaligned_mode import UnalignedBatchWriter, UnalignedSimulator


def _log(msg: str):
    sys.stdout.write(strftime("%Y-%m-%d %H:%M:%S") + ": " + msg + "\n")
    sys.stdout.flush()


def simulate_genome(
    ref_g: str,
    model_prefix: str,
    out: str,
    number: int = 20000,
    *,
    perfect: bool = False,
    fastq: bool = False,
    chimeric: bool = False,
    kmer_bias: Optional[int] = None,
    homopolymer: bool = False,
    strandness: Optional[float] = None,
    dna_type: str = "linear",
    min_len: int = 50,
    max_len: float = float("inf"),
    median_len: Optional[float] = None,
    sd_len: Optional[float] = None,
    seed: int = 0,
    batch: int = 256,
    n_hosts: int = 1,
    host_id: int = 0,
    coordinator: Optional[str] = None,
    resume: bool = False,
) -> dict:
    """Genome-mode simulation (reference main genome branch,
    simulator.py:2226-2320).  Returns counters for reporting.

    Multi-host (n_hosts > 1): this process simulates its share of the
    sharded slot schedule and writes `{out}_h{host_id}` files; concatenating
    the per-host shards reproduces the single-host output (the TPU-native
    analog of the reference's per-worker subfiles).  Both the aligned and the
    unaligned passes shard over hosts.
    """
    _log("Read in reference")
    genome = PackedGenome.from_fasta(ref_g, dna_type=dna_type)
    if dna_type == "circular" and genome.n_chrom > 1:
        raise ValueError("Do not choose circular if there is more than one chromosome in the genome!")

    _log("Read profile")
    prof = profile_mod.load_profile(
        model_prefix,
        mode="genome",
        perfect=perfect,
        chimeric=chimeric,
        homopolymer=homopolymer,
        fastq=fastq,
        strandness=strandness,
    )
    n_aligned, n_unaligned = profile_mod.split_aligned_unaligned(
        [number], prof.aligned_rate, perfect
    )
    n_aligned, n_unaligned = n_aligned[0], n_unaligned[0]

    ext = ".fastq" if fastq else ".fasta"

    _log("Start simulation of aligned reads")
    if chimeric:
        from .chimeric_mode import ChimericGenomeSimulator

        sim = ChimericGenomeSimulator(
            genome,
            prof,
            fastq=fastq,
            circular_dna=(dna_type == "circular"),
            min_len=min_len,
            max_len=max_len,
            batch=batch,
            kmer_bias=kmer_bias,
        )
    else:
        sim = GenomeSimulator(
            genome,
            prof,
            fastq=fastq,
            perfect=perfect,
            circular_dna=(dna_type == "circular"),
            min_len=min_len,
            max_len=max_len,
            median_len=median_len,
            sd_len=sd_len,
            batch=batch,
            kmer_bias=kmer_bias,
        )
    if n_hosts > 1:
        from ..parallel import (
            MultiHostGenomeRunner, MultiHostModeRunner, init_distributed,
        )

        init_distributed(coordinator, n_hosts if coordinator else None, host_id)
        tag = f"_h{host_id}"
        fw = output.FastxWriter(out + "_aligned_reads" + tag + ext, fastq)
        el = output.ErrorLogWriter(
            out + "_aligned_error_profile" + tag, header=(host_id == 0))
        if chimeric:
            writer = output.ChimericBatchWriter(fw, el, perfect=perfect)
            runner = MultiHostModeRunner(sim, n_hosts, host_id)
        else:
            writer = output.GenomeBatchWriter(fw, el, perfect=perfect)
            runner = MultiHostGenomeRunner(sim, n_hosts, host_id)
        runner.run(n_aligned, writer, seed=seed)
        fw.close()
        el.close()
    else:
        import os as _os

        state_path = out + "_aligned.resume.json"
        resuming = resume and _os.path.exists(state_path)
        fw = output.FastxWriter(out + "_aligned_reads" + ext, fastq, append=resuming)
        el = output.ErrorLogWriter(out + "_aligned_error_profile", header=True,
                                   append=resuming)
        if chimeric:
            writer = output.ChimericBatchWriter(fw, el, perfect=perfect)
            sim.run(n_aligned, writer, seed=seed)
        else:
            writer = output.GenomeBatchWriter(fw, el, perfect=perfect)
            sim.run(n_aligned, writer, seed=seed,
                    resume_state=state_path if resume else None)
        fw.close()
        el.close()

    if not perfect and n_unaligned > 0:
        _log("Start simulation of random reads")
        usim = UnalignedSimulator(
            genome,
            prof,
            fastq=fastq,
            circular_dna=(dna_type == "circular"),
            min_len=min_len,
            max_len=max_len,
            median_len=median_len,
            sd_len=sd_len,
            batch=batch,
        )
        if n_hosts > 1:
            # sharded like the aligned pass: every host runs the same slot
            # schedule, emits its own devices' lanes at psum-numbered global
            # indices into a host-local shard file
            from ..ops import rng as _rng
            from ..parallel import MultiHostModeRunner

            ufw = output.FastxWriter(
                out + "_unaligned_reads" + f"_h{host_id}" + ext, fastq)
            runner = MultiHostModeRunner(
                usim, n_hosts, host_id, stream=_rng.STREAM_UNALIGNED)
            runner.run(n_unaligned, UnalignedBatchWriter(ufw), seed=seed)
        else:
            ufw = output.FastxWriter(out + "_unaligned_reads" + ext, fastq)
            usim.run(n_unaligned, UnalignedBatchWriter(ufw), seed=seed)
        ufw.close()

    output.RUN_STATS.report(_log)
    _log("Finished!")
    return {"aligned": n_aligned, "unaligned": 0 if perfect else n_unaligned}


def calculate_read_number_from_coverage(reference_path, model_prefix, coverage, n_estimation=10_000_000):
    """Lander/Waterman read count for a requested coverage via Monte Carlo
    mean read length (calculate_read_number_from_coverage,
    simulator.py:2024-2068)."""
    import numpy as np

    from ..profiles import error_model, kde

    reference_size = 0
    with open(reference_path) as f:
        for line in f:
            if not line.startswith(">"):
                reference_size += len(line.strip())

    alignment_rate = error_model.read_alignment_rate(model_prefix + "_reads_alignment_rate")
    if alignment_rate is None:
        alignment_rate = 1.0  # "100%": everything aligned

    rng_np = np.random.default_rng(0)
    aligned_n = int(n_estimation * alignment_rate / (alignment_rate + 1))
    k_aligned = kde.load_kde(model_prefix + "_aligned_reads.pkl")
    samples = k_aligned.sample(rng_np, aligned_n)[:, 0]
    k_unaligned = kde.load_kde(model_prefix + "_unaligned_length.pkl")
    samples = np.append(samples, k_unaligned.sample(rng_np, n_estimation - aligned_n)[:, 0])
    mean = samples.mean()
    return int(reference_size / mean * coverage)
