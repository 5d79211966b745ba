"""Top-level model-directory loader.

`load_profile` is the equivalent of the reference's `read_profile`
(simulator.py:244-591) minus reference-sequence reading (see
`nanosim_tpu.io.genome`), returning a typed :class:`ReadProfile` instead of
module globals.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from . import ecdf, error_model, kde


@dataclasses.dataclass
class ExpressionProfile:
    """Weighted transcript-selection table built from a TPM expression tsv.

    Mirrors make_cdf (simulator.py:69-97): transcripts present in the
    reference, sorted ascending by normalized TPM; selection is a weighted
    choice over `weights` (random.choices semantics, simulator.py:1084).
    """

    names: list  # transcript ids, sorted by weight ascending
    lengths: np.ndarray  # [n] int64 transcript lengths
    weights: np.ndarray  # [n] float64, sums to ~1
    cum_weights: np.ndarray  # [n] float64 inclusive cumsum


def load_expression(exp_path: str, seq_len: dict) -> ExpressionProfile:
    dict_exp = {}
    with open(exp_path) as f:
        f.readline()
        for line in f:
            parts = line.split("\t")
            if len(parts) < 3:
                raise ValueError("Expression profile must contain 3 columns: ID, count, TPM")
            tid = parts[0].split(".")[0]
            tpm = float(parts[2])
            if tpm > 0:
                dict_exp[tid] = tpm
    if not dict_exp:
        raise ValueError("Expression profile contains no TPM values > 0")
    matched = [(t, v) for t, v in dict_exp.items() if t in seq_len]
    if not matched:
        raise ValueError(
            "Transcript IDs in the expression profile do not match the reference transcriptome"
        )
    total = sum(v for _, v in matched)
    matched = [(t, v / total) for t, v in matched]
    matched.sort(key=lambda x: x[1])
    names = [t for t, _ in matched]
    weights = np.array([v for _, v in matched], dtype=np.float64)
    return ExpressionProfile(
        names=names,
        lengths=np.array([seq_len[t] for t in names], dtype=np.int64),
        weights=weights,
        cum_weights=np.cumsum(weights),
    )


@dataclasses.dataclass
class TranscriptStructures:
    """Exon/intron structure per transcript from `_added_intron_final.gff3`.

    Entries are (feature_type, chrom, start, end, length, strand) with
    0-based half-open coordinates, matching what the reference stores from
    HTSeq (simulator.py:425-453; HTSeq GFF end_included=True semantics).
    """

    by_transcript: dict  # {trx_id: [(type, chrom, start, end, length, strand)]}


def _parse_gff3_attrs(col9: str) -> dict:
    attrs = {}
    for item in col9.strip().split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            attrs[k.strip()] = v.strip()
    return attrs


def load_transcript_structures(gff_path: str) -> TranscriptStructures:
    out: dict = {}
    with open(gff_path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 9:
                continue
            ftype = cols[2]
            if ftype not in ("exon", "intron"):
                continue
            attrs = _parse_gff3_attrs(cols[8])
            if "transcript_id" in attrs:
                fid = attrs["transcript_id"]
            elif "Parent" in attrs:
                # HTSeq's feature.name is the ID when present, else the Parent
                info = attrs.get("ID", attrs["Parent"]).split(":")
                if len(info) == 1:
                    fid = info[0]
                elif info[0] == "transcript":
                    fid = info[1]
                else:
                    continue
            else:
                continue
            fid = fid.split(".")[0]
            chrom = cols[0]
            if "chr" in chrom:
                chrom = chrom.strip("chr")  # reference semantics (simulator.py:449-450)
            start = int(cols[3]) - 1  # GFF 1-based inclusive -> 0-based
            end = int(cols[4])  # end_included=True -> half-open end == col5
            strand = cols[6]
            out.setdefault(fid, []).append((ftype, chrom, start, end, end - start, strand))
    return TranscriptStructures(by_transcript=out)


def load_polya_list(path: str) -> set:
    out = set()
    with open(path) as f:
        for line in f:
            tid = line.strip().split(".")[0]
            if tid:
                out.add(tid)
    return out


@dataclasses.dataclass
class ReadProfile:
    """Everything a simulation run samples from (the model directory)."""

    strandness_rate: float
    aligned_rate: Optional[float]  # None == '100%'

    # error models (absent in perfect mode)
    mix_params: Optional[error_model.MixtureParams] = None
    trans_error: Optional[np.ndarray] = None  # [7, 3]
    first_match: Optional[ecdf.EcdfTable] = None
    match_markov: Optional[ecdf.EcdfTable] = None

    # length models
    kde_aligned: Optional[kde.KdeModel] = None
    kde_aligned_2d: Optional[kde.KdeModel] = None
    kde_ht: Optional[kde.KdeModel] = None  # log10(x+1) space
    kde_ht_ratio: Optional[kde.KdeModel] = None
    kde_unaligned: Optional[kde.KdeModel] = None

    # chimeric
    segment_mean: Optional[float] = None
    abun_inflation: Optional[float] = None
    kde_gap: Optional[kde.KdeModel] = None  # log10(x+1) space

    # fastq base qualities
    base_quals: Optional[dict] = None

    # homopolymers
    hp_params: Optional[error_model.HomopolymerParams] = None

    # transcriptome extras
    ir_markov: Optional[np.ndarray] = None  # [3, 2]
    structures: Optional[TranscriptStructures] = None
    polya: Optional[set] = None


def split_aligned_unaligned(number_list, aligned_rate, perfect: bool):
    """Per-sample (aligned, unaligned) read counts (simulator.py:465-467,
    535-542)."""
    if perfect:
        return list(number_list), [0] * len(number_list)
    if aligned_rate is None:
        aligned = list(number_list)
    else:
        aligned = [int(round(x * aligned_rate / (aligned_rate + 1))) for x in number_list]
    unaligned = [x - y for x, y in zip(number_list, aligned)]
    return aligned, unaligned


def load_profile(
    model_prefix: str,
    mode: str = "genome",
    perfect: bool = False,
    chimeric: bool = False,
    homopolymer: bool = False,
    fastq: bool = False,
    model_ir: bool = False,
    polya_path: Optional[str] = None,
    strandness: Optional[float] = None,
    need_unaligned: bool = True,
) -> ReadProfile:
    """Load a model directory with the same conditional structure as the
    reference's read_profile (simulator.py:244-591)."""

    if strandness is None:
        strandness_rate = error_model.read_strandness(model_prefix + "_strandness_rate")
    else:
        strandness_rate = strandness

    p = ReadProfile(strandness_rate=strandness_rate, aligned_rate=None)

    if not perfect:
        p.mix_params = error_model.read_model_profile(model_prefix + "_model_profile")
        p.trans_error = error_model.read_error_markov(model_prefix + "_error_markov_model")
        p.first_match = ecdf.read_ecdf_file(model_prefix + "_first_match.hist")
        p.match_markov = ecdf.read_ecdf_file(model_prefix + "_match_markov_model")
        p.aligned_rate = error_model.read_alignment_rate(model_prefix + "_reads_alignment_rate")
        if homopolymer:
            p.hp_params = error_model.read_homopolymer_params(
                model_prefix + "_hp_lengths_model_parameters.tsv"
            )
        if need_unaligned and p.aligned_rate is not None and os.path.exists(
            model_prefix + "_unaligned_length.pkl"
        ):
            p.kde_unaligned = kde.load_kde(model_prefix + "_unaligned_length.pkl")

    p.kde_ht = kde.load_kde(model_prefix + "_ht_length.pkl", log_transform=True)
    p.kde_ht_ratio = kde.load_kde(model_prefix + "_ht_ratio.pkl")

    # Perfect mode samples total read length; otherwise the aligned-region
    # length (simulator.py:559-567).
    if mode == "transcriptome":
        p.kde_aligned_2d = kde.load_kde(model_prefix + "_aligned_region_2d.pkl")
        if perfect and os.path.exists(model_prefix + "_aligned_reads.pkl"):
            p.kde_aligned = kde.load_kde(model_prefix + "_aligned_reads.pkl")
    elif perfect:
        p.kde_aligned = kde.load_kde(model_prefix + "_aligned_reads.pkl")
    else:
        p.kde_aligned = kde.load_kde(model_prefix + "_aligned_region.pkl")

    if chimeric:
        p.segment_mean, p.abun_inflation = error_model.read_chimeric_info(
            model_prefix + "_chimeric_info"
        )
        p.kde_gap = kde.load_kde(model_prefix + "_gap_length.pkl", log_transform=True)

    if fastq:
        p.base_quals = error_model.read_base_quality_params(
            model_prefix + "_base_qualities_model_parameters.tsv"
        )

    if mode == "transcriptome" and model_ir:
        p.ir_markov = error_model.read_ir_markov(model_prefix + "_IR_markov_model")
        p.structures = load_transcript_structures(model_prefix + "_added_intron_final.gff3")

    if polya_path:
        p.polya = load_polya_list(polya_path)

    return p
