"""Chimeric genome-mode tests: per-segment structural verification and
writer output."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

import jax.numpy as jnp

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import rng
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

COMP_LUT = np.arange(256, dtype=np.uint8)
for a, b in ((ord("A"), ord("T")), (ord("C"), ord("G"))):
    COMP_LUT[a], COMP_LUT[b] = b, a


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("chim")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=150)
    # inflate segment mean so multi-segment reads are common
    from nanosim_tpu.profiles import error_model

    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.9, 0.2)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [30000, 15000], seed=6)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", chimeric=True)
    return d, genome, prof


def test_chimeric_structure(setup):
    d, genome, prof = setup
    sim = ChimericGenomeSimulator(genome, prof, batch=96)
    fn = sim.batch_fn()
    base = rng.base_key(2, rng.STREAM_ALIGNED)
    out = fn(base, jnp.arange(96, dtype=jnp.int64))

    valid = np.asarray(out.valid)
    assert valid.sum() > 40
    n_seg = np.asarray(out.n_seg)
    assert (n_seg[valid] > 1).any(), "expected some multi-segment reads"

    reads = np.asarray(out.read)
    total = np.asarray(out.total_len)
    head = np.asarray(out.head)
    tail = np.asarray(out.tail)
    seg_mref = np.asarray(out.seg_middle_ref)
    seg_lnew = np.asarray(out.seg_l_new)
    seg_off = np.asarray(out.seg_offset)
    gap_len = np.asarray(out.gap_len)
    chrom = np.asarray(out.chrom)
    pos = np.asarray(out.local_pos)
    rev = np.asarray(out.is_reversed)
    n_events = np.asarray(out.n_events)
    ev_p = np.asarray(out.ev_pos2x)
    ev_t = np.asarray(out.ev_type)
    ev_l = np.asarray(out.ev_len)
    B = reads.shape[0]

    checked_segs = 0
    for b in np.nonzero(valid)[0]:
        ns = n_seg[b]
        # length bookkeeping: head + segs + gaps + tail == total
        expect = head[b] + seg_lnew[b, :ns].sum() + gap_len[b, : ns - 1].sum() + tail[b]
        assert expect == total[b], b

        pre = reads[b, : total[b]]
        if rev[b]:
            pre = COMP_LUT[pre[::-1]]
        for s in range(ns):
            flat = s * B + b
            mid = pre[seg_off[b, s] : seg_off[b, s] + seg_lnew[b, s]]
            ref_slice = genome.slice(chrom[b, s], pos[b, s], seg_mref[b, s]).tobytes().decode()
            # replay events structurally (unknown bases as '?')
            read = ref_slice
            ne = n_events[b, s]
            evs = []
            for e in range(ne):
                t = int(ev_t[flat, e])
                ln = int(ev_l[flat, e])
                # reference dict-overwrite: of consecutive same-key
                # insertions only the LAST survives (simulator.py:1880-1882)
                if (t == 1 and e + 1 < ne and int(ev_t[flat, e + 1]) == 1
                        and ev_p[flat, e + 1] == ev_p[flat, e]):
                    continue
                evs.append((int((ev_p[flat, e] + 1) // 2), t, ln))
            # reverse emission order preserves the reference's half-position
            # tie-break (a mis at pos applies before an ins at pos - 0.5)
            for key, t, ln in reversed(evs):
                if t == 0:
                    read = read[:key] + "?" * ln + read[key + ln :]
                elif t == 2:
                    read = read[:key] + read[key + ln :]
                else:
                    read = read[:key] + "?" * ln + read[key:]
            m = mid.tobytes().decode()
            assert len(m) == len(read), (b, s)
            for x, y in zip(m, read):
                assert y == "?" or x == y, (b, s)
            checked_segs += 1
    assert checked_segs > 50


def test_chimeric_writer_end_to_end(setup):
    d, genome, prof = setup
    sim = ChimericGenomeSimulator(genome, prof, batch=64)
    fw = out_mod.FastxWriter(str(d / "chim_aligned_reads.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "chim_err"))
    w = out_mod.ChimericBatchWriter(fw, el)
    got = sim.run(60, w, seed=4)
    fw.close()
    el.close()
    assert got >= 60

    # Python fallback path must produce byte-identical output to the C++
    # emitter (same records, same error-log lines)
    import nanosim_tpu.io.native as native_mod

    if native_mod.get_lib() is not None:
        fw2 = out_mod.FastxWriter(str(d / "chim_py.fasta"), False)
        el2 = out_mod.ErrorLogWriter(str(d / "chim_py_err"))
        w2 = out_mod.ChimericBatchWriter(fw2, el2)
        w2._emitter.lib = None  # force the pure-Python path
        sim2 = ChimericGenomeSimulator(genome, prof, batch=64)
        got2 = sim2.run(60, w2, seed=4)
        fw2.close()
        el2.close()
        assert got2 == got
        assert open(str(d / "chim_py.fasta"), "rb").read() == open(
            str(d / "chim_aligned_reads.fasta"), "rb").read()
        assert open(str(d / "chim_py_err"), "rb").read() == open(
            str(d / "chim_err"), "rb").read()

    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(str(d / "chim_aligned_reads.fasta"))
    assert len(records) == 60
    n_chim = 0
    for name, seq, _ in records:
        fields = name.split("_")
        assert "aligned" in fields
        if "chimeric" in fields:
            n_chim += 1
            # multi-segment names have ';'-joined components and middles
            mids = fields[-2]
            assert ";" in mids or len(name.split(";")) > 1
        # flanks are integers
        int(fields[-1])
        int(fields[-3].split(";")[-1]) if ";" in fields[-3] else int(fields[-3])
    assert n_chim > 5


def test_packed_meta_equals_unpacked_fallback(setup):
    """The dense-packed meta program (segments routed to a [2B] lane block)
    must produce byte-identical meta rows to the unpacked [S*B] program —
    the spill-fallback path relies on this equivalence, and it proves lane
    placement cannot change any (slot, part)-addressed draw."""
    d, genome, prof = setup
    sim = ChimericGenomeSimulator(genome, prof, batch=64)
    import functools

    from nanosim_tpu.sim.chimeric_mode import chimeric_batch, pack_chimeric_meta

    seed = 41
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.arange(0, 64, dtype=jnp.int64)
    fn = functools.partial(
        chimeric_batch,
        species=jnp.zeros((64, sim.s_max), jnp.int32),
        genome=sim.genome_dev,
        tables=sim.tables,
        emit_reads=False,
        **sim.kw,
    )
    packed_meta = np.asarray(pack_chimeric_meta(fn(base, slots)))
    unpacked_meta = sim.chimeric_meta_unpacked(np.asarray(slots), seed)
    assert packed_meta.shape == unpacked_meta.shape
    assert np.array_equal(packed_meta, unpacked_meta)
    # non-vacuity: multi-segment reads present, and both runs accepted reads
    from nanosim_tpu.sim.chimeric_mode import decode_chimeric_meta

    dd = decode_chimeric_meta(packed_meta, sim.s_max)
    assert (dd["n_seg"] > 1).sum() >= 10
    assert dd["valid"].sum() >= 20
    assert not dd["spill"].any()

def test_spill_counter_and_unpacked_rerun(setup, monkeypatch):
    """Forcing a tiny packed lane capacity makes every batch spill: the run
    must (a) report it through RUN_STATS (observability for a workload that
    silently spills every batch) and (b) still produce byte-identical output
    via the unpacked re-run (segment_mean=1.9 fixture)."""
    d, genome, prof = setup
    from nanosim_tpu.sim.output import RUN_STATS

    def run(tag):
        fw = out_mod.FastxWriter(str(d / f"{tag}.fasta"), False)
        el = out_mod.ErrorLogWriter(str(d / f"{tag}.err"))
        sim = ChimericGenomeSimulator(genome, prof, batch=64)
        got = sim.run(40, out_mod.ChimericBatchWriter(fw, el), seed=9)
        fw.close()
        el.close()
        assert got == 40
        return open(str(d / f"{tag}.fasta"), "rb").read(), open(
            str(d / f"{tag}.err"), "rb").read()

    RUN_STATS.reset()
    base_fa, base_err = run("spill_base")
    assert RUN_STATS.packed_spills == 0

    monkeypatch.setenv("NANOSIM_TPU_PACKED_CAP", "8")
    RUN_STATS.reset()
    forced_fa, forced_err = run("spill_forced")
    assert RUN_STATS.packed_spills >= 1, "forced cap must trip the spill path"
    assert "packed_spills" in RUN_STATS.summary()
    assert forced_fa == base_fa
    assert forced_err == base_err
