"""Compacted single-transfer fetch path: byte-identity vs the padded path.

The CompactFetcher (device chunk compaction + flat C++ emitter) is purely an
IO/layout optimization — FASTA/FASTQ records and the ground-truth error log
must be byte-identical to the legacy padded fetch + per-row emitter.
"""

import filecmp
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import compact, output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cf")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=600, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [30000, 12000], seed=5)
    return d, prefix, ref_fa


def _run(setup, tag, fetcher_kind, fastq=False, n=250, batch=128, seed=3,
         use_async=False):
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq)
    sim = GenomeSimulator(genome, prof, fastq=fastq, batch=batch)

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.genome_mode import run_prefetched
    import jax.numpy as jnp

    ext = ".fastq" if fastq else ".fasta"
    rp = str(d / f"{tag}{ext}")
    ep = str(d / f"{tag}.err")
    fw = out_mod.FastxWriter(rp, fastq)
    el = out_mod.ErrorLogWriter(ep)
    w = out_mod.GenomeBatchWriter(fw, el)
    if use_async:
        w = out_mod.AsyncBatchWriter(w)

    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    fn = sim.batch_fn()
    if fetcher_kind == "compact":
        fetcher = out_mod.CompactFetcher(fastq, True, batch, est_bases=700.0,
                                         est_events=64.0)
    else:
        fetcher = out_mod.PipelinedFetcher(fastq, True)

    def make_batch(slot_start):
        slots = jnp.arange(slot_start, slot_start + batch, dtype=jnp.int64)
        return fetcher.dispatch(fn(base, slots))

    got = run_prefetched(make_batch, batch, n, w, sim)
    if use_async:
        w.close()
    fw.close()
    el.close()
    assert got == n
    return rp, ep


def test_compact_matches_padded(setup):
    rp1, ep1 = _run(setup, "padded", "padded")
    rp2, ep2 = _run(setup, "compact", "compact")
    assert filecmp.cmp(rp1, rp2, shallow=False), "FASTA records differ"
    assert filecmp.cmp(ep1, ep2, shallow=False), "error logs differ"


def test_compact_matches_padded_fastq(setup):
    rp1, ep1 = _run(setup, "padded_q", "padded", fastq=True)
    rp2, ep2 = _run(setup, "compact_q", "compact", fastq=True)
    assert filecmp.cmp(rp1, rp2, shallow=False), "FASTQ records differ"
    assert filecmp.cmp(ep1, ep2, shallow=False), "error logs differ"


def test_compact_async_matches_sync(setup):
    rp1, ep1 = _run(setup, "sync", "compact")
    rp2, ep2 = _run(setup, "async", "compact", use_async=True)
    assert filecmp.cmp(rp1, rp2, shallow=False)
    assert filecmp.cmp(ep1, ep2, shallow=False)


def test_capacity_overflow_repacks(setup):
    """Absurdly low initial capacity estimates must bump + repack, not break."""
    rp1, ep1 = _run(setup, "norm", "compact")
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=128)

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.genome_mode import run_prefetched
    import jax.numpy as jnp

    rp = str(d / "tiny.fasta")
    ep = str(d / "tiny.err")
    fw = out_mod.FastxWriter(rp, False)
    el = out_mod.ErrorLogWriter(ep)
    w = out_mod.GenomeBatchWriter(fw, el)
    base = rng.base_key(3, rng.STREAM_ALIGNED)
    fn = sim.batch_fn()
    fetcher = out_mod.CompactFetcher(False, True, 128, est_bases=1.0, est_events=0.1)

    def make_batch(slot_start):
        slots = jnp.arange(slot_start, slot_start + 128, dtype=jnp.int64)
        return fetcher.dispatch(fn(base, slots))

    got = run_prefetched(make_batch, 128, 250, w, sim)
    fw.close()
    el.close()
    assert got == 250
    assert filecmp.cmp(rp1, rp, shallow=False)
    assert filecmp.cmp(ep1, ep, shallow=False)


def test_python_fallback_matches_native(setup, monkeypatch):
    rp1, ep1 = _run(setup, "nat", "compact")
    import nanosim_tpu.io.native as native_mod

    monkeypatch.setattr(native_mod.NativeEmitter, "available", property(lambda self: False))
    rp2, ep2 = _run(setup, "pyfb", "compact")
    assert filecmp.cmp(rp1, rp2, shallow=False)
    assert filecmp.cmp(ep1, ep2, shallow=False)


def test_overflow_rescue_matches_full_budget(setup):
    """A pathologically lean event budget must change NOTHING: overflow lanes
    are re-run through the full-budget program and spliced back in slot
    order (OverflowRescueWriter)."""
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")

    outs = {}
    for tag, e_max in (("normal", None), ("lean8", 8), ("lean32", 32)):
        sim = GenomeSimulator(genome, prof, batch=64)
        if e_max is not None:
            sim.e_max = e_max
        rp = str(d / f"resc_{tag}.fasta")
        ep = str(d / f"resc_{tag}.err")
        fw = out_mod.FastxWriter(rp, False)
        el = out_mod.ErrorLogWriter(ep)
        got = sim.run(200, out_mod.GenomeBatchWriter(fw, el), seed=7)
        fw.close()
        el.close()
        assert got == 200
        outs[tag] = (open(rp, "rb").read(), open(ep, "rb").read())
    assert outs["lean8"] == outs["normal"]
    assert outs["lean32"] == outs["normal"]


def test_walk_replay_matches_device_events(setup):
    """The C++ walk replay must regenerate the exact event stream the device
    computed (same threefry, same tables, checksum-verified), and a run with
    replay must be byte-identical to one that transfers events."""
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=128)

    import jax.numpy as jnp

    from nanosim_tpu.io.native import WalkReplayer
    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.bundles import FULL_EVENT_SLACK, plan_event_budget

    seed = 5
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    fn = sim.batch_fn()
    out = fn(base, jnp.arange(128, dtype=jnp.int64))
    replayer = WalkReplayer(
        prof, seed, rng.STREAM_ALIGNED, rng.SITE_WALK,
        e_guard=plan_event_budget(prof, sim.l_cap, slack=FULL_EVENT_SLACK),
    )
    assert replayer.available

    fe = out_mod.CompactFetcher(False, True, 128, 700.0, 64.0)  # transfers events
    fr = out_mod.CompactFetcher(False, True, 128, 700.0, 64.0, replayer=replayer)
    assert fr.replayer is not None
    he = fe.dispatch(out)
    hr = fr.dispatch(out)
    hr.slots = np.arange(128, dtype=np.int64)
    cbe = he.fetch()
    cbr = hr.fetch()
    v = cbe.valid & ~cbe.cap_over
    for b in np.nonzero(v)[0]:
        ne = int(cbe.n_events[b])
        ee = cbe.ev_flat[int(cbe.ev_off[b]) : int(cbe.ev_off[b]) + ne]
        rr = cbr.ev_flat[int(cbr.ev_off[b]) : int(cbr.ev_off[b]) + ne]
        np.testing.assert_array_equal(ee, rr)


def test_walk_replay_checksum_fallback(setup, monkeypatch):
    """A replay/checksum mismatch must silently fall back to the exact
    device event stream (corrupt the replay verdict to force it)."""
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")

    def run_full(tag):
        sim = GenomeSimulator(genome, prof, batch=64)
        rp = str(d / f"{tag}.fasta")
        ep = str(d / f"{tag}.err")
        fw = out_mod.FastxWriter(rp, False)
        el = out_mod.ErrorLogWriter(ep)
        got = sim.run(150, out_mod.GenomeBatchWriter(fw, el), seed=6)
        fw.close()
        el.close()
        assert got == 150
        return rp, ep

    rp1, ep1 = run_full("rep_ok")

    from nanosim_tpu.io import native as native_mod

    real_replay = native_mod.WalkReplayer.replay

    def corrupted(self, slots, lane_do, m_ref, n_events, checksums, ev_out, ev_off):
        ok = real_replay(self, slots, lane_do, m_ref, n_events, checksums, ev_out, ev_off)
        ok = ok.copy()
        ok[: len(ok) // 2] = False  # force fallback
        return ok

    monkeypatch.setattr(native_mod.WalkReplayer, "replay", corrupted)
    rp2, ep2 = run_full("rep_fb")
    assert filecmp.cmp(rp1, rp2, shallow=False)
    assert filecmp.cmp(ep1, ep2, shallow=False)


def test_kill_and_resume_byte_identical(setup):
    """An interrupted run resumed from its (slot cursor, accepted) checkpoint
    must produce byte-identical concatenated output to an uninterrupted run."""
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    quota, seed = 260, 17

    def fresh_sim():
        return GenomeSimulator(genome, prof, batch=64)

    # uninterrupted
    fw = out_mod.FastxWriter(str(d / "uni.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "uni.err"))
    got = fresh_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == quota

    # interrupted after 2 batches (max_batches simulates the kill)...
    state = str(d / "resume.json")
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "res.err"))
    got1 = fresh_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed,
                           max_batches=2, resume_state=state)
    fw.close()
    el.close()
    assert 0 < got1 < quota
    assert os.path.exists(state)

    # ...then resumed with APPENDED files
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False, append=True)
    el = out_mod.ErrorLogWriter(str(d / "res.err"), append=True)
    got2 = fresh_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed,
                           resume_state=state)
    fw.close()
    el.close()
    assert got2 == quota

    assert filecmp.cmp(str(d / "uni.fasta"), str(d / "res.fasta"), shallow=False)
    assert filecmp.cmp(str(d / "uni.err"), str(d / "res.err"), shallow=False)


def test_chunk_compact_roundtrip():
    """Direct packer unit test: random lane prefixes survive the round trip."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    B, W = 16, 2048
    rows = rs.randint(0, 256, (B, W)).astype(np.uint8)
    lane_bytes = rs.randint(0, W + 1, B).astype(np.int32)
    lane_bytes[3] = 0
    cap = int(sum((int(b) + compact.CHUNK - 1) // compact.CHUNK for b in lane_bytes)) + 2
    flat, need = compact._chunk_compact(jnp.asarray(rows), jnp.asarray(lane_bytes), cap)
    flat = np.asarray(flat)
    assert int(need) <= cap
    nch = (lane_bytes + compact.CHUNK - 1) // compact.CHUNK
    off = (np.cumsum(nch) - nch) * compact.CHUNK
    for b in range(B):
        n = int(lane_bytes[b])
        got = flat[int(off[b]) : int(off[b]) + n]
        np.testing.assert_array_equal(got, rows[b, :n])
