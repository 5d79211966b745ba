"""Bit-identity harness: drive the REFERENCE simulator with this framework's
RNG stream and compare outputs byte-for-byte (BASELINE.md north star).

The reference's own randomness is irreproducible (it re-seeds from OS entropy
before each worker fork, simulator.py:1590-1592), so the "fixed seed mapping"
is OURS: every primitive draw the reference consumes is replaced by the value
our counter-based (seed, slot, site) stream produces for the same decision.
The reference's LOGIC — ECDF inversion on its parsed model dicts, the error
walk's state/overshoot bookkeeping, string splicing in mutate_read, ground
truth logging, extraction scanning, reverse complement, record formatting —
all runs untouched; only the primitive draws are fed.  Byte-equal output
files then prove our kernels implement the same transforms.

Feeding model, per ACCEPTED slot (our rejected slots never reach the
reference, so its rejection-retry bookkeeping never fires; its min/max-length
filters still run and would desync the comparison if our acceptance logic
were wrong):

  random.random():  u_strand, then the walk uniforms U(t, 0) / U(t, 2)
  mm.pois_geom / mm.wei_geom:  our event lengths (type cross-checked)
  random.randint:   our position draws, one per boundary-rejection retry
  random.choice:    our substituted / inserted bases (reverse event order,
                    exactly as mutate_read consumes them)
  np.random.choice: our head / tail base strings
  get_length_kde / get_lengths_and_ht_ratios:  our accepted slots' values

This module never copies reference code — it imports and executes it.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refshim.oracle import import_reference_simulator


class FeedExhausted(Exception):
    pass


class Desync(Exception):
    pass


class _Feed:
    """Tagged value queues with strict order checking."""

    def __init__(self):
        self.q = []  # list of (tag, value)
        self.pos = 0

    def push(self, tag, value):
        self.q.append((tag, value))

    def pop(self, tag):
        if self.pos >= len(self.q):
            raise FeedExhausted(f"feed exhausted wanting {tag}")
        t, v = self.q[self.pos]
        if t != tag:
            raise Desync(f"reference asked for {tag}, feed has {t} at {self.pos}")
        self.pos += 1
        return v


class _RandomProxy:
    """Stands in for the `random` module inside the reference simulator."""

    def __init__(self, feed: _Feed):
        self._feed = feed

    def random(self):
        return float(self._feed.pop("random"))

    def randint(self, a, b):
        v = int(self._feed.pop("randint"))
        if not (a <= v <= b):
            raise Desync(f"randint({a},{b}) fed {v}")
        return v

    def choice(self, seq):
        v = self._feed.pop("choice")
        if v not in seq:
            raise Desync(f"choice from {seq} fed {v!r}")
        return v

    def seed(self, *a, **k):
        pass


class _NpRandomProxy:
    def __init__(self, feed: _Feed):
        self._feed = feed

    def choice(self, seq, n=None):
        v = self._feed.pop("npchoice")
        if n is not None and len(v) != n:
            raise Desync(f"np.random.choice n={n} fed {len(v)}")
        return np.asarray(list(v))

    def seed(self, *a, **k):
        pass

    def __getattr__(self, name):  # geometric etc. must not be reached
        raise Desync(f"unexpected np.random.{name} call")


class _NpProxy:
    """numpy passthrough with a fed `random` submodule."""

    def __init__(self, feed: _Feed):
        self.random = _NpRandomProxy(feed)

    def __getattr__(self, name):
        return getattr(np, name)


class _QualsProxy:
    """Stands in for model_base_qualities: pool draws are fed lists whose
    pop() order yields our per-position quality values."""

    def __init__(self, feed: _Feed):
        self._feed = feed

    def predict_base_qualities(self, sd, loc, scale, n):
        v = self._feed.pop("quals")
        if len(v) != n:
            raise Desync(f"qual pool size {n} fed {len(v)} values")
        return list(v)

    def __getattr__(self, name):
        raise Desync(f"unexpected model_base_quals.{name} call")


class _MixProxy:
    """Stands in for the reference's `mixed_model` import: error lengths are
    fed from our event list, with the distribution family cross-checked
    against our event type."""

    def __init__(self, feed: _Feed):
        self._feed = feed

    def pois_geom(self, *a):
        t, v = self._feed.pop("mix")
        if t != 0:
            raise Desync(f"reference drew pois_geom (mis) but our event type is {t}")
        return int(v)

    def wei_geom(self, *a):
        t, v = self._feed.pop("mix")
        if t not in (1, 2):
            raise Desync(f"reference drew wei_geom (indel) but our event type is {t}")
        return int(v)


_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _prereverse(read_bytes: bytes, rev: bool) -> bytes:
    return read_bytes[::-1].translate(_COMP) if rev else read_bytes


def build_feed(records, profile, genome, seed: int, circular: bool = False) -> _Feed:
    """Build the primitive-draw feed for a list of accepted-read records.

    Each record: dict with slot, m_ref (walk input length), n_events,
    ev_pos2x/ev_type/ev_len (np arrays, length n_events), head, tail, l_new,
    total, rev, chrom, pos, read (np.uint8 final orientation), remainder
    implicit (head+tail), and middle_ref.
    """
    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.output import event_read_positions

    feed = _Feed()
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.asarray(np.array([r["slot"] for r in records], np.int64))
    sk = rng.slot_keys(base, slots)
    n = len(records)

    # strand + walk uniforms (bulk, CPU)
    u_strand = np.asarray(rng.uniform_per_slot(sk, rng.SITE_STRAND))
    wk = rng.site_keys(sk, rng.SITE_WALK)
    max_e = max((int(r["n_events"]) for r in records), default=0)
    ts = jnp.arange(max_e + 1, dtype=jnp.int32)
    U = np.asarray(
        jax.vmap(
            lambda k: jax.vmap(
                lambda t: jax.random.uniform(jax.random.fold_in(k, t), (3,), dtype=jnp.float32)
            )(ts)
        )(wk)
    )  # [n, max_e+1, 3]

    # position draws (8 retry rounds, f64 uniforms as the device does)
    pos_keys = rng.site_keys(sk, rng.SITE_POSITION)
    upos = np.asarray(
        jax.vmap(
            lambda k: jax.vmap(
                lambda r: jax.random.uniform(jax.random.fold_in(k, r), dtype=jnp.float64)
            )(jnp.arange(8))
        )(pos_keys)
    )  # [n, 8]
    glen = genome.total_len
    g_offsets = np.asarray(genome.offsets)
    g_lengths = np.asarray(genome.lengths)

    for i, r in enumerate(records):
        feed.push("random", u_strand[i])  # is_reversed

        ne = int(r["n_events"])
        feed.push("random", U[i, 0, 0])  # first match
        for e in range(ne):
            feed.push("random", U[i, e + 1, 0])  # error type
            feed.push("mix", (int(r["ev_type"][e]), int(r["ev_len"][e])))
            feed.push("random", U[i, e + 1, 2])  # next match

        # extraction: circular takes ONE unrejected draw (simulator.py:1753);
        # linear retries global positions until one fits a chromosome
        m_ref_final = int(r["middle_ref"])
        if circular:
            gpos = min(int(upos[i, 0] * (glen + 1)), glen)
            if gpos != int(r["pos"]) or int(r["chrom"]) != 0:
                raise Desync(f"slot {r['slot']}: circular position replay mismatch")
            feed.push("randint", gpos)
        else:
            for rr in range(8):
                gpos = min(int(upos[i, rr] * (glen + 1)), glen)
                c = int(np.searchsorted(g_offsets, gpos, side="right")) - 1
                c = min(max(c, 0), len(g_lengths) - 1)
                lp = gpos - int(g_offsets[c])
                fits = lp + m_ref_final <= int(g_lengths[c])
                feed.push("randint", gpos)
                if fits:
                    if c != int(r["chrom"]) or lp != int(r["pos"]):
                        raise Desync(
                            f"slot {r['slot']}: position replay ({c},{lp}) != recorded "
                            f"({int(r['chrom'])},{int(r['pos'])})"
                        )
                    break
            else:
                raise Desync(f"slot {r['slot']}: no fitting position in 8 draws")

        # mutate_read consumes substituted/inserted bases in REVERSE event
        # order; values are the bases our pipeline actually emitted
        pre = _prereverse(r["read"].tobytes(), bool(r["rev"]))
        head, l_new = int(r["head"]), int(r["l_new"])
        mid = pre[head : head + l_new]
        fastq = r.get("quals") is not None
        keys = rpos = eff = None
        if ne:
            keys, rpos, eff = event_read_positions(
                r["ev_pos2x"][None, :], r["ev_type"][None, :], r["ev_len"][None, :],
                np.ones((1, ne), bool),
            )

        if fastq:
            _push_qual_pools(feed, r, mid, keys, rpos, eff)

        if ne:
            order = np.argsort(-(r["ev_pos2x"].astype(np.int64)), kind="stable")
            for e in order:
                t = int(r["ev_type"][e])
                ln = int(eff[0, e])  # 0 for overwritten duplicate insertions
                rp = int(rpos[0, e])
                if t == 2:
                    continue
                for j in range(ln):
                    feed.push("choice", chr(mid[rp + j]))

        if fastq:
            q = r["quals"]
            preq = bytes(q[::-1]) if r["rev"] else bytes(q)
            ht = [int(x) - 33 for x in preq[:head] + preq[head + l_new : int(r["total"])]]
            feed.push("quals", ht)

        feed.push("npchoice", pre[:head].decode())
        feed.push("npchoice", pre[head + l_new : int(r["total"])].decode())
    return feed


def _push_qual_pools(feed, r, mid, keys, rpos, eff):
    """Feed the mis/ins/match quality pools for one read.

    The reference sizes the pools from error_list's e_count tallies (which
    include overwritten duplicate insertions and the first-match cap), then
    pops them per base while splicing in reverse event order; pop() takes
    the LAST element, so pools are built in reverse pop order with our
    per-position qualities as values.  Unpopped slack (dead insertions) is
    padded at the FRONT.
    """
    ne = int(r["n_events"])
    m_ref = int(r["m_ref"])
    middle_f = int(r["middle_ref"])
    raw_len = r["ev_len"].astype(np.int64) if ne else np.zeros(0, np.int64)
    typ = r["ev_type"].astype(np.int64) if ne else np.zeros(0, np.int64)
    mis_total = int(raw_len[typ == 0].sum())
    ins_total = int(raw_len[typ == 1].sum())
    del_total = int(raw_len[typ == 2].sum())
    if ne:
        first = int(r["ev_pos2x"][0]) // 2 if typ[0] != 1 else (int(r["ev_pos2x"][0]) + 1) // 2
    else:
        first = middle_f
    match_total = min(first, m_ref) + (middle_f - first - mis_total - del_total)

    # our middle qualities in pre-reverse orientation
    q = r["quals"]
    preq = bytes(q[::-1]) if r["rev"] else bytes(q)
    head, l_new = int(r["head"]), int(r["l_new"])
    midq = [int(x) - 33 for x in preq[head : head + l_new]]

    # simulate the pop sequence: quals[s] (construction order) = final
    # reversed index l_new-1-s; record (pool, value) per pop
    pops = {"mis": [], "ins": [], "match": []}
    s = 0

    def pop(pool):
        nonlocal s
        pops[pool].append(midq[l_new - 1 - s])
        s += 1

    prev = middle_f
    if ne:
        order = np.argsort(-(r["ev_pos2x"].astype(np.int64)), kind="stable")
        for e in order:
            t = int(typ[e])
            ln = int(eff[0, e])
            key = int(keys[0, e])
            err_end = key + ln if t != 1 else key
            err_quals_n = ln if t in (0, 1) else 0
            # matches AFTER the error (between err_end and prev)
            n_match = prev - err_end
            for _ in range(max(n_match, 0)):
                pop("match")
            for _ in range(err_quals_n):
                pop("mis" if t == 0 else "ins")
            prev = key
    # leading matches (remaining pool drained at the end by the reference)
    while s < l_new and len(pops["match"]) < match_total:
        pop("match")
    if s != l_new:
        raise Desync(
            f"slot {r['slot']}: qual pop simulation used {s} of {l_new} positions")

    def pool_list(name, total):
        vals = pops[name]
        if len(vals) > total:
            raise Desync(f"slot {r['slot']}: {name} pool popped {len(vals)} > {total}")
        # pad unpopped slack at the front; reverse pop order at the back
        return [1] * (total - len(vals)) + vals[::-1]

    feed.push("quals", pool_list("mis", mis_total))
    feed.push("quals", pool_list("ins", ins_total))
    feed.push("quals", pool_list("match", match_total))


# --- host walk replay + -hp suppression (numpy twins of the device) ---------


def make_walk_tables_np(profile):
    """Numpy copies of the exact-breakpoint walk tables (same arrays the
    device and the C++ replay use)."""
    from nanosim_tpu.ops import tables as dev_tables
    from nanosim_tpu.profiles.ecdf import exact_breakpoints

    def ecdf_np(t):
        breaks, vals, n_bk = exact_breakpoints(t)
        return dict(bin_lo=np.asarray(t.bin_lo, np.int64), breaks=breaks,
                    vals=vals, n_bk=n_bk)

    p = profile.mix_params
    mix = np.stack([
        dev_tables._pois_geom_cdf(p.mis[0], p.mis[2], p.mis[3], 1024),
        dev_tables._wei_geom_cdf(p.ins[0], p.ins[1], p.ins[2], p.ins[3], 1024),
        dev_tables._wei_geom_cdf(p.dele[0], p.dele[1], p.dele[2], p.dele[3], 1024),
    ]).astype(np.float32)
    trans = np.cumsum(profile.trans_error, axis=1).astype(np.float32)
    return dict(fm=ecdf_np(profile.first_match), mm=ecdf_np(profile.match_markov),
                mix=mix, trans=trans)


def _ecdf_invert_np(t, lane, p):
    cnt = int((t["breaks"][lane] <= np.float32(p)).sum())
    idx = min(max(cnt - 1, 0), int(t["n_bk"][lane]) - 1)
    return int(t["vals"][lane, idx])


def replay_walk_np(tables, seed, stream, slot, m_ref, e_guard=8192):
    """Regenerate one lane's RAW walk events (pre -hp suppression), numpy
    twin of ops/error_walk.error_walk (and the C++ replay_walk_batch).

    Returns (events [(pos2x, type, len)], middle_ref, l_new)."""
    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.reconstruct import bits_at, fold_in, key_root

    wk = key_root(seed, stream, slot, rng.SITE_WALK)

    def u3(t):
        b = bits_at(fold_in(wk, t), np.arange(3))
        return ((b >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32) - np.float32(1.0)

    u0 = u3(0)[0]
    fm = _ecdf_invert_np(tables["fm"], 0, u0)
    pm = max(fm, 2)
    pos, mref, lnew, state = pm, int(m_ref), int(m_ref), 0
    bin_lo = tables["mm"]["bin_lo"]
    nb = len(bin_lo)
    evs = []
    t = 1
    while pos < mref and len(evs) < e_guard:
        ue, ul, um = u3(t)
        etype = min(int((tables["trans"][state] <= ue).sum()), 2)
        elen = 1 + int((tables["mix"][etype] < ul).sum())
        is_ins = etype == 1
        is_del = etype == 2
        e_pos2x = 2 * pos - 1 if is_ins else 2 * pos
        pos_after = pos + (0 if is_ins else elen)
        over1 = max(pos_after - mref, 0)
        lnew += (elen if is_ins else (-elen if is_del else 0)) + over1
        if not is_ins:
            mref = max(mref, pos_after)
        bin_ = min(max(int((bin_lo <= pm).sum()) - 1, 0), nb - 1)
        mstep = _ecdf_invert_np(tables["mm"], bin_, um)
        if pm == 0 and mstep == 0:
            mstep = 1
        over2 = max(pos_after + mstep - mref, 0)
        lnew += over2
        mref = max(mref, pos_after + mstep)
        state = etype + 1 + (3 if mstep == 0 else 0)
        evs.append((e_pos2x, etype, elen))
        pm = mstep
        pos = pos_after + mstep
        t += 1
    return evs, mref, lnew


def hp_suppressed_np(ref_seg: bytes, events, k: int):
    """Which RAW events land in a >= k homopolymer run of the extracted
    reference (numpy twin of ops/homopolymer.suppress_hp_errors; reference
    semantics simulator.py:1920-1950).  Returns a bool list per event."""
    import re

    pattern = (
        "A{" + str(k) + ",}|C{" + str(k) + ",}|G{" + str(k) + ",}|T{" + str(k) + ",}"
    )
    runs = [(m.start(), m.end()) for m in re.finditer(pattern, ref_seg.decode())]
    out = []
    for pos2x, t, ln in events:
        if t == 1:
            err_start = (pos2x + 1) // 2 - 0.5
        else:
            err_start = pos2x // 2
        err_end = err_start + ln
        hit = any(not (he <= err_start or err_end <= hs) for hs, he in runs)
        out.append(hit)
    return out


def run_reference_fed(model_prefix: str, ref_fa: str, records, profile, genome,
                      seed: int, out_dir: str, n_reads: int, fastq: bool = False,
                      circular: bool = False):
    """Run the reference's genome pipeline fed with our stream; returns paths
    (reads_file, error_file)."""
    sim = import_reference_simulator()
    feed = build_feed(records, profile, genome, seed, circular=circular)

    import multiprocessing as mp

    saved = {k: getattr(sim, k, None) for k in
             ("random", "np", "mm", "get_length_kde", "get_lengths_and_ht_ratios",
              "model_base_quals")}
    try:
        # the reference's own profile loader populates its module globals
        sim.read_profile(ref_fa, [n_reads], model_prefix, False, "genome", None,
                         fastq=fastq)

        # quantize the transition intervals to OUR f32 cumulative bounds (the
        # contract quantization): widths in file order -> f64 cumsum -> f32,
        # rebuilt as contiguous half-open intervals with the last one open
        # (matching our min(count(cum <= u), 2))
        for state, d in sim.trans_error_pr.items():
            items = sorted(d.items())
            widths = [float(k[1]) - float(k[0]) for k, _ in items]
            bounds = np.cumsum(np.asarray(widths, np.float64)).astype(np.float32)
            newd = {}
            prev = 0.0
            for idx, ((k, v), b) in enumerate(zip(items, bounds)):
                hi = 2.0 if idx == len(items) - 1 else float(b)
                newd[(prev, hi)] = v
                prev = float(b)
            sim.trans_error_pr[state] = newd
        sim.strandness_rate = float(np.float32(sim.strandness_rate))

        lengths = np.asarray([float(r["m_ref"]) for r in records])
        remainders = np.asarray([float(r["head"] + r["tail"]) for r in records])
        ratios = np.asarray([
            (r["head"] / (r["head"] + r["tail"])) if (r["head"] + r["tail"]) else 0.5
            for r in records
        ])

        sim.random = _RandomProxy(feed)
        sim.np = _NpProxy(feed)
        sim.mm = _MixProxy(feed)
        if fastq:
            sim.model_base_quals = _QualsProxy(feed)
        sim.get_length_kde = lambda kde, num, log=False, flatten=True: lengths
        sim.get_lengths_and_ht_ratios = lambda n: (list(remainders), list(ratios))
        sim.total_simulated = mp.Value("i", 0)

        out_reads = os.path.join(
            out_dir, "ref_out_aligned_reads." + ("fastq" if fastq else "fasta"))
        out_error = os.path.join(out_dir, "ref_out_error_profile")
        sim.simulation_aligned_genome(
            "circular" if circular else "linear", 50, float("inf"), None, None,
            out_reads, out_error, None, fastq, len(records),
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for k, v in saved.items():
            setattr(sim, k, v)


# --- homopolymer (-hp -k) genome bit-identity --------------------------------


def build_hp_feed(records, profile, genome, seed: int, sim, k: int,
                  fastq: bool) -> _Feed:
    """Feed for simulation_aligned_genome with kmer_bias=k (and fastq).

    Beyond the plain-genome feed: error_list is fed the RAW (pre-suppression)
    events replayed host-side; mutate_read's qual pools are sized with the
    reference's suppression adjustments and valued by BACK-MAPPING our final
    qualities through mutate_homo's index arithmetic (retained positions show
    their pass-1 pool value in the reference output, so the pass-1 feed value
    is defined as our final quality at the mapped position); mutate_homo's
    normal pools / per-base p draws / mis choices / patch pools are fed from
    our realized run sizes (SITE_HOMOPOLYMER normals), SITE_HP_QUAL uniforms,
    and final read bytes.

    Each record: slot, head, tail, l_new (final), total, rev, chrom, pos,
    middle_ref, read (final bytes), quals (final, fastq) and prehp (pass-1
    mutated middle, pre-reverse).
    """
    import re as _re

    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import rng
    from nanosim_tpu.ops.tables import hp_resize_lookup
    from nanosim_tpu.sim.output import effective_lens_np, event_read_positions
    from nanosim_tpu.sim.reconstruct import (
        key_root, reconstruct_segment, uniform_at,
    )

    feed = _Feed()
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.asarray(np.array([r["slot"] for r in records], np.int64))
    sk = rng.slot_keys(base, slots)
    n = len(records)
    u_strand = np.asarray(rng.uniform_per_slot(sk, rng.SITE_STRAND))

    # walk inputs (m_ref) replayed from the slot stream, same as genome_batch
    from nanosim_tpu.sim.genome_mode import _kde_draw, draw_ht

    # KDE mode: the aligned-region KDE draws m_ref directly (genome_batch
    # only subtracts the remainder in median/sd mode)
    ref_len_f = np.asarray(_kde_draw(sk, rng.SITE_REF_LENGTH, sim.tables.kde_aligned, 1))[:, 0]
    m_ref_arr = np.clip(ref_len_f.astype(np.int64), 0, sim.l_cap)

    walk_tables = make_walk_tables_np(profile)
    raw_events = [
        replay_walk_np(walk_tables, seed, rng.STREAM_ALIGNED, int(r["slot"]),
                       int(m_ref_arr[i]))[0]
        for i, r in enumerate(records)
    ]
    max_e = max((len(e) for e in raw_events), default=0)
    wk = rng.site_keys(sk, rng.SITE_WALK)
    ts = jnp.arange(max_e + 1, dtype=jnp.int32)
    U = np.asarray(jax.vmap(
        lambda kk: jax.vmap(lambda t: jax.random.uniform(
            jax.random.fold_in(kk, t), (3,), dtype=jnp.float32))(ts)
    )(wk))

    pos_keys = rng.site_keys(sk, rng.SITE_POSITION)
    upos = np.asarray(jax.vmap(
        lambda kk: jax.vmap(lambda rr: jax.random.uniform(
            jax.random.fold_in(kk, rr), dtype=jnp.float64))(jnp.arange(8))
    )(pos_keys))
    glen = genome.total_len
    g_offsets = np.asarray(genome.offsets)
    g_lengths = np.asarray(genome.lengths)

    # our per-run resize table (device resize_homopolymers draws a uniform
    # per run and inverts the exact u-space breakpoint table)
    t_hp = sim.tables
    hp_breaks = np.asarray(t_hp.hp_breaks)
    hp_vals = np.asarray(t_hp.hp_vals)
    rate32 = np.float32(t_hp.hp_mis_rate)
    if fastq:
        q_breaks = np.asarray(t_hp.qual.breaks)
        q_vals = np.asarray(t_hp.qual.vals)

    pattern = ("A{" + str(k) + ",}|C{" + str(k) + ",}|G{" + str(k) + ",}|T{"
               + str(k) + ",}")

    for i, r in enumerate(records):
        slot = int(r["slot"])
        feed.push("random", u_strand[i])

        evs = raw_events[i]
        ne = len(evs)
        feed.push("random", U[i, 0, 0])
        for e, (p2x, t, ln) in enumerate(evs):
            feed.push("random", U[i, e + 1, 0])
            feed.push("mix", (t, ln))
            feed.push("random", U[i, e + 1, 2])

        # extraction
        m_ref_final = int(r["middle_ref"])
        for rr in range(8):
            gpos = min(int(upos[i, rr] * (glen + 1)), glen)
            c = int(np.searchsorted(g_offsets, gpos, side="right")) - 1
            c = min(max(c, 0), len(g_lengths) - 1)
            lp = gpos - int(g_offsets[c])
            fits = lp + m_ref_final <= int(g_lengths[c])
            feed.push("randint", gpos)
            if fits:
                if c != int(r["chrom"]) or lp != int(r["pos"]):
                    raise Desync(f"slot {slot}: position replay mismatch")
                break
        else:
            raise Desync(f"slot {slot}: no fitting position in 8 draws")

        # suppression (on the extracted reference slice) + effective lengths
        goff = int(g_offsets[int(r["chrom"])])
        ref_seg = genome.flat[goff + int(r["pos"]) : goff + int(r["pos"]) + m_ref_final].tobytes()
        supp = hp_suppressed_np(ref_seg, evs, k)
        ev_p = np.array([e[0] for e in evs], np.int64)[None, :]
        ev_t = np.array([e[1] for e in evs], np.int64)[None, :]
        ev_l = np.array([e[2] for e in evs], np.int64)[None, :]
        eff_raw = effective_lens_np(ev_p, ev_t, ev_l, np.ones((1, max(ne, 1)), bool))[0, :ne] if ne else np.zeros(0, np.int64)
        # surviving dict events: effective AND not suppressed
        surv_len = np.where(np.array(supp, bool), 0, eff_raw) if ne else eff_raw
        keys_s, rpos_s, _ = event_read_positions(
            ev_p, ev_t, surv_len[None, :] if ne else ev_l,
            np.ones((1, max(ne, 1)), bool), dedup_ins=False,
        ) if ne else (np.zeros((1, 1), np.int64),) * 3

        # --- pass-1 mid computed FORWARD from our counter stream -----------
        # reconstruct_segment is the genome -hp pass-1 materialization spec
        # (iupac lo @ ref idx, mis hi @ middle idx, ins lo @ middle idx);
        # the device's prehp buffer only CROSS-CHECKS it
        del_s = int(surv_len[(ev_t[0, :ne] == 2)].sum()) if ne else 0
        ins_s = int(surv_len[(ev_t[0, :ne] == 1)].sum()) if ne else 0
        pass1_lnew = m_ref_final - del_s + ins_s
        keys_seg = {
            "iupac": key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_IUPAC),
            "ins": key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_INS_BASE),
        }
        mid1_a, cls1 = reconstruct_segment(
            genome.flat, goff, int(r["pos"]),
            (ev_p[0, :ne], ev_t[0, :ne], surv_len), pass1_lnew, keys_seg,
        )
        mid1 = mid1_a.tobytes()
        if mid1 != bytes(r["prehp"][:pass1_lnew]):
            raise Desync(f"slot {slot}: forward pass-1 middle != device prehp")

        # --- mutate_homo replay: runs, table sizes, final layout -----------
        runs = [(m.start(), m.end(), m.group()[0]) for m in _re.finditer(pattern, mid1.decode())]
        k_hp = key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_HOMOPOLYMER)
        u_hp = uniform_at(k_hp, np.arange(max(len(runs), 1)))
        sizes = [
            min(hp_resize_lookup(hp_breaks, hp_vals, letter in "AT", e0 - s0,
                                 u_hp[ridx]), sim.l_cap // 2)
            for ridx, (s0, e0, letter) in enumerate(runs)
        ]

        final_lnew = int(r["l_new"])
        if pass1_lnew + sum(nsz - (e0 - s0) for (s0, e0, _), nsz in zip(runs, sizes)) != final_lnew:
            raise Desync(f"slot {slot}: resize length replay mismatch")

        pre = _prereverse(r["read"].tobytes(), bool(r["rev"]))
        head, total = int(r["head"]), int(r["total"])

        # final start of each run
        s_fin = []
        change = 0
        for (s0, e0, _), nsz in zip(runs, sizes):
            s_fin.append(s0 + change)
            change += nsz - (e0 - s0)

        # forward final-middle layout: kept prefixes copy pass-1 bases AND
        # classes (device gather map: del at s+n / ins before s+m with
        # left-source extension), extensions replicate the run base as
        # ins-class; then in-run mismatch overrides at rate32
        midf = bytearray(final_lnew)
        clsf = bytearray(final_lnew)
        run_ptr = 0
        p = 0
        q = 0
        while p < pass1_lnew:
            if run_ptr < len(runs) and p == runs[run_ptr][0]:
                s0, e0, letter = runs[run_ptr]
                nsz = sizes[run_ptr]
                m_run = e0 - s0
                kept = min(nsz, m_run)
                for j in range(nsz):
                    if j < kept:
                        midf[q + j] = mid1[s0 + j]
                        clsf[q + j] = cls1[s0 + j]
                    else:
                        midf[q + j] = ord(letter)
                        clsf[q + j] = 2
                q += nsz
                p = e0
                run_ptr += 1
            else:
                midf[q] = mid1[p]
                clsf[q] = cls1[p]
                q += 1
                p += 1

        qk = key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_HP_QUAL)
        mk = key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_HP_MIS_BASE)
        run_u = []
        run_mis = []  # per run: list of in-run mismatch offsets
        _CODEB = {65: 0, 67: 1, 71: 2, 84: 3}
        _BASEB = b"ACGT"
        for ridx, ((s0, e0, letter), nsz) in enumerate(zip(runs, sizes)):
            sfin = s_fin[ridx]
            u_p = uniform_at(qk, np.arange(sfin, sfin + nsz)) if nsz else np.zeros(0, np.float32)
            run_u.append(u_p)
            mis_pos = []
            for j in range(nsz):
                u_j = np.float32(u_p[j])
                if 0.0 < u_j <= rate32:
                    mis_pos.append(j)
                    u2 = np.float32(uniform_at(mk, np.asarray([sfin + j]))[0])
                    off = 1 + min(int(u2 * np.float32(3.0)), 2)
                    midf[sfin + j] = _BASEB[(_CODEB[midf[sfin + j]] + off) % 4]
                    clsf[sfin + j] = 1
            run_mis.append(mis_pos)
        if bytes(midf) != pre[head : head + final_lnew]:
            raise Desync(f"slot {slot}: forward final middle != device read")
        mid_final = bytes(midf)

        if fastq:
            # final qualities FORWARD: class + SITE_QUAL draw at the OUTPUT
            # position, inverted through the exact breakpoint table
            rev = bool(r["rev"])
            xs = np.arange(final_lnew, dtype=np.int64)
            out_pos = (total - 1 - (head + xs)) if rev else (head + xs)
            kqual = key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_QUAL)
            u_q = uniform_at(kqual, out_pos)
            midq_final = [
                int(q_vals[c, np.searchsorted(q_breaks[c], np.float32(u),
                                              side="right") - 1])
                for c, u in zip(clsf, u_q)
            ]
            preq = bytes(r["quals"][::-1]) if rev else bytes(r["quals"])
            if bytes(v + 33 for v in midq_final) != preq[head : head + final_lnew]:
                raise Desync(f"slot {slot}: forward middle quals != device quals")

            # back-map pass-1 pool values through the reference's resize
            # index arithmetic (shrink keeps the LAST n entries) — the
            # VALUES are forward-computed above, only the mapping is the
            # reference's
            pass1q = [1] * pass1_lnew
            run_ptr = 0
            p = 0
            while p < pass1_lnew:
                if run_ptr < len(runs) and p == runs[run_ptr][0]:
                    s0, e0, _ = runs[run_ptr]
                    nsz = sizes[run_ptr]
                    m_run = e0 - s0
                    diff = nsz - m_run
                    if diff < 0:
                        for pp in range(s0 - diff, e0):
                            pass1q[pp] = midq_final[s_fin[run_ptr] + (pp - s0 + diff)]
                    else:
                        for pp in range(s0, e0):
                            pass1q[pp] = midq_final[s_fin[run_ptr] + (pp - s0)]
                    p = e0
                    run_ptr += 1
                else:
                    cshift = sum(sizes[j] - (runs[j][1] - runs[j][0])
                                 for j in range(run_ptr))
                    pass1q[p] = midq_final[p + cshift]
                    p += 1

            # mutate_read pools with the reference's suppression adjustments
            _push_qual_pools_hp(feed, slot, evs, eff_raw, supp, surv_len,
                                keys_s[0], rpos_s[0], int(m_ref_arr[i]),
                                m_ref_final, pass1_lnew, pass1q)

        # mutate_read choices: surviving events, reverse order, pass-1 bases
        if ne:
            order = np.argsort(-ev_p[0, :ne], kind="stable")
            for e in order:
                t = int(ev_t[0, e])
                ln = int(surv_len[e])
                if t == 2 or ln == 0:
                    continue
                rp = int(rpos_s[0][e])
                for j in range(ln):
                    feed.push("choice", chr(mid1[rp + j]))

        # --- mutate_homo feeds ---------------------------------------------
        # normal pools: lengths in first-appearance order, letters A,T,C,G;
        # reference pops from the END, so arrays are reverse processing
        # order; feeding float(n) makes the reference's round(max(., 0))
        # reproduce our table size exactly
        groups = {}
        for (s0, e0, letter), nsz in zip(runs, sizes):
            groups.setdefault(e0 - s0, {}).setdefault(letter, []).append(nsz)
        for length in groups:
            for letter in "ATCG":
                if letter in groups[length]:
                    feed.push("normal", [float(x) for x in reversed(groups[length][letter])])

        for ridx, ((s0, e0, letter), nsz) in enumerate(zip(runs, sizes)):
            m_run = e0 - s0
            sfin = s_fin[ridx]
            u_p = run_u[ridx]
            mis_pos = run_mis[ridx]
            for j in range(nsz):
                feed.push("random", float(np.float32(u_p[j])))
                if j in mis_pos:
                    feed.push("choice", chr(mid_final[sfin + j]))
            if fastq:
                diff = nsz - m_run
                if diff > 0:
                    feed.push("quals", [midq_final[sfin + m_run + j] for j in range(diff)])
                if mis_pos:
                    feed.push("quals", [midq_final[sfin + mis_pos[0]]])

        # head/tail quals and bases FORWARD from the counter stream
        ht_n = total - head - final_lnew
        if fastq:
            ht_pos = np.concatenate([np.arange(head, dtype=np.int64),
                                     np.arange(head + final_lnew, total, dtype=np.int64)])
            out_ht = (total - 1 - ht_pos) if bool(r["rev"]) else ht_pos
            u_h = uniform_at(kqual, out_ht) if len(ht_pos) else np.zeros(0, np.float32)
            ht = [
                int(q_vals[3, np.searchsorted(q_breaks[3], np.float32(u),
                                              side="right") - 1])
                for u in u_h
            ]
            if bytes(v + 33 for v in ht) != preq[:head] + preq[head + final_lnew : total]:
                raise Desync(f"slot {slot}: forward ht quals != device quals")
            feed.push("quals", ht)
        kht = key_root(seed, rng.STREAM_ALIGNED, slot, rng.SITE_HEAD_TAIL)

        def _ht_bases(pool0, nl):
            if nl <= 0:
                return ""
            u = uniform_at(kht, np.clip(np.arange(pool0, pool0 + nl), 0,
                                        sim.ht_cap - 1))
            return "".join(
                "ATCG"[min(int(np.float32(x) * np.float32(4.0)), 3)] for x in u
            )

        hb = _ht_bases(0, head)
        tb = _ht_bases(head, ht_n)
        if hb.encode() != pre[:head] or tb.encode() != pre[head + final_lnew : total]:
            raise Desync(f"slot {slot}: forward head/tail bases != device read")
        feed.push("npchoice", hb)
        feed.push("npchoice", tb)
    return feed


def _push_qual_pools_hp(feed, slot, evs, eff_raw, supp, surv_len, keys_s,
                        rpos_s, m_ref_init, middle_f, pass1_lnew, pass1q):
    """mutate_read qual pools under -hp: totals carry the reference's
    suppression adjustments (simulator.py:1936-1943); pops run over the
    SURVIVING events with pass-1 values."""
    ne = len(evs)
    typ = np.array([e[1] for e in evs], np.int64)
    raw = np.array([e[2] for e in evs], np.int64)
    mis_raw = int(raw[typ == 0].sum())
    ins_raw = int(raw[typ == 1].sum())
    del_raw = int(raw[typ == 2].sum())
    if ne:
        p0, t0, _ = evs[0]
        first = p0 // 2 if t0 != 1 else (p0 + 1) // 2
    else:
        first = middle_f
    match_total = min(first, m_ref_init) + (middle_f - first - mis_raw - del_raw)

    # suppression adjustments apply to DICT (effective) events only
    supp_eff = [(bool(supp[e]) and int(eff_raw[e]) > 0) for e in range(ne)]
    mis_total = mis_raw - sum(int(eff_raw[e]) for e in range(ne) if supp_eff[e] and typ[e] == 0)
    ins_total = ins_raw - sum(int(eff_raw[e]) for e in range(ne) if supp_eff[e] and typ[e] == 1)
    match_total += sum(int(eff_raw[e]) for e in range(ne) if supp_eff[e] and typ[e] != 1)

    pops = {"mis": [], "ins": [], "match": []}
    s = 0

    def pop(pool):
        nonlocal s
        pops[pool].append(pass1q[pass1_lnew - 1 - s])
        s += 1

    prev = middle_f
    if ne:
        ev_p = np.array([e[0] for e in evs], np.int64)
        order = np.argsort(-ev_p, kind="stable")
        for e in order:
            t = int(typ[e])
            ln = int(surv_len[e])
            key = int(keys_s[e])
            err_end = key + ln if t != 1 else key
            err_quals_n = ln if t in (0, 1) else 0
            for _ in range(max(prev - err_end, 0)):
                pop("match")
            for _ in range(err_quals_n):
                pop("mis" if t == 0 else "ins")
            prev = key
    while s < pass1_lnew and len(pops["match"]) < match_total:
        pop("match")
    if s != pass1_lnew:
        raise Desync(f"slot {slot}: hp qual pop simulation used {s} of {pass1_lnew}")

    def pool_list(name, total):
        vals = pops[name]
        if len(vals) > total:
            raise Desync(f"slot {slot}: {name} pool popped {len(vals)} > {total}")
        return [1] * (total - len(vals)) + vals[::-1]

    feed.push("quals", pool_list("mis", mis_total))
    feed.push("quals", pool_list("ins", ins_total))
    feed.push("quals", pool_list("match", match_total))


def run_reference_fed_hp(model_prefix: str, ref_fa: str, records, profile,
                         genome, seed: int, out_dir: str, n_reads: int,
                         sim, k: int, fastq: bool = True):
    """Run the reference's genome pipeline with kmer_bias=k fed with our
    stream; returns (reads_file, error_file)."""
    ref_sim = import_reference_simulator()
    feed = build_hp_feed(records, profile, genome, seed, sim, k, fastq)

    import multiprocessing as mp

    saved = {kk: getattr(ref_sim, kk, None) for kk in
             ("random", "np", "mm", "get_length_kde", "get_lengths_and_ht_ratios",
              "model_base_quals", "hp_mis_rate")}
    try:
        ref_sim.read_profile(ref_fa, [n_reads], model_prefix, False, "genome", None,
                             fastq=fastq, homopolymer=True)
        for state, d in ref_sim.trans_error_pr.items():
            items = sorted(d.items())
            widths = [float(kk[1]) - float(kk[0]) for kk, _ in items]
            bounds = np.cumsum(np.asarray(widths, np.float64)).astype(np.float32)
            newd = {}
            prev = 0.0
            for idx, ((kk, v), b) in enumerate(zip(items, bounds)):
                hi = 2.0 if idx == len(items) - 1 else float(b)
                newd[(prev, hi)] = v
                prev = float(b)
            ref_sim.trans_error_pr[state] = newd
        ref_sim.strandness_rate = float(np.float32(ref_sim.strandness_rate))
        # our in-run mismatch compare runs in f32; quantize the reference's
        # threshold the same way so boundary draws classify identically
        ref_sim.hp_mis_rate = float(np.float32(ref_sim.hp_mis_rate))

        lengths = np.asarray([float(m) for m in _hp_m_refs(records, profile, sim, seed)])
        remainders = np.asarray([float(r["head"] + r["tail"]) for r in records])
        ratios = np.asarray([
            (r["head"] / (r["head"] + r["tail"])) if (r["head"] + r["tail"]) else 0.5
            for r in records
        ])

        class _NpHpProxy(_NpProxy):
            def __init__(self, feed):
                super().__init__(feed)

                class _R(_NpRandomProxy):
                    def normal(self, mu, sigma, size=None):
                        v = self._feed.pop("normal")
                        if size is not None and len(v) != size:
                            raise Desync(f"normal size {size} fed {len(v)}")
                        return np.asarray(v, np.float64)

                self.random = _R(feed)

        ref_sim.random = _RandomProxy(feed)
        ref_sim.np = _NpHpProxy(feed)
        ref_sim.mm = _MixProxy(feed)
        if fastq:
            ref_sim.model_base_quals = _QualsProxy(feed)
        ref_sim.get_length_kde = lambda kde, num, log=False, flatten=True: lengths
        ref_sim.get_lengths_and_ht_ratios = lambda nn: (list(remainders), list(ratios))
        ref_sim.total_simulated = mp.Value("i", 0)

        out_reads = os.path.join(
            out_dir, "ref_hp_aligned_reads." + ("fastq" if fastq else "fasta"))
        out_error = os.path.join(out_dir, "ref_hp_error_profile")
        ref_sim.simulation_aligned_genome(
            "linear", 50, float("inf"), None, None, out_reads, out_error,
            k, fastq, len(records),
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for kk, v in saved.items():
            setattr(ref_sim, kk, v)


def _hp_m_refs(records, profile, sim, seed):
    import jax.numpy as jnp

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.genome_mode import _kde_draw, draw_ht

    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.asarray(np.array([r["slot"] for r in records], np.int64))
    sk = rng.slot_keys(base, slots)
    ref_len_f = np.asarray(_kde_draw(sk, rng.SITE_REF_LENGTH, sim.tables.kde_aligned, 1))[:, 0]
    return np.clip(ref_len_f.astype(np.int64), 0, sim.l_cap)


# --- chimeric genome bit-identity ------------------------------------------


def _walk_uniform(slot_key_arr, part_base, part_idx, site, t, idx):
    raise NotImplementedError  # documentation stub; feeds are built in bulk


def build_chimeric_feed(records, profile, genome, seed: int) -> _Feed:
    """Feed for simulation_aligned_genome(chimeric=True) (simulator.py:
    1266-1454, 1552-1568): per accepted read — strand, per-gap unaligned
    walk + extraction + mutation draws, per-segment error walks, per-segment
    extraction randints, per-segment mutation choices, head/tail strings.

    Each record: slot, n_seg, head, tail, total, rev, read (final bytes),
    segs: [{m_ref, middle_ref, l_new, off, chrom, pos,
            ev_pos2x/ev_type/ev_len}],
    gaps: [{gap_ref, l_new, off, chrom, pos, n_steps,
            st_pos2x/st_type/st_len}]  (per-STEP, matches len 0).
    """
    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import rng

    feed = _Feed()
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.asarray(np.array([r["slot"] for r in records], np.int64))
    sk = rng.slot_keys(base, slots)
    n = len(records)
    u_strand = np.asarray(rng.uniform_per_slot(sk, rng.SITE_STRAND))

    S = max((r["n_seg"] for r in records), default=1)
    G = max(S - 1, 1)
    max_ev = max((len(s["ev_pos2x"]) for r in records for s in r["segs"]), default=0)
    max_gst = max((int(g["n_steps"]) for r in records for g in r["gaps"]), default=0)

    # bulk uniforms: segment walks [n, S, max_ev+1, 3], gap walks [n, G, max_gst, 2]
    def part_keys(base_const, idx):
        return jax.vmap(lambda k: jax.random.fold_in(k, base_const + idx))(sk)

    ts_seg = jnp.arange(max_ev + 1, dtype=jnp.int32)
    U_seg = np.zeros((n, S, max_ev + 1, 3), np.float32)
    UP_seg = np.zeros((n, S, 8), np.float64)
    for s in range(S):
        pk = part_keys(rng.PART_SEGMENT_BASE, s)
        wk = rng.site_keys(pk, rng.SITE_WALK)
        U_seg[:, s] = np.asarray(jax.vmap(
            lambda k: jax.vmap(lambda t: jax.random.uniform(
                jax.random.fold_in(k, t), (3,), dtype=jnp.float32))(ts_seg)
        )(wk))
        posk = rng.site_keys(pk, rng.SITE_POSITION)
        UP_seg[:, s] = np.asarray(jax.vmap(
            lambda k: jax.vmap(lambda r: jax.random.uniform(
                jax.random.fold_in(k, r), dtype=jnp.float64))(jnp.arange(8))
        )(posk))
    ts_gap = jnp.arange(max(max_gst, 1), dtype=jnp.int32)
    U_gap = np.zeros((n, G, max(max_gst, 1), 2), np.float32)
    UP_gap = np.zeros((n, G, 8), np.float64)
    for g in range(G):
        pk = part_keys(rng.PART_GAP_BASE, g)
        wk = rng.site_keys(pk, rng.SITE_UNALIGNED_WALK)
        U_gap[:, g] = np.asarray(jax.vmap(
            lambda k: jax.vmap(lambda t: jax.random.uniform(
                jax.random.fold_in(k, t), (2,), dtype=jnp.float32))(ts_gap)
        )(wk))
        posk = rng.site_keys(pk, rng.SITE_POSITION)
        UP_gap[:, g] = np.asarray(jax.vmap(
            lambda k: jax.vmap(lambda r: jax.random.uniform(
                jax.random.fold_in(k, r), dtype=jnp.float64))(jnp.arange(8))
        )(posk))

    glen = genome.total_len
    g_offsets = np.asarray(genome.offsets)
    g_lengths = np.asarray(genome.lengths)

    def feed_position(upos_row, middle_ref, want_chrom, want_pos, tag):
        for rr in range(8):
            gpos = min(int(upos_row[rr] * (glen + 1)), glen)
            c = int(np.searchsorted(g_offsets, gpos, side="right")) - 1
            c = min(max(c, 0), len(g_lengths) - 1)
            lp = gpos - int(g_offsets[c])
            fits = lp + middle_ref <= int(g_lengths[c])
            feed.push("randint", gpos)
            if fits:
                if c != want_chrom or lp != want_pos:
                    raise Desync(f"{tag}: position replay ({c},{lp}) != ({want_chrom},{want_pos})")
                return
        raise Desync(f"{tag}: no fitting position in 8 draws")

    def feed_mutation(events, mid_bytes):
        """Reference mutate_read choice feed: reverse key order; events =
        [(key2x, type, eff_len, rpos)] ascending."""
        for key2x, t, ln, rp in sorted(events, key=lambda e: -e[0]):
            if t == 2 or ln == 0:
                continue
            for j in range(ln):
                feed.push("choice", chr(mid_bytes[rp + j]))

    def feed_gap_mutation(merged, gap_ref, gap_bytes, ins_key):
        """Unaligned-walk mutation choices via a tag simulation of the
        reference's reverse-order splicing: the + 0.1 insertion keys mean a
        same-pos mis/del swallows the just-inserted bases, so values are
        resolved by tracking each drawn base to its FINAL position (or to
        the device's ins draw when overwritten, or 'A' when deleted)."""
        from nanosim_tpu.sim.reconstruct import uniform2_at

        tags = [("ref", i) for i in range(gap_ref)]
        draws = []  # (kind, tag) in reference draw order
        for key2x, t, ln in sorted(merged, key=lambda e: -e[0]):
            key = (key2x + 1) // 2
            if t == 1:  # ins: draw ln bases, insert at key
                new = [["ins", None] for _ in range(ln)]
                for tg in new:
                    draws.append(("ins", tg))
                tags[key:key] = new
            elif t == 0:  # mis: draw ln bases replacing tags[key:key+ln]
                replaced = tags[key : key + ln]
                new = [["mis", None, r] for r in replaced]
                for tg in new:
                    draws.append(("mis", tg))
                tags[key : key + ln] = new
            else:  # del: remove tags[key:key+ln]
                del tags[key : key + ln]
        if len(tags) != len(gap_bytes):
            raise Desync(
                f"gap tag sim length {len(tags)} != emitted {len(gap_bytes)}")
        pos_of = {id(tg): i for i, tg in enumerate(tags)}
        bases = "ACGT"
        for kind, tg in draws:
            i = pos_of.get(id(tg))
            if kind == "mis":
                feed.push("choice", chr(gap_bytes[i]))
            elif i is not None:  # surviving insertion
                feed.push("choice", chr(gap_bytes[i]))
            else:
                # overwritten (under a mis) or deleted insertion: the device's
                # ins draw at the OVERWRITING tag's read position, or free
                host = None
                for t2 in tags:
                    if len(t2) == 3 and t2[2] is tg:
                        host = t2
                        break
                if host is None:
                    feed.push("choice", "A")  # deleted: unobservable
                else:
                    # device ins draw = LO half of SITE_INS_BASE at the
                    # overwriting tag's read position (chimeric_mode gu_ins)
                    j = pos_of[id(host)]
                    lo, _ = uniform2_at(ins_key, np.asarray([j]))
                    code = min(int(np.float32(lo[0]) * np.float32(4.0)), 3)
                    feed.push("choice", "ACGT"[code])

    for i, r in enumerate(records):
        pre = _prereverse(r["read"].tobytes(), bool(r["rev"]))
        feed.push("random", u_strand[i])

        # --- gaps (simulation_gap per gap, before the segment walks) ---
        for g_idx, g in enumerate(r["gaps"]):
            gap_ref = int(g["gap_ref"])
            if gap_ref == 0:
                continue
            n_steps = int(g["n_steps"])
            # walk: per step u_type; error steps consume a mixture draw
            merged = []  # (key2x, type, len) with consecutive-ins merge
            pos = 0
            middle = gap_ref
            for t in range(n_steps):
                feed.push("random", U_gap[i, g_idx, t, 0])
                st_t = int(g["st_type"][t])
                st_l = int(g["st_len"][t])
                if st_l == 0:  # match step
                    pos += 1
                    if pos > middle:
                        middle = pos
                    continue
                feed.push("mix", (st_t, st_l))
                if st_t == 1:  # ins: merge into previous if consecutive
                    if merged and merged[-1][1] == 1 and merged[-1][0] == 2 * pos + 1:
                        merged[-1] = (merged[-1][0], 1, merged[-1][2] + st_l)
                    else:
                        merged.append((2 * pos + 1, 1, st_l))
                else:
                    merged.append((2 * pos, st_t, st_l))
                    pos += st_l
                    if pos > middle:
                        middle = pos
            # extraction at the walk's final middle_ref
            feed_position(UP_gap[i, g_idx], middle, int(g["chrom"]), int(g["pos"]),
                          f"slot {r['slot']} gap {g_idx}")
            # mutation choices via the overlap-aware tag simulation
            from nanosim_tpu.sim import reconstruct as _rc

            ins_key = _rc.fold_in(
                _rc.key_root(seed, rng.STREAM_ALIGNED, int(r["slot"]),
                             rng.PART_GAP_BASE + g_idx),
                rng.SITE_INS_BASE,
            )
            gap_bytes = pre[int(g["off"]): int(g["off"]) + int(g["l_new"])]
            feed_gap_mutation(merged, middle, gap_bytes, ins_key)

        # --- segment walks (error_list per segment) ---
        for s_idx, s in enumerate(r["segs"]):
            ne = len(s["ev_pos2x"])
            feed.push("random", U_seg[i, s_idx, 0, 0])  # first match
            for e in range(ne):
                feed.push("random", U_seg[i, s_idx, e + 1, 0])
                feed.push("mix", (int(s["ev_type"][e]), int(s["ev_len"][e])))
                feed.push("random", U_seg[i, s_idx, e + 1, 2])

        # --- total-length filter passes; per-segment extraction ---
        for s_idx, s in enumerate(r["segs"]):
            feed_position(UP_seg[i, s_idx], int(s["middle_ref"]), int(s["chrom"]),
                          int(s["pos"]), f"slot {r['slot']} seg {s_idx}")

        # --- per-segment mutation ---
        from nanosim_tpu.sim.output import event_read_positions

        for s_idx, s in enumerate(r["segs"]):
            ne = len(s["ev_pos2x"])
            if ne == 0:
                continue
            keys, rpos, eff = event_read_positions(
                np.asarray(s["ev_pos2x"])[None, :], np.asarray(s["ev_type"])[None, :],
                np.asarray(s["ev_len"])[None, :], np.ones((1, ne), bool),
            )
            mid = pre[int(s["off"]): int(s["off"]) + int(s["l_new"])]
            ev = [(int(s["ev_pos2x"][e]), int(s["ev_type"][e]), int(eff[0, e]),
                   int(rpos[0, e])) for e in range(ne)]
            feed_mutation(ev, mid)

        # --- head/tail strings ---
        head, tail = int(r["head"]), int(r["tail"])
        feed.push("npchoice", pre[:head].decode())
        feed.push("npchoice", pre[int(r["total"]) - tail: int(r["total"])].decode())
    return feed


def run_reference_fed_chimeric(model_prefix: str, ref_fa: str, records, profile,
                               genome, seed: int, out_dir: str, n_reads: int):
    """Run the reference's chimeric genome pipeline fed with our stream."""
    sim = import_reference_simulator()
    feed = build_chimeric_feed(records, profile, genome, seed)

    import multiprocessing as mp

    saved = {k: getattr(sim, k, None) for k in
             ("random", "np", "mm", "get_length_kde", "get_lengths_and_ht_ratios")}
    try:
        sim.read_profile(ref_fa, [n_reads], model_prefix, False, "genome", None,
                         fastq=False, chimeric=True)
        for state, d in sim.trans_error_pr.items():
            items = sorted(d.items())
            widths = [float(k[1]) - float(k[0]) for k, _ in items]
            bounds = np.cumsum(np.asarray(widths, np.float64)).astype(np.float32)
            newd = {}
            prev = 0.0
            for idx, ((k, v), b) in enumerate(zip(items, bounds)):
                hi = 2.0 if idx == len(items) - 1 else float(b)
                newd[(prev, hi)] = v
                prev = float(b)
            sim.trans_error_pr[state] = newd
        sim.strandness_rate = float(np.float32(sim.strandness_rate))

        n_seg_arr = np.asarray([int(r["n_seg"]) for r in records])
        seg_lengths = np.asarray(
            [float(s["m_ref"]) for r in records for s in r["segs"]])
        gap_lengths = np.asarray(
            [float(g["gap_ref"]) for r in records for g in r["gaps"]])
        remainders = np.asarray([float(r["head"] + r["tail"]) for r in records])
        ratios = np.asarray([
            (r["head"] / (r["head"] + r["tail"])) if (r["head"] + r["tail"]) else 0.5
            for r in records
        ])

        class _NpChimProxy(_NpProxy):
            def __init__(self, feed):
                super().__init__(feed)
                rnd = self.random

                class _R(_NpRandomProxy):
                    def geometric(self, p, size=None):
                        if abs(p - 1.0 / sim.segment_mean) > 1e-9:
                            raise Desync(f"geometric p={p}")
                        if size != len(n_seg_arr):
                            raise Desync(f"geometric size={size}")
                        return n_seg_arr.copy()

                self.random = _R(feed)

        sim.random = _RandomProxy(feed)
        sim.np = _NpChimProxy(feed)
        sim.mm = _MixProxy(feed)
        sim.get_length_kde = (
            lambda kde, num, log=False, flatten=True:
            gap_lengths if log else seg_lengths
        )
        sim.get_lengths_and_ht_ratios = lambda n: (list(remainders), list(ratios))
        sim.total_simulated = mp.Value("i", 0)

        out_reads = os.path.join(out_dir, "ref_chi_aligned_reads.fasta")
        out_error = os.path.join(out_dir, "ref_chi_error_profile")
        sim.simulation_aligned_genome(
            "linear", 50, float("inf"), None, None, out_reads, out_error,
            None, False, len(records), chimeric=True,
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for k, v in saved.items():
            setattr(sim, k, v)


# --- transcriptome (non-IR) bit-identity -----------------------------------


def build_trx_feed(records, profile, transcriptome, seed: int,
                   sim=None, model_ir: bool = False) -> _Feed:
    """Feed for simulation_aligned_transcriptome (simulator.py:1043-1263):
    per accepted read — transcript choice, 2D-KDE aligned length
    (select_nearest_kde2d patched), strand, error walk, [model_ir: per-intron
    retention draws + the IR-aware start randint], extraction randint, polyA
    length, mutation choices, head/tail strings.

    Each record: slot, trx_name, trx_len, m_ref (2D-KDE aligned draw),
    middle_ref, l_new, pos, head, tail, polya_len, total, rev, read (final
    bytes, uracil already reverted), n_events, ev_pos2x/ev_type/ev_len
    (+ has_ir under model_ir).
    """
    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.output import event_read_positions

    feed = _Feed()
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    slots = jnp.asarray(np.array([r["slot"] for r in records], np.int64))
    sk = rng.slot_keys(base, slots)
    n = len(records)
    u_strand = np.asarray(rng.uniform_per_slot(sk, rng.SITE_STRAND))
    wk = rng.site_keys(sk, rng.SITE_WALK)
    max_e = max((int(r["n_events"]) for r in records), default=0)
    ts = jnp.arange(max_e + 1, dtype=jnp.int32)
    U = np.asarray(jax.vmap(
        lambda k: jax.vmap(lambda t: jax.random.uniform(
            jax.random.fold_in(k, t), (3,), dtype=jnp.float32))(ts)
    )(wk))

    if model_ir:
        # IR walk draws: per-feature f32 uniform at counter f of SITE_IR,
        # one f64 uniform at counter F+1 for the start position (sim/ir.py)
        irt = sim.ir_tables
        F = irt.f_max
        feat_off = np.asarray(irt.feat_offset)
        is_int = np.asarray(irt.is_intron)
        f_len = np.asarray(irt.length)
        n_feats = np.asarray(irt.n_feats)
        ir_cum = np.asarray(irt.ir_cum)  # [3] f32, P(no_IR | state)
        trx_idx = {nm: ti for ti, nm in enumerate(transcriptome.names)}
        irk = rng.site_keys(sk, rng.SITE_IR)
        U_ir = np.asarray(jax.vmap(
            lambda k: jax.vmap(lambda f: jax.random.uniform(
                jax.random.fold_in(k, f), dtype=jnp.float32))(jnp.arange(F))
        )(irk))
        U_irpos = np.asarray(jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, F + 1),
                                         dtype=jnp.float64)
        )(irk))

    for i, r in enumerate(records):
        feed.push("trxchoice", (r["trx_name"], int(r["trx_len"])))
        feed.push("aligned2d", int(r["m_ref"]))
        feed.push("random", u_strand[i])

        ne = int(r["n_events"])
        feed.push("random", U[i, 0, 0])
        for e in range(ne):
            feed.push("random", U[i, e + 1, 0])
            feed.push("mix", (int(r["ev_type"][e]), int(r["ev_len"][e])))
            feed.push("random", U[i, e + 1, 2])

        if model_ir:
            # replay the retention chain (update_structure, simulator.py:
            # 114-145): states 0=start 1=no_IR 2=IR, IR iff u >= cum[state]
            ti = trx_idx[r["trx_name"]]
            b0, nf = int(feat_off[ti]), int(n_feats[ti])
            state = 0
            retained = []
            for f in range(nf):
                if not is_int[b0 + f]:
                    continue
                u = np.float32(U_ir[i, f])
                feed.push("random", float(u))
                goes = bool(u >= ir_cum[state])
                retained.append((f, goes))
                state = 2 if goes else 1
            ir_flag = any(g for _, g in retained)
            if bool(r["has_ir"]) != ir_flag:
                raise Desync(f"slot {r['slot']}: IR flag replay mismatch")
            if ir_flag:
                # exonic length before the first retained intron; start
                # randint bounded by it (extract_read_pos, simulator.py:162)
                first_ret = next(f for f, g in retained if g)
                len_before = sum(
                    int(f_len[b0 + f]) for f in range(first_ret)
                    if not is_int[b0 + f]
                )
                hi = max(min(int(r["trx_len"]) - int(r["middle_ref"]), len_before), 0)
                start = min(int(U_irpos[i] * (hi + 1)), hi)
                feed.push("randint", start)
            else:
                feed.push("randint", int(r["pos"]))
        else:
            feed.push("randint", int(r["pos"]))

        if int(r["polya_len"]) > 0 or r.get("retain_polya"):
            feed.push("polya", float(r["polya_len"]))

        pre = _prereverse(r["read"].tobytes(), bool(r["rev"]))
        head, l_new = int(r["head"]), int(r["l_new"])
        mid = pre[head : head + l_new]
        if ne:
            keys, rpos, eff = event_read_positions(
                np.asarray(r["ev_pos2x"])[None, :], np.asarray(r["ev_type"])[None, :],
                np.asarray(r["ev_len"])[None, :], np.ones((1, ne), bool),
            )
            order = np.argsort(-(np.asarray(r["ev_pos2x"]).astype(np.int64)), kind="stable")
            for e in order:
                t = int(r["ev_type"][e])
                ln = int(eff[0, e])
                rp = int(rpos[0, e])
                if t == 2:
                    continue
                for j in range(ln):
                    feed.push("choice", chr(mid[rp + j]))

        total = int(r["total"])
        tail = int(r["tail"])
        feed.push("npchoice", pre[:head].decode())
        feed.push("npchoice", pre[total - tail : total].decode())
    return feed


class _ScipyProxy:
    """sim.scipy stand-in: expon.rvs feeds the polyA length."""

    def __init__(self, feed):
        class _Expon:
            def rvs(_self, loc=0.0, scale=1.0):
                return float(feed.pop("polya"))

        class _Stats:
            expon = _Expon()

        self.stats = _Stats()


def run_reference_fed_transcriptome(model_prefix: str, ref_t: str, exp_path: str,
                                    polya_path, records, profile, transcriptome,
                                    seed: int, out_dir: str, n_reads: int,
                                    basecaller: str = "guppy",
                                    uracil: bool = False,
                                    model_ir: bool = False,
                                    ref_g: str = "", our_sim=None):
    """Run the reference's transcriptome pipeline fed with our stream;
    returns (reads_file, error_file).  model_ir=True additionally feeds the
    intron-retention walk and IR-aware extraction (needs ref_g and our_sim)."""
    sim = import_reference_simulator()
    feed = build_trx_feed(records, profile, transcriptome, seed,
                          sim=our_sim, model_ir=model_ir)

    import multiprocessing as mp

    saved = {k: getattr(sim, k, None) for k in
             ("random", "np", "mm", "get_length_kde", "select_nearest_kde2d",
              "scipy")}
    try:
        sim.read_profile(ref_g, [n_reads], model_prefix, False, "transcriptome",
                         None, ref_t=ref_t, polya=polya_path, exp=exp_path,
                         model_ir=model_ir, fastq=False)
        if model_ir:
            # quantize the IR transition boundaries to our f32 cumulative
            # P(no_IR | state) so boundary draws classify identically
            cum = np.asarray(our_sim.ir_tables.ir_cum)
            state_idx = {"start": 0, "no_IR": 1, "IR": 2}
            for st in list(sim.IR_markov_model.keys()):
                c = float(cum[state_idx[st]])
                sim.IR_markov_model[st] = {(0.0, c): "no_IR", (c, 2.0): "IR"}
        for state, d in sim.trans_error_pr.items():
            items = sorted(d.items())
            widths = [float(k[1]) - float(k[0]) for k, _ in items]
            bounds = np.cumsum(np.asarray(widths, np.float64)).astype(np.float32)
            newd = {}
            prev = 0.0
            for idx, ((k, v), b) in enumerate(zip(items, bounds)):
                hi = 2.0 if idx == len(items) - 1 else float(b)
                newd[(prev, hi)] = v
                prev = float(b)
            sim.trans_error_pr[state] = newd
        sim.strandness_rate = float(np.float32(sim.strandness_rate))

        remainders = np.asarray([float(r["head"] + r["tail"]) for r in records])
        ratios = np.asarray([
            (r["head"] / (r["head"] + r["tail"])) if (r["head"] + r["tail"]) else 0.5
            for r in records
        ])

        class _RandomTrxProxy(_RandomProxy):
            def choices(self, population, weights=None, k=1):
                v = self._feed.pop("trxchoice")
                if v not in population:
                    raise Desync(f"transcript {v!r} not in ECDF population")
                return [v]

        def fake_get_length_kde(kde, num, log=False, flatten=True):
            if kde is sim.kde_ht:
                return remainders
            if kde is sim.kde_ht_ratio:
                return ratios
            return np.zeros((max(num, 1), 2))  # 2D pool (values unused)

        sim.random = _RandomTrxProxy(feed)
        sim.np = _NpProxy(feed)
        sim.mm = _MixProxy(feed)
        sim.scipy = _ScipyProxy(feed)
        sim.get_length_kde = fake_get_length_kde
        sim.select_nearest_kde2d = lambda sampled, ref_len: int(feed.pop("aligned2d"))
        sim.total_simulated = mp.Value("i", 0)

        out_reads = os.path.join(out_dir, "ref_trx_aligned_reads.fasta")
        out_error = os.path.join(out_dir, "ref_trx_error_profile")
        sim.simulation_aligned_transcriptome(
            model_ir, out_reads, out_error, None, basecaller, len(records),
            True if polya_path else False, False, per=False, uracil=uracil,
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for k, v in saved.items():
            setattr(sim, k, v)
