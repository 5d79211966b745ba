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


def build_feed(records, profile, genome, seed: int) -> _Feed:
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

        # extraction: global positions until one fits the accepted chromosome
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


def run_reference_fed(model_prefix: str, ref_fa: str, records, profile, genome,
                      seed: int, out_dir: str, n_reads: int, fastq: bool = False):
    """Run the reference's genome pipeline fed with our stream; returns paths
    (reads_file, error_file)."""
    sim = import_reference_simulator()
    feed = build_feed(records, profile, genome, seed)

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
            "linear", 50, float("inf"), None, None, out_reads, out_error,
            None, fastq, len(records),
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for k, v in saved.items():
            setattr(sim, k, v)


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


def build_trx_feed(records, profile, transcriptome, seed: int) -> _Feed:
    """Feed for simulation_aligned_transcriptome(model_ir=False)
    (simulator.py:1043-1263): per accepted read — transcript choice, 2D-KDE
    aligned length (select_nearest_kde2d patched), strand, error walk,
    extraction randint, polyA length, mutation choices, head/tail strings.

    Each record: slot, trx_name, trx_len, m_ref (2D-KDE aligned draw),
    middle_ref, l_new, pos, head, tail, polya_len, total, rev, read (final
    bytes, uracil already reverted), n_events, ev_pos2x/ev_type/ev_len.
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
                                    uracil: bool = False):
    """Run the reference's transcriptome pipeline (model_ir=False) fed with
    our stream; returns (reads_file, error_file)."""
    sim = import_reference_simulator()
    feed = build_trx_feed(records, profile, transcriptome, seed)

    import multiprocessing as mp

    saved = {k: getattr(sim, k, None) for k in
             ("random", "np", "mm", "get_length_kde", "select_nearest_kde2d",
              "scipy")}
    try:
        sim.read_profile("", [n_reads], model_prefix, False, "transcriptome",
                         None, ref_t=ref_t, polya=polya_path, exp=exp_path,
                         model_ir=False, fastq=False)
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
            False, out_reads, out_error, None, basecaller, len(records),
            True if polya_path else False, False, per=False, uracil=uracil,
        )
        if feed.pos != len(feed.q):
            raise Desync(f"feed not fully consumed: {feed.pos}/{len(feed.q)}")
        return out_reads, out_error
    finally:
        for k, v in saved.items():
            setattr(sim, k, v)
