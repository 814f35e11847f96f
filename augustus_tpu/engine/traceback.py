"""Device-side Viterbi traceback.

The host traceback walk (ScanEngine/PallasEngine.traceback) needs the whole
(n_pad, 128) backpointer plane on the host — a ~0.5 GB/Mb device->host
transfer that dwarfs the DP itself on tunneled-TPU setups (~22 MB/s).  This
module walks the path ON DEVICE with a backwards `lax.scan` that streams
the backpointer rows, emitting one packed int32 per base:

    bits 0..7   state id at this base
    bit  30     set if a raw segment ENDS here (a backpointer read happened)

Only the (n,) packed array leaves the device (4 bytes/base).  The host then
reconstructs the exact raw segment list (same (begin, end, state) triples,
in the same order, as the host walk) or — the fast path — builds condensed
`PathState` runs directly with numpy, skipping the per-base Python loop of
output.genes.condense_path.

Semantics mirror the host walks exactly (reference NAMGene::getViterbiPath,
src/namgene.cc:432: per-state doBacktracking pops one segment per
backpointer read; chain states store off=1 per base).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

FLAG_BIT = 30


@lru_cache(maxsize=64)
def make_trace_fn(n: int, row_off: int):
    """Jitted fn(bps, state0) -> (n-1,) int32 packed emits for j=1..n-1.

    bps: (n_pad, 128) int32 backpointer plane.  Row for walk position
    `base` is bps[base + row_off] (row_off=0 for the Pallas kernel layout,
    -1 for the scan engine's bps[base-1]).
    packed bp format (both engines): pred = bp >> 20, off = bp & 0xFFFFF,
    segment = [base-off+1, base], next (base, state) = (base-off, pred).
    """

    def fn(bps, state0):
        rows = bps[1 + row_off: n - 1 + row_off + 1]      # base = 1 .. n-1
        rows = jnp.flip(rows, axis=0)                      # base = n-1 .. 1
        jidx = jnp.arange(n - 1, 0, -1, dtype=jnp.int32)
        lane_iota = jnp.arange(rows.shape[1], dtype=jnp.int32)

        def step(carry, xs):
            read_base, pending, state = carry
            row, j = xs
            is_read = j == read_base
            state = jnp.where(is_read, pending, state)
            packed = jnp.sum(jnp.where(lane_iota == state, row, 0))
            off = packed & 0xFFFFF
            pred = packed >> 20
            read_base = jnp.where(is_read, j - off, read_base)
            pending = jnp.where(is_read, pred, pending)
            emit = state | jnp.where(is_read, np.int32(1 << FLAG_BIT),
                                     np.int32(0))
            return (read_base, pending, state), emit

        init = (jnp.int32(n - 1), jnp.int32(state0), jnp.int32(0))
        carry, emits = jax.lax.scan(step, init, (rows, jidx))
        # carry[0] = the final walk base (pb of the last segment; may be -1
        # when the first segment begins at position 0)
        return jnp.flip(emits, axis=0), carry[0]           # j = 1 .. n-1

    return jax.jit(fn)


def make_trace_body(n_pad: int, row_off: int):
    """Non-jitted walk over a PADDED plane with a traced true length.

    fn(bps, state0, n_start) -> ((n_pad-1,) packed emits, final_base):
    identical carry evolution to make_trace_fn(n_start, row_off) — rows at
    j >= n_start are walked with is_read always false (read_base starts at
    n_start-1), so emits for j < n_start match exactly and the caller
    slices packed[:n_start-1].  Built for vmapping inside sharded batch
    runners (parallel/mesh.py) where chunks share a padded bucket length
    but differ in true length."""

    def fn(bps, state0, n_start):
        rows = bps[1 + row_off: n_pad - 1 + row_off + 1]
        rows = jnp.flip(rows, axis=0)
        jidx = jnp.arange(n_pad - 1, 0, -1, dtype=jnp.int32)
        lane_iota = jnp.arange(rows.shape[1], dtype=jnp.int32)

        def step(carry, xs):
            read_base, pending, state = carry
            row, j = xs
            is_read = j == read_base
            state = jnp.where(is_read, pending, state)
            packed = jnp.sum(jnp.where(lane_iota == state, row, 0))
            off = packed & 0xFFFFF
            pred = packed >> 20
            read_base = jnp.where(is_read, j - off, read_base)
            pending = jnp.where(is_read, pred, pending)
            emit = state | jnp.where(is_read, np.int32(1 << FLAG_BIT),
                                     np.int32(0))
            return (read_base, pending, state), emit

        init = (jnp.asarray(n_start - 1, jnp.int32),
                jnp.asarray(state0, jnp.int32), jnp.int32(0))
        carry, emits = jax.lax.scan(step, init, (rows, jidx))
        return jnp.flip(emits, axis=0), carry[0]

    return fn


@lru_cache(maxsize=64)
def make_event_trace_fn(n: int, row_off: int, M: int = 16384):
    """Jitted event-walk traceback: O(#segments) instead of O(n).

    Self-loop runs (off==1 and pred==state — the chain states' per-base
    raw segments, reference doBacktracking off-by-one emission) are
    skipped in one hop via a per-lane cummax "last non-self position"
    table, so the sequential scan only executes one step per REAL
    backpointer read (~10^3-10^4 per Mb instead of 10^6).

    Returns (events (M,5) int32, final_base, count):
      event row = [run_lo, run_hi, seg_lo, seg_hi, state]
      * run entries ([run_lo, run_hi], possibly empty run_lo>run_hi) are
        per-base raw segments of `state` (self-loop chain bases),
      * [seg_lo, seg_hi] is the read segment of `state`.
    Events are emitted end-to-begin; count==M means the bound was
    exhausted (caller falls back to the per-base walk).
    """

    def fn(bps, state0):
        lane = jnp.arange(bps.shape[1], dtype=jnp.int32)
        # row for walk base j is bps[j + row_off]
        body = jax.lax.dynamic_slice_in_dim(bps, 1 + row_off, n - 1, 0)
        # body[i] = row of base j=i+1
        off_t = body & 0xFFFFF
        pred_t = body >> 20
        selfrun = (off_t == 1) & (pred_t == lane[None, :])
        selfrun = selfrun.at[0].set(False)          # base 1 always reads
        jj = jnp.arange(1, n, dtype=jnp.int32)
        jcol = jnp.where(selfrun, 0, jj[:, None])
        brk = jax.lax.cummax(jcol, axis=0)           # last non-self <= j

        def row_at(tab, base, state):
            r = jax.lax.dynamic_index_in_dim(tab, base - 1, 0,
                                             keepdims=False)
            return jnp.sum(jnp.where(lane == state, r, 0))

        def step(carry, _):
            base, state, nseg = carry
            live = base > 0
            bc = jnp.maximum(base, 1)
            sr = (row_at(selfrun.astype(jnp.int32), bc, state) > 0) & live
            b2 = jnp.where(sr, row_at(brk, bc, state), base)
            packed = row_at(body, jnp.maximum(b2, 1), state)
            off = packed & 0xFFFFF
            pred = packed >> 20
            ev = jnp.where(live, jnp.stack(
                [b2 + 1, base, b2 - off + 1, b2, state]), jnp.int32(0))
            base2 = jnp.where(live, b2 - off, base)
            state2 = jnp.where(live, pred, state)
            return (base2, state2, nseg + live.astype(jnp.int32)), ev

        (fb, _, cnt), ev = jax.lax.scan(
            step, (jnp.int32(n - 1), jnp.asarray(state0, jnp.int32),
                   jnp.int32(0)), None, length=M)
        return ev, fb, cnt

    return jax.jit(fn)


def condensed_path_events(events: np.ndarray, count: int, final_base: int,
                          dnalen: int, types):
    """List[PathState] from the event-walk output; identical to
    condensed_path on the per-base packed emits (chain runs expand to
    per-base raw segments, then adjacent same-type non-coding-exon runs
    merge — they are by construction the same merged run)."""
    from ..output.genes import (PathState, set_trunc_flag, is_coding_exon)
    ev = np.asarray(events[:count][::-1])          # begin-to-end order
    if ev.shape[0] == 0:
        return []
    # per event: read segment [seg_lo, seg_hi], then run [run_lo, run_hi]
    segs: List[Tuple[int, int, int]] = []
    for run_lo, run_hi, seg_lo, seg_hi, st_ in ev:
        segs.append((int(seg_lo), int(seg_hi), int(st_)))
        if run_hi >= run_lo:
            t = types[int(st_)]
            if is_coding_exon(t):      # never self-runs; safety expansion
                segs.extend((p, p, int(st_))
                            for p in range(int(run_lo), int(run_hi) + 1))
            else:
                segs.append((int(run_lo), int(run_hi), int(st_)))
    out = []
    for b, e, s in segs:
        t = types[s]
        if out and out[-1].type == t and not is_coding_exon(t):
            out[-1].end = e
            continue
        st = PathState(begin=b, end=e, type=t)
        out.append(st)
    # truncation flags: only the first/last raw segments can set them
    for st in out:
        probe = PathState(begin=st.begin, end=st.end, type=st.type)
        set_trunc_flag(probe, st.begin - 1, dnalen)
        st.truncated = probe.truncated
    return out


def raw_segments(packed: np.ndarray, final_base: int, types
                 ) -> List[Tuple[int, int, object]]:
    """Exact raw segment list of the host walk from the packed emits."""
    states = packed & 0xFF
    ends = np.flatnonzero((packed >> FLAG_BIT) & 1) + 1    # j values
    begins = np.empty_like(ends)
    begins[0] = final_base + 1     # last walk base (may be -1 -> begin 0)
    begins[1:] = ends[:-1] + 1
    st = states[ends - 1]
    return [(int(b), int(e), types[int(s)])
            for b, e, s in zip(begins, ends, st)]


def condensed_path(packed: np.ndarray, final_base: int, dnalen: int, types):
    """List[PathState] identical to og.condense_path(raw_segments(...)).

    Merges adjacent same-type non-coding-exon runs with numpy instead of a
    per-raw-segment Python loop (chain states emit one raw segment per
    base).  Truncation flags can only be set on raw segments touching the
    sequence ends (set_trunc_flag needs pred_end in (-1, 0) or
    end == dnalen-1), so they are evaluated on the first/last raw segment
    only.
    """
    from ..output.genes import (PathState, set_trunc_flag, is_coding_exon)

    states = packed & 0xFF
    flags = (packed >> FLAG_BIT) & 1
    ends = np.flatnonzero(flags) + 1
    if ends.size == 0:
        return []
    begins = np.empty_like(ends)
    begins[0] = final_base + 1     # last walk base (may be -1 -> begin 0)
    begins[1:] = ends[:-1] + 1
    segt = states[ends - 1]

    # type-ids: merge run k into k-1 when same type and not a coding exon
    ptypes = [types[int(s)] for s in segt]
    coding = np.array([is_coding_exon(t) for t in ptypes], dtype=bool)
    same = np.zeros(ends.size, dtype=bool)
    same[1:] = (segt[1:] == segt[:-1]) & ~coding[1:]
    run_start = np.flatnonzero(~same)
    run_end = np.empty_like(run_start)
    run_end[:-1] = run_start[1:] - 1
    run_end[-1] = ends.size - 1

    out = []
    for rs, re in zip(run_start, run_end):
        st = PathState(begin=int(begins[rs]), end=int(ends[re]),
                       type=ptypes[rs])
        # truncation: only the raw segments at the path boundaries can set
        # flags; within a merged run all segments share the type, so
        # checking the first and last raw segment of the run suffices.
        probe = PathState(begin=int(begins[rs]), end=int(ends[rs]),
                          type=ptypes[rs])
        set_trunc_flag(probe, int(begins[rs]) - 1, dnalen)
        trunc = probe.truncated
        if re != rs:
            probe2 = PathState(begin=int(begins[re]), end=int(ends[re]),
                               type=ptypes[re])
            set_trunc_flag(probe2, int(begins[re]) - 1, dnalen)
            trunc |= probe2.truncated
        st.truncated = trunc
        out.append(st)
    return out
