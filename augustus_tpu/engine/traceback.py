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
