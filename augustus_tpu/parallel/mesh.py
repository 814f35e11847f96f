"""Multi-chip execution: data parallelism over sequence chunks.

The reference scales to whole genomes with cluster job lists over sequence
chunks plus a merge script (scripts/createAugustusJoblist.pl,
scripts/join_aug_pred.pl).  The TPU-native equivalent: a batch of equal-length
chunks is sharded over a device mesh axis ("data"); each device runs the scan
DP on its chunks; per-chunk results (final columns + backpointer matrices)
are gathered back; host code stitches/merges genes exactly like
join_aug_pred (boundary handling lives in the piecewise layer).

A `psum` over per-chunk statistics doubles as the cross-device reduction used
by the etraining counting path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..engine.scan import ScanStatic, make_scan_fn
from ..engine.traceback import make_trace_body


def make_batched_fn(static: ScanStatic, mesh: Mesh, axis: str = "data"):
    """Compile a sharded batch runner with ON-DEVICE traceback.

    Inputs: stacked arrays pytree with leading chunk axis (N, ...), v0
    (N, S), log_term (N, S).  N must be divisible by the mesh axis size.
    The backpointer planes never leave the devices: each chunk's walk runs
    right after its scan (engine/traceback.make_trace_body) so only
    (v_final (N, S), packed emits (N, n_pad-1) int32, final_base (N,),
    state0 (N,), stats) ship to the host — ~4 B/base instead of the
    (N, n-1, S) planes.  Stats: per-chunk best score and a psum'd global
    total exercising the ICI collective."""
    fn = make_scan_fn(static)
    n_pad = static.n
    walk = make_trace_body(n_pad, -1)

    def one_chunk(arrays, v0, log_term):
        vfin, bps = fn(arrays, v0)
        last = vfin + log_term
        state0 = jnp.argmax(last).astype(jnp.int32)
        packed, final_base = walk(bps, state0, arrays["n_true"])
        return vfin, packed, final_base, state0

    def shard_body(arrays, v0, log_term):
        # arrays leaves: (N/axis, ...) on this device; vmap over chunks
        vfin, packed, fb, state0 = jax.vmap(one_chunk)(arrays, v0, log_term)
        local_best = jnp.max(vfin, axis=1)                 # (N/axis,)
        total = jax.lax.psum(jnp.sum(local_best), axis)    # collective
        return vfin, packed, fb, state0, local_best, total

    # P(axis) acts as a pytree prefix: every leaf is sharded on its leading
    # (chunk) axis.
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        check_rep=False)
    return jax.jit(sharded)


def stack_arrays(array_list: List[Dict]) -> Dict:
    """Stack per-chunk arrays pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *array_list)


# ---------------------------------------------------------------------------
# Production piece-parallel decoding (used by predict.predict_sequence):
# the pieces of a long sequence (after synch-point cutting) are independent
# DPs; decode them as a sharded batch over the device mesh instead of a
# sequential loop.  Reference equivalent: createAugustusJoblist.pl chunk
# lists + join_aug_pred.pl merge, here with in-process equality to the
# sequential path (same scan fn, same arrays).
# ---------------------------------------------------------------------------


def decode_pieces(model, piece_inputs, engine: str = "auto"):
    """Decode many sequence pieces as sharded batches.

    piece_inputs: list of dicts with keys codes, softmask, gff_hints,
    init_synch, term_synch.  Returns a list of (segments, gold_engine)
    parallel to piece_inputs — gold engines carry the hint state the
    postprocessing needs.  Falls back to None entries when a piece cannot
    run on the batched scan path (caller decodes those sequentially).
    """
    from ..engine.gold import GoldEngine
    from ..engine.device import build_tracks, bucket_length, pad_tracks, \
        UnsupportedByDevice, F32_NEG
    from ..engine.scan import split_tracks

    results = [None] * len(piece_inputs)
    golds = [None] * len(piece_inputs)
    groups: Dict[object, List[int]] = {}
    packed = [None] * len(piece_inputs)
    for i, pi in enumerate(piece_inputs):
        gold = GoldEngine(model.sg, model.cn, model.igp, model.exp,
                          model.inp, model.decomp, model.gcode,
                          utr=model.utr, utr_cfg=model.utr_cfg,
                          ext_cfg=model.ext_cfg)
        gold.set_boundaries(pi["init_synch"], pi["term_synch"])
        gold.prepare(pi["codes"], softmask=pi["softmask"],
                     gff_hints=pi["gff_hints"])
        golds[i] = gold
        try:
            tracks = build_tracks(gold)
        except UnsupportedByDevice:
            gold.run(pi["codes"], softmask=pi["softmask"],
                     gff_hints=pi["gff_hints"])
            results[i] = gold.traceback()
            continue
        n_true = tracks.n
        pad_tracks(tracks, bucket_length(tracks.n))
        static, arrays = split_tracks(tracks)
        arrays["n_true"] = np.int32(n_true)
        packed[i] = (tracks, static, arrays, n_true)
        groups.setdefault(static, []).append(i)

    n_dev = jax.device_count()
    for static, idxs in groups.items():
        mesh = Mesh(np.array(jax.devices()), ("data",))
        batch = idxs[:]
        while len(batch) % n_dev:
            batch.append(idxs[-1])          # pad with a repeat
        arrs = stack_arrays([packed[i][2] for i in batch])
        v0 = np.stack([np.asarray(packed[i][0].log_init)
                       for i in batch])
        lt = np.stack([np.asarray(packed[i][0].log_term, dtype=np.float32)
                       for i in batch])
        lt = np.where(np.isfinite(lt), lt, np.float32(F32_NEG))
        fn = make_batched_fn(static, mesh)
        # traceback runs on-device inside the sharded body: only the
        # packed emits (~4 B/base) and final columns come back, never the
        # (N, n-1, S) backpointer planes
        vfin, pk, fb, st0, _, _ = fn(arrs, v0, lt)
        vfin = np.asarray(vfin)
        pk = np.asarray(pk)
        fb = np.asarray(fb)
        st0 = np.asarray(st0)
        from ..engine.traceback import raw_segments
        types = model.sg.state_types
        for k, i in enumerate(idxs):
            n_true = packed[i][3]
            last = vfin[k] + lt[k]
            if last[int(st0[k])] <= float(F32_NEG) / 2:
                raise RuntimeError("No feasible path found in HMM (scan)")
            results[i] = raw_segments(pk[k][: n_true - 1], int(fb[k]),
                                      types)
    return list(zip(results, golds))
