"""Fused device-prep + Pallas-DP decode path.

One jit contains: JGold device track building (from codes/stairs/sparse
hint overlays), split/pack consolidation, expand_arrays, and the Pallas
DP kernel.  H2D per chunk is the 1-byte code array + 1-byte stairs +
sparse overlays (~a few MB/Mb) instead of the ~1.3 GB/Mb table upload of
the host-prep path; host time is the sparse overlay build (~O(#hints)).

The jit is cached per (model params, chunk length, boundary flags,
overlay signature).  v1 restrictions (PallasFallback otherwise, caller
uses the host prep path): no UTR/nc states, no exon/CDS-kind sparse
hints, <=2 GC-class switches per kernel block.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .. import genetics
from ..model import gc as gcmod
from . import xputil as U
from .gold import GoldEngine
from .jgold import JGold, build_overlays, OverlayMeta
from .pallas_pack import (PallasFallback, compute_cls_blk, pack_tracks)

_FUSED_CACHE: Dict[tuple, tuple] = {}


def _model_key(gold: GoldEngine) -> int:
    return id(gold.exp)


def _make_fused(jg: JGold, meta: OverlayMeta, n: int):
    """(callable fn, cell) for one static configuration.

    Two jits with a device-resident handoff: the prep graph (JGold +
    build + pack) and the expand+kernel program.  Fusing them into one
    jit was measured ~2x slower at 1 Mb (XLA rematerializes prep values
    into the expanded planes); the split keeps the compact tables as a
    materialization point."""
    import jax

    cell: dict = {}

    def prep_run(codes, stairs, ov, cls_blk):
        from .device import build_tracks
        with U.use_jax():
            jg.device_prepare(codes, stairs, meta, ov)
            tracks = build_tracks(jg)
            static, arrays = pack_tracks(tracks, cls_blk=cls_blk)
        cell["static"] = static
        return arrays

    prep_jit = jax.jit(prep_run)

    def fn(codes, stairs, ov, cls_blk):
        import time as _t
        from .. import stats
        t0 = _t.time()
        arrays = prep_jit(codes, stairs, ov, cls_blk)
        np.asarray(arrays["stab"][0, 0])       # sync (tunneled platform)
        stats.add("dev_prep", _t.time() - t0)
        kjit = cell.get("kjit")
        if kjit is None:
            static = cell["static"]
            nm = 1 + len(static.fixed_groups)
            cmask = np.zeros((nm, 64), dtype=np.int32)
            for s in static.chain_states:
                cmask[0, s] = 1
            for gi, g in enumerate(static.fixed_groups):
                for s in g.states:
                    cmask[gi + 1, s] = 1

            def kernel_run(a, cb):
                from .pallas_pack import expand_arrays
                from .pallas_scan import build_call
                call = build_call(static)
                p = expand_arrays(static, a)
                bps, vfin, vdbg = call(
                    cb, p["sp_state"], p["sp_geo"], p["sp_convH"],
                    p["ip_conv"], p["ip_misc"], p["xh_plane"],
                    p["xi_plane"], p["hw_hbm"], p["gcum_hbm"],
                    p["msk_hbm"], a["ltc_all"], a["lt_T"], a["sel_pack"],
                    a["lv_pack"], a["v0"], a["l0"], a["a0"], cmask)
                return bps, vfin

            kjit = cell["kjit"] = jax.jit(kernel_run, donate_argnums=(0,))
        return kjit(arrays, cls_blk)

    return fn, cell


def try_device_decode(gold: GoldEngine, codes: np.ndarray, softmask,
                      gff_hints):
    """Fused decode; returns the condensed PathState list, or raises
    PallasFallback when the configuration is outside the fused path.

    Side effect on `gold`: sets .hints/.has_hints/.n/.codes (host
    SeqHints) so downstream evidence compilation works without the heavy
    host prepare."""
    import jax
    from .. import stats
    if jax.devices()[0].platform == "cpu" and not _FORCE_CPU[0]:
        raise PallasFallback("no TPU device")
    if any(mc not in ("igenicmodel", "intronmodel", "exonmodel")
           for mc in gold.sg.model_class):
        raise PallasFallback("state architecture outside fused v1 scope")

    with stats.stage("prep"):
        cn, n = gold.cn, codes.shape[0]
        gold.codes = codes
        gold.n = n
        gold.has_hints = False
        gold.hints = None
        feats = []
        if (softmask is not None and cn.softmasking
                and gold.ext_cfg is not None):
            from ..hints.features import softmask_hints
            for grp in softmask_hints(softmask[:n], gold.ext_cfg):
                feats.extend(grp.hints)
            gold.has_hints = True
        if gff_hints is not None:
            feats.extend(gff_hints)
            gold.has_hints = True
        if gold.has_hints and gold.ext_cfg is not None:
            from ..hints.system import SeqHints
            gold.hints = SeqHints(feats, gold.ext_cfg, codes)

        meta, ov = build_overlays(gold.hints, n)
        if meta.sparse_exon:
            raise PallasFallback(
                "exon/CDS-kind sparse hints: host prep path")
        stairs = gcmod.compute_stairs(codes, cn, gold.decomp)
        cls_blk = compute_cls_blk(stairs, n)       # raises on >2 switches

        bkey = getattr(gold, "boundary_flags", (False, False))
        key = (_model_key(gold), n, meta, bkey)
        ent = _FUSED_CACHE.get(key)
        if ent is None:
            jg = JGold(gold.sg, cn, gold.igp, gold.exp, gold.inp,
                       gold.decomp, gold.gcode, utr=gold.utr,
                       utr_cfg=gold.utr_cfg, ext_cfg=gold.ext_cfg)
            jg.log_init = gold.log_init.copy()
            jg.log_term = gold.log_term.copy()
            ent = _make_fused(jg, meta, n) + (jg,)
            _FUSED_CACHE[key] = ent
        fn, cell, jg = ent

    with stats.stage("device_dp"):
        import jax.numpy as jnp
        bps, vfin = fn(jnp.asarray(codes.astype(np.int32)),
                       jnp.asarray(stairs.astype(np.int32)),
                       {k: jnp.asarray(v) for k, v in ov.items()},
                       jnp.asarray(cls_blk))
        vfin = np.asarray(vfin)

    with stats.stage("traceback"):
        static = cell["static"]
        S = static.S
        vf = np.full(gold.S, float(U.F32_NEG), dtype=np.float32)
        vf[:S] = vfin[0, :S]
        lt = np.asarray(jg.log_term, dtype=np.float32)
        last = vf + np.where(np.isfinite(lt), lt, float(U.F32_NEG))
        state0 = int(np.argmax(last))
        if last[state0] <= float(U.F32_NEG) / 2:
            raise RuntimeError("No feasible path found in HMM (fused)")
        from .traceback import (make_event_trace_fn, condensed_path_events,
                                make_trace_fn, condensed_path)
        tfn = make_event_trace_fn(n, 0)
        ev, fb, cnt = tfn(bps, state0)
        cnt = int(cnt)
        if cnt < 16384:
            return condensed_path_events(np.asarray(ev), cnt, int(fb), n,
                                         gold.sg.state_types)
        # event bound exhausted (pathological path): per-base walk
        packed, fb = make_trace_fn(n, 0)(bps, state0)
        return condensed_path(np.asarray(packed), int(fb), n,
                              gold.sg.state_types)


_FORCE_CPU = [False]       # test hook: allow the fused path on CPU
