"""Device-side track preparation: the JGold twin of GoldEngine.prepare.

The host pipeline computes ~1.3 GB/Mb of per-base tables in numpy
(~45 s/Mb) and ships them over a ~22 MB/s PJRT tunnel.  JGold runs the
SAME xp-generic builders (gold._prepare_tracks, device.build_tracks,
scan.split_tracks, pallas_pack.pack_tracks) under `jax.jit` with
xputil.use_jax(), so the tables materialize ON DEVICE from

  * the 1-byte code array (k-mer gathers, compensated DD cumsums),
  * the per-base GC-class stairs (1 byte/base, host-computed),
  * sparse hint overlays (interval lists + COO point sets, host-built
    from SeqHints in O(#hints)),

cutting H2D to ~a few MB/Mb and host prep to the sparse overlay build.
Reference quantities being replaced: SegProbs/SnippetProbs + per-model
emission caches (include/statemodel.hh:182-256) and
SequenceFeatureCollection::prepare (src/extrinsicinfo.cc:1697).

v1 scope: the no-UTR exonmodel architecture without exon/CDS-kind sparse
hints (the production bench configuration).  Sparse-exon configs and UTR
architectures fall back to the host prep path (predict._decode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import genetics
from ..constants import STARTCODON_LEN
from ..model import gc as gcmod
from .gold import GoldEngine
from . import xputil as U

F32_NEG = np.float32(-1.0e30)

# overlay interval kinds (diff-scatter + cumsum on device)
IV_KINDS = ("ig_ir", "ig_nep", "ig_gen", "ipb_p", "ipb_m", "cov_p", "cov_m")
SITE_KINDS = ("dss_p", "dss_m", "ass_p", "ass_m")
CODON_KINDS = ("stop_p", "stop_m", "start_p", "start_m")
HS_KINDS = ("fD", "rD", "fA", "rA")

_MALUS_KEYS = ("start", "stop", "ass", "dss", "exonpart", "exon",
               "intronpart", "intron", "CDS", "CDSpart", "UTR", "UTRpart",
               "tss", "tts")


@dataclass(frozen=True)
class OverlayMeta:
    """Static (jit-cache-key) part of the hint overlays."""
    has_hints: bool
    sparse_exon: bool
    sizes: Tuple[Tuple[str, int], ...]
    log_malus: Tuple[Tuple[str, float], ...]
    local_malus_cp: float
    ig_malus: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _bucket_len(m: int) -> int:
    """Pad sparse overlay arrays to power-of-two sizes (bounded recompiles)."""
    v = 8
    while v < m:
        v *= 2
    return v


BIG = np.int32(1 << 30)


def build_overlays(seq_hints, n: int):
    """Host-side: SeqHints -> (OverlayMeta, dict of padded np arrays).

    Replaces gold._build_hint_tracks + the sparse parts of
    gold._apply_signal_hint_terms with data the traced device builder can
    consume (reference igenicmodel.cc:318, extrinsicinfo.cc:1697-1818,
    exonmodel.cc:1294-1311).
    """
    from ..hints.system import distance_faded_bonus
    h = seq_hints
    if h is None:
        return OverlayMeta(False, False, (), (), 0.0), {}
    LOG = np.log
    cfg = h.cfg if hasattr(h, "cfg") else None

    iv: Dict[str, List[Tuple[int, int, float]]] = {k: [] for k in IV_KINDS}
    for f in h.by_type["irpart"]:
        iv["ig_ir"].append((max(f.start, 0), min(f.end, n - 1),
                            float(LOG(f.bonus))))
    for f in h.by_type["nonexonpart"]:
        iv["ig_nep"].append((max(f.start, 0), min(f.end, n - 1),
                             float(LOG(f.bonus))))
    for f in h.by_type["genicpart"]:
        iv["ig_gen"].append((max(f.start, 0), min(f.end, n - 1),
                             float(LOG(f.bonus))))
    for f in h.by_type["intronpart"] + h.by_type["nonexonpart"]:
        if f.strand in ("+", "."):
            iv["ipb_p"].append((max(f.start, 0), min(f.end, n - 1),
                                float(LOG(f.bonus))))
        if f.strand in ("-", "."):
            iv["ipb_m"].append((max(f.start, 0), min(f.end, n - 1),
                                float(LOG(f.bonus))))
    for f in h.by_type["CDSpart"] + h.by_type["exonpart"]:
        if f.strand in ("+", "."):
            iv["cov_p"].append((max(f.start, 0), min(f.end, n - 1), 1.0))
        if f.strand in ("-", "."):
            iv["cov_m"].append((max(f.start, 0), min(f.end, n - 1), 1.0))

    # splice-site adjustment COO (gold.site_adj): total faded bonus at each
    # position covered by a dss/ass hint (replaces the per-position malus)
    site: Dict[str, Dict[int, float]] = {k: {} for k in SITE_KINDS}
    for kind, tname, strand in (("dss_p", "dss", "+"), ("dss_m", "dss", "-"),
                                ("ass_p", "ass", "+"), ("ass_m", "ass", "-")):
        d = site[kind]
        for f in h.by_type[tname]:
            if f.strand not in (strand, "."):
                continue
            for p in range(max(f.start, 0), min(f.end + 1, n)):
                d[p] = d.get(p, 0.0) + distance_faded_bonus(f, p)

    # codon overlay COO by codon START a (gold.codon_adj): positions where a
    # start/stop hint OVERLAPS the codon; value = sum of fades of hints
    # COVERING it (0 when only partial overlaps — suppresses the malus)
    codon: Dict[str, Dict[int, float]] = {k: {} for k in CODON_KINDS}
    for kind, tname, strand in (("stop_p", "stop", "+"),
                                ("stop_m", "stop", "-"),
                                ("start_p", "start", "+"),
                                ("start_m", "start", "-")):
        d = codon[kind]
        for f in h.by_type[tname]:
            if f.strand not in (strand, "."):
                continue
            for a in range(max(f.start - 2, 0), min(f.end + 1, n)):
                v = d.get(a, 0.0)
                if f.start <= a and f.end >= a + 2:
                    v += distance_faded_bonus(f, a + 1)
                d[a] = v

    arrays: Dict[str, np.ndarray] = {}
    sizes: List[Tuple[str, int]] = []

    def put_iv(kind):
        lst = iv[kind]
        L = _bucket_len(len(lst))
        s_ = np.full(L, BIG, dtype=np.int32)
        e_ = np.full(L, BIG, dtype=np.int32)
        w_ = np.zeros(L, dtype=np.float32)
        for i, (a, b, w) in enumerate(lst):
            if b < a:
                continue
            s_[i], e_[i], w_[i] = a, b, w
        arrays[f"{kind}_s"] = s_
        arrays[f"{kind}_e"] = e_
        arrays[f"{kind}_w"] = w_
        sizes.append((kind, L))

    def put_coo(prefix, d):
        items = sorted(d.items())
        L = _bucket_len(len(items))
        p_ = np.full(L, BIG, dtype=np.int32)
        v_ = np.zeros(L, dtype=np.float32)
        for i, (p, v) in enumerate(items):
            p_[i], v_[i] = p, v
        arrays[f"{prefix}_p"] = p_
        arrays[f"{prefix}_v"] = v_
        sizes.append((prefix, L))

    for k in IV_KINDS:
        put_iv(k)
    for k in SITE_KINDS:
        put_coo(f"site_{k}", site[k])
    for k in CODON_KINDS:
        put_coo(f"codon_{k}", codon[k])
    # hinted splice-site positions (SeqHints.hinted_*: boolean site masks)
    for k, attr in (("fD", "hinted_fD"), ("rD", "hinted_rD"),
                    ("fA", "hinted_fA"), ("rA", "hinted_rA")):
        pos = np.flatnonzero(np.asarray(getattr(h, attr)))
        L = _bucket_len(pos.shape[0])
        p_ = np.full(L, BIG, dtype=np.int32)
        p_[: pos.shape[0]] = pos
        arrays[f"hs_{k}_p"] = p_
        sizes.append((f"hs_{k}", L))

    sparse = any(h.by_type[t] for t in ("exonpart", "CDSpart", "exon", "CDS"))
    lm = tuple((t, float(LOG(h.cfg.malus(t)))) for t in _MALUS_KEYS)
    local_cp = float(LOG(h.cfg.info("CDSpart").local_malus))
    igm = (float(LOG(h.cfg.malus("irpart"))),
           float(LOG(h.cfg.malus("nonexonpart"))),
           float(LOG(h.cfg.malus("genicpart"))))
    meta = OverlayMeta(True, bool(sparse), tuple(sizes), lm, local_cp, igm)
    return meta, arrays


class _StaticHints:
    """Static stand-in for SeqHints inside the traced builder: only type
    PRESENCE is consulted there (never the feature lists themselves)."""

    def __init__(self, meta: OverlayMeta):
        self._sparse = meta.sparse_exon

    @property
    def by_type(self):
        class _D:
            def __init__(self, sparse):
                self._sparse = sparse

            def __getitem__(self, t):
                if t in ("exonpart", "CDSpart", "exon", "CDS"):
                    return [True] if self._sparse else []
                return []
        return _D(self._sparse)


class JGold(GoldEngine):
    """GoldEngine twin whose prepare() variant runs under jax tracing."""

    def device_prepare(self, codes, stairs, meta: OverlayMeta, ov) -> None:
        import jax.numpy as jnp
        n = codes.shape[0]
        self.codes = codes
        self.n = n
        self._kmer_full = {}
        self._ht_cache = {}
        self.has_hints = meta.has_hints
        self._ov = ov
        self._meta = meta
        if meta.has_hints:
            self.hints = _StaticHints(meta)
            self.log_malus = dict(meta.log_malus)
            self.log_local_malus_cp = meta.local_malus_cp
            self._build_hint_tracks_device(n)
        else:
            self.hints = None
        self.stairs = stairs
        self._prepare_tracks(codes)

    # -- device hint tracks (gold._build_hint_tracks twin) ---------------
    def _build_hint_tracks_device(self, n: int) -> None:
        import jax.numpy as jnp
        ov = self._ov
        lm = self.log_malus

        def iv_tracks(kind):
            """(sum, covered) per base from the padded interval list."""
            s_, e_ = ov[f"{kind}_s"], ov[f"{kind}_e"]
            w_ = ov[f"{kind}_w"]
            d = jnp.zeros(n + 1, jnp.float32)
            d = d.at[s_].add(w_, mode="drop")
            d = d.at[e_ + 1].add(-w_, mode="drop")
            c = jnp.zeros(n + 1, jnp.float32)
            c = c.at[s_].add(1.0, mode="drop")
            c = c.at[e_ + 1].add(-1.0, mode="drop")
            return jnp.cumsum(d)[:n], jnp.cumsum(c)[:n] > 0.5

        # igenic adjustment: bonuses inside covering hints, maluses where
        # no such hint covers the base (reference igenicmodel.cc:318-326)
        m_ir, m_nep, m_gen = self._meta.ig_malus
        ig_ir, have_ir = iv_tracks("ig_ir")
        ig_nep, have_nep = iv_tracks("ig_nep")
        ig_gen, have_gen = iv_tracks("ig_gen")
        ig = ig_ir + ig_nep - ig_gen
        ig = ig + jnp.where(~have_ir, np.float32(m_ir), 0.0)
        ig = ig + jnp.where(~have_nep, np.float32(m_nep), 0.0)
        ig = ig - jnp.where(~have_gen, np.float32(m_gen), 0.0)
        self.ig_adjust = ig

        ipb_p, _ = iv_tracks("ipb_p")
        ipb_m, _ = iv_tracks("ipb_m")
        self.ipb_plus = ipb_p
        self.ipb_minus = ipb_m
        z = jnp.zeros(1, jnp.float32)
        self.ipb_plus_cum = U.DD.cumsum_dd(jnp.concatenate([z, ipb_p]))
        self.ipb_minus_cum = U.DD.cumsum_dd(jnp.concatenate([z, ipb_m]))

        _, cov_p = iv_tracks("cov_p")
        _, cov_m = iv_tracks("cov_m")
        self.cumcov_cp_plus = jnp.cumsum((~cov_p).astype(jnp.int32))
        self.cumcov_cp_minus = jnp.cumsum((~cov_m).astype(jnp.int32))

        # hinted splice-site masks for build_splice_tracks
        def pmask(kind):
            p = ov[f"hs_{kind}_p"]
            return jnp.zeros(n, bool).at[p].set(True, mode="drop")

        self._hinted_override = (pmask("fD"), pmask("rD"), pmask("fA"),
                                 pmask("rA"))

    # -- device signal hint folding (gold._apply_signal_hint_terms twin) --
    def _apply_signal_hint_terms(self) -> None:
        import jax.numpy as jnp
        ov, lm, n = self._ov, self.log_malus, self.n
        NEG = -np.inf

        def codon_apply(track, kind, shift):
            adj = jnp.where(track > NEG, np.float32(lm[kind.split("_")[0]]),
                            0.0)
            p = ov[f"codon_{kind}_p"] + shift
            adj = adj.at[p].set(ov[f"codon_{kind}_v"], mode="drop")
            return jnp.where(track > NEG, track + adj, track)

        tw = self.cn.trans_init_window
        self.end_stop_fwd = codon_apply(self.end_stop_fwd, "stop_p", 2)
        self.begin_rstop = codon_apply(self.begin_rstop, "stop_m", 0)
        for c in self.classes:
            self.tis_begin_fwd[c] = codon_apply(
                self.tis_begin_fwd[c], "start_p", 0)
            self.tis_end_rev[c] = codon_apply(
                self.tis_end_rev[c], "start_m", tw + STARTCODON_LEN - 1)

        def site_adj(kind, tname):
            adj = jnp.full(n, np.float32(lm[tname]))
            adj = adj.at[ov[f"site_{kind}_p"]].set(ov[f"site_{kind}_v"],
                                                   mode="drop")
            return adj

        self.dss_site_adj_p = site_adj("dss_p", "dss")
        self.dss_site_adj_m = site_adj("dss_m", "dss")
        self.ass_site_adj_p = site_adj("ass_p", "ass")
        self.ass_site_adj_m = site_adj("ass_m", "ass")

    def build_hint_tables_device(self, gpad: int):
        raise NotImplementedError(
            "sparse exon-hint configs run on the host prep path")
