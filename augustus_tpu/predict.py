"""High-level prediction driver: sequences in, GFF text out.

Mirrors the reference flow augustus.cc predictOnInputSequences ->
NAMGene::doViterbiPiecewise -> getStepGenes -> findGenes for the
single-piece, viterbi-only case (sampling/piecewise layers come on top).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from . import genetics
from .constants import Constants
from .properties import Properties, init_properties
from .model.state_config import parse_state_config, StateGraph
from .model import pbl, gc as gcmod
from .engine.gold import GoldEngine
from .io.fasta import FastaRecord, read_fasta
from .output import genes as og


@dataclass
class Model:
    """A loaded species model (parameters + topology + constants)."""
    props: Properties
    cn: Constants
    sg: StateGraph
    igp: pbl.IgenicParams
    exp: pbl.ExonParams
    inp: pbl.IntronParams
    decomp: gcmod.Decomposition
    gcode: genetics.GeneticCode
    utr: object = None
    utr_cfg: object = None
    ext_cfg: object = None
    gff_hints: object = None

    @classmethod
    def load(cls, args: dict, config_path: Optional[str] = None) -> "Model":
        props = init_properties(args, config_path)
        cn = Constants.from_properties(props)
        sg = parse_state_config(props)
        igp = pbl.read_igenic_pbl(props.species_file("_igenic_probs.pbl"),
                                  cn.decomp_num_steps)
        exp = pbl.read_exon_pbl(props.species_file("_exon_probs.pbl"),
                                cn.decomp_num_steps, cn,
                                k=props.get_int("/ExonModel/k", 4))
        inp = pbl.read_intron_pbl(props.species_file("_intron_probs.pbl"),
                                  cn.decomp_num_steps, cn, props)
        decomp = gcmod.make_decomposition(cn, props)
        table = props.get_int("translation_table", 1)
        utr = utr_cfg = None
        if any(mc == "utrmodel" for mc in sg.model_class):
            from .engine.gold_utr import UtrConfig
            utr = pbl.read_utr_pbl(props.species_file("_utr_probs.pbl"),
                                   cn.decomp_num_steps, cn, props, inp)
            utr_cfg = UtrConfig.from_properties(props)
        ext_cfg = None
        gff_hints = None
        from .hints import config as hints_config
        path = hints_config.default_config_path(props)
        if path is not None and (cn.softmasking or "hintsfile" in props):
            ext_cfg = hints_config.read_extrinsic_cfg(path)
        if "hintsfile" in props and ext_cfg is not None:
            from .hints import system as hints_system
            intron_geo = 1.0 - 1.0 / inp.gc[0].mal if inp.gc else None
            gff_hints = hints_system.parse_gff_hints(
                props.get("hintsfile"), ext_cfg, intron_geo=intron_geo,
                pred_start=(props.get_int("predictionStart")
                            if "predictionStart" in props else None),
                pred_end=(props.get_int("predictionEnd")
                          if "predictionEnd" in props else None))
        return cls(props=props, cn=cn, sg=sg, igp=igp, exp=exp, inp=inp,
                   decomp=decomp, gcode=genetics.GeneticCode(table),
                   utr=utr, utr_cfg=utr_cfg, ext_cfg=ext_cfg,
                   gff_hints=gff_hints)


def _strand_option(props) -> str:
    """reference augustus.cc:178-190 strand string parsing."""
    s = props.get("strand", "") or ""
    if s in ("forward", "Forward", "plus", "Plus", "+", "Watson",
             "watson", "w"):
        return "+"
    if s in ("backward", "Backward", "minus", "Minus", "-", "Crick",
             "crick", "c", "reverse", "Reverse"):
        return "-"
    return "both"


def _decode(gold: GoldEngine, codes, softmask, gff_hints, engine: str,
            need_forward: bool):
    """Run one Viterbi decode; returns the CONDENSED PathState list
    (og.condense_path semantics; device engines walk the path on device
    and merge runs vectorized, engine/traceback.py).

    engine:
      "auto"   — Pallas TPU kernel (fast path) with transparent fallback
                 to the XLA scan engine (chunks the kernel cannot take)
                 and to the gold host engine (state architectures without
                 device tracks, e.g. ncmodel); forward-table runs
                 (sampling/MEA) use the device logsumexp scan
                 (scan.ForwardEngine) + the host sampling walk
      "pallas" — force the Pallas kernel (raises if unsupported)
      "scan"   — force the XLA scan engine (raises if unsupported)
      "gold"   — host float64 oracle
    """
    from . import stats
    if engine in ("auto", "pallas") and not need_forward:
        # fused device-prep fast path: tracks are built ON DEVICE from
        # codes/stairs/sparse hint overlays inside one jit with the Pallas
        # DP kernel (engine/pallas_prep.py) — no host table building, no
        # bulk H2D.  Falls back transparently outside its v1 scope.
        from .engine.pallas_pack import PallasFallback
        from .engine.device import UnsupportedByDevice
        try:
            from .engine.pallas_prep import try_device_decode
            return try_device_decode(gold, codes, softmask, gff_hints)
        except (PallasFallback, UnsupportedByDevice):
            pass
    if engine in ("auto", "pallas", "scan"):
        from .engine.device import build_tracks, UnsupportedByDevice
        from .engine.scan import ScanEngine, ForwardEngine
        from .engine.pallas_pack import PallasFallback
        with stats.stage("prep"):
            gold.prepare(codes, softmask=softmask, gff_hints=gff_hints)
        try:
            with stats.stage("build_tracks"):
                tracks = build_tracks(gold)
        except UnsupportedByDevice:
            if engine != "auto":
                raise
            gold.run(codes, softmask=softmask, gff_hints=gff_hints,
                     need_forward=need_forward)
            return og.condense_path(gold.traceback(), codes.shape[0])
        if need_forward:
            # device forward table (logsumexp scan) + host sampling walk;
            # the viterbi path comes from the scan engine below
            if engine == "pallas":
                from .engine.pallas_pack import PallasFallback
                raise PallasFallback(
                    "forward-table runs (sampling/MEA) use the scan engine")
            n_true = tracks.n
            se = ScanEngine(tracks)       # pads tracks to the bucket
            se.run()
            fe = ForwardEngine(tracks, n_true=n_true)
            gold.f = fe.run()
            gold._classify_states()
            return se.traceback_path(codes.shape[0])
        if engine != "scan":
            from .engine.pallas_scan import PallasEngine
            import jax
            try:
                if jax.devices()[0].platform == "cpu":
                    # the kernel targets the TPU Mosaic backend; interpret
                    # mode is far slower than the XLA scan on CPU
                    raise PallasFallback("no TPU device")
                with stats.stage("pack"):
                    pe = PallasEngine(tracks)
                with stats.stage("device_dp"):
                    pe.run()
                with stats.stage("traceback"):
                    return pe.traceback_path(codes.shape[0])
            except PallasFallback:
                if engine == "pallas":
                    raise
        with stats.stage("pack"):
            se = ScanEngine(tracks)
        with stats.stage("device_dp"):
            se.run()
        with stats.stage("traceback"):
            return se.traceback_path(codes.shape[0])
    gold.run(codes, softmask=softmask, gff_hints=gff_hints,
             need_forward=need_forward)
    return og.condense_path(gold.traceback(), codes.shape[0])


def _find_genes(model: Model, codes: np.ndarray, softmask, gff_hints,
                engine: str, init_synch: bool = False,
                term_synch: bool = False, precomputed=None) -> tuple:
    """Run the DP + sampling + filtering on one sequence piece; returns
    (agl, gold) with piece-local coordinates (reference NAMGene::findGenes,
    namgene.cc:763).

    precomputed: optional (segments, gold) pair from the mesh-parallel
    piece decoder (parallel.mesh.decode_pieces) — skips the local DP."""
    cn = model.cn
    props = model.props
    if precomputed is not None:
        gold = precomputed[1]
    else:
        gold = GoldEngine(model.sg, cn, model.igp, model.exp, model.inp,
                          model.decomp, model.gcode, utr=model.utr,
                          utr_cfg=model.utr_cfg, ext_cfg=model.ext_cfg)
        gold.set_boundaries(init_synch, term_synch)

    # sampling configuration (reference namgene.cc:54-92,768)
    sample_iters = props.get_int("sample", 0)
    if 0 < sample_iters < 10:
        sample_iters = 0       # reference refuses too-low sample counts
    alt_sampling = props.get_bool("alternatives-from-sampling", False)
    keep_viterbi = props.get_bool("keep_viterbi", False)
    minep = props.get_float("minexonintronprob", 0.0)
    minmep = props.get_float("minmeanexonintronprob", 0.0)
    mea_on = props.get_bool("mea", False)
    if mea_on:
        # reference namgene.cc:85-90: MEA forces sampling and disables
        # probability filters
        sample_iters = 100
        alt_sampling = True
        minep = 0.0
        minmep = 0.0
    if sample_iters < 1:
        sample_iters = 1
    need_forward = sample_iters > 1

    from . import stats
    if precomputed is not None and not need_forward:
        path = og.condense_path(precomputed[0], codes.shape[0])
    else:
        path = _decode(gold, codes, softmask, gff_hints, engine,
                       need_forward)
    _t_proj = __import__("time").time()
    genes = og.project_onto_genes(path, cn)
    # reference NAMGene::findGenes (namgene.cc:812-906): viterbi transcripts
    # enter with weight 1, sampled paths accumulate posterior counts
    alltranscripts = list(genes)
    for g in alltranscripts:
        g.apostprob = 1.0
        g.set_state_postprobs(1.0)
        g.set_sample_count(1)
        g.has_probs = True
        g.throwaway = False
        g.viterbi = True
    if need_forward:
        # one C-rand stream per process, shared across sequences/pieces
        # (reference rand() is global and unseeded == srand(1))
        if getattr(model, "_crand", None) is None:
            from .crand import GlibcRand
            model._crand = GlibcRand(1)
        rng = model._crand
        for _ in range(sample_iters - 1):
            segs = gold.sample_path(rng)
            spath = og.condense_path(segs, codes.shape[0])
            for g in og.project_onto_genes(spath, cn):
                g.apostprob = 1.0
                g.set_state_postprobs(1.0)
                g.set_sample_count(1)
                g.has_probs = True
                g.viterbi = False
                g.throwaway = not alt_sampling
                alltranscripts.append(g)
        alltranscripts.sort(key=lambda g: g.gene_begin())  # stable
        # merge identical transcripts (namgene.cc:877-892)
        i = 0
        while i < len(alltranscripts):
            a = alltranscripts[i]
            j = i + 1
            while j < len(alltranscripts) and \
                    alltranscripts[j].gene_begin() == a.gene_begin():
                b = alltranscripts[j]
                if a.states_equal(b):
                    a.throwaway = a.throwaway and b.throwaway
                    a.viterbi = a.viterbi or b.viterbi
                    a.add_sample_count(1)
                    a.apostprob += 1.0
                    a.add_state_postprobs(1.0)
                    del alltranscripts[j]
                else:
                    j += 1
            i += 1
        # cross-transcript state posteriors (namgene.cc:897-905)
        for i, a in enumerate(alltranscripts):
            for b in alltranscripts[i + 1:]:
                if b.gene_begin() > a.gene_end():
                    break
                a.update_post_prob(b)
        for a in alltranscripts:
            a.norm_post_prob(sample_iters)

    # --strand=forward/backward filters transcripts post-DP
    # (reference augustus.cc:178-190 -> filterGenePrediction strand arg)
    strand = _strand_option(props)
    genes = og.filter_transcripts(
        alltranscripts, codes, cn, model.gcode, strand=strand,
        no_in_frame_stop=props.get_bool("noInFrameStop", False),
        keep_viterbi=keep_viterbi, minexonintronprob=minep,
        minmeanexonintronprob=minmep)
    if mea_on:
        from .output import mea as mea_mod
        genes = mea_mod.get_mea_transcripts(genes, codes, props,
                                            model.gcode)
        agl = og.group_transcripts(genes)
    else:
        genes = og.max_tracks_order(genes, keep_viterbi=keep_viterbi)
        agl = og.group_transcripts(genes)
    agl.sort(key=lambda ag: ag.mincodstart)  # AltGene::operator< (stable)
    if not need_forward:
        # reference findGenes else-branch (namgene.cc:945-952)
        for ag in agl:
            for tx in ag.transcripts:
                tx.has_probs = False
                tx.set_state_has_score(False)
    for ag in agl:
        og.sort_transcripts(ag)
    stats.add("project", __import__("time").time() - _t_proj)
    # evidence must be compiled in piece-local coordinates (reference
    # joinGenesFromPredRuns, extrinsicinfo.cc:1553)
    with_evidence = bool(getattr(gold, "has_hints", False)) or \
        getattr(model, "gff_hints", None) is not None
    if with_evidence:
        from .output import evidence as ev
        groups = gold.hints.groups if gold.hints is not None else []
        for ag in agl:
            for tx in ag.transcripts:
                ev.compile_evidence(tx, groups)
    return agl, gold


def _piece_hints(gff_hints, begin: int, end: int):
    """Subset + shift hints for a sequence piece (reference
    SequenceFeatureCollection piece constructor, extrinsicinfo.cc: keep
    features whose END lies in [begin, end], shift by -begin)."""
    if gff_hints is None:
        return None
    import copy
    out = []
    for f in gff_hints:
        if begin <= f.end <= end:
            g = copy.copy(f)
            g.start -= begin
            g.end -= begin
            out.append(g)
    return out


def _try_find_cut(path, exam_start: int, exam_end: int, gaps, only_internal:
                  bool):
    """reference NAMGene::tryFindCutEndPoint (namgene.cc): center of the
    largest intersection of a predicted intergenic region with a group gap."""
    from .model.state_config import ST
    if gaps is None:
        gaps = [(0, 2**31 - 1)]
    max_b, max_e = -1, -1
    for i, st in enumerate(path):
        if st.type != ST.igenic:
            continue
        irb = exam_start + st.begin
        ire = exam_start + st.end
        lgb, lge = -1, -1
        for (gs, ge) in gaps:
            if gs < irb and ge <= ire and ge >= irb and ge - irb > lge - lgb:
                lgb, lge = irb, ge
            elif gs < irb and ge > ire and ire - irb > lge - lgb:
                lgb, lge = irb, ire
            elif gs > irb and ge < ire and ge - gs > lge - lgb:
                lgb, lge = gs, ge
            elif gs >= irb and gs <= ire and ge >= ire and ire - gs > lge - lgb:
                lgb, lge = gs, ire
        internal = 0 < i < len(path) - 1
        if lge - lgb > max_e - max_b and (
                internal or not only_internal or
                lge - lgb > (exam_end - exam_start) // 2):
            max_b, max_e = lgb, lge
    if max_e - max_b > 0:
        return (max_e + max_b) // 2
    return -1


def _mini_viterbi_path(model, codes, softmask, gff_hints, engine,
                       init_synch, term_synch):
    """Decode a small exam window and return the condensed path."""
    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, utr=model.utr,
                      utr_cfg=model.utr_cfg, ext_cfg=model.ext_cfg)
    gold.set_boundaries(init_synch, term_synch)
    return _decode(gold, codes, softmask, gff_hints, engine, False)


def _next_cut_end_point(model, codes, softmask, gff_hints, begin: int,
                        maxstep: int, engine: str, mini_init_synch: bool,
                        mini_term_synch: bool) -> int:
    """reference NAMGene::getNextCutEndPoint (namgene.cc:973)."""
    n = codes.shape[0]
    restlen = n - begin
    if restlen <= maxstep:
        return begin + restlen - 1
    exam = 50000
    if exam < 0.2 * maxstep:
        exam = int(0.2 * maxstep)
    if exam > 150000:
        exam = 150000

    # group gaps between hint groups (reference findGroupGaps)
    gaps = None
    if gff_hints:
        from .hints.system import SeqHints
        from .hints.features import group_gaps
        sh = SeqHints(list(gff_hints), model.ext_cfg, codes)
        if sh.groups:
            gaps = group_gaps(sh.groups, n)
    if gaps is None:
        gaps = [(1, n - 1)]
    gaps_in_range = [(gs, ge) for (gs, ge) in gaps
                     if ge > begin and gs <= begin + maxstep]

    def exam_interval(chunk, gaps_r, skip_last):
        if gaps_r:
            idx = len(gaps_r) - 1
            if skip_last and idx > 0:
                idx -= 1
            gs, ge = gaps_r[idx]
            if ge - gs < chunk:
                center = (ge + gs) // 2
            else:
                center = ge - chunk // 2
        else:
            center = begin + maxstep - 1
        if chunk > maxstep:
            return begin, begin + maxstep - 1
        s = center - chunk // 2
        e = center + chunk // 2
        if e >= begin + maxstep:
            s -= e - (begin + maxstep - 1)
            e = begin + maxstep - 1
        if s < begin:
            e += begin - s
            s = begin
        return s, e

    def run_exam(s, e):
        sub_codes = codes[s: e + 1]
        sub_mask = softmask[s: e + 1] if softmask is not None else None
        sub_hints = _piece_hints(gff_hints, s, e)
        return _mini_viterbi_path(model, sub_codes, sub_mask, sub_hints,
                                  engine, mini_init_synch, mini_term_synch)

    s, e = exam_interval(exam, gaps_in_range, skip_last=False)
    path = run_exam(s, e)
    cut = _try_find_cut(path, s, e, gaps_in_range, True)
    if cut == -1:
        # 2nd try: double the window, last-but-one gap, relaxed criteria
        exam = min(exam * 2, maxstep)
        skip_last = bool(gaps_in_range) and gaps_in_range[-1][0] >= s
        s, e = exam_interval(exam, gaps_in_range, skip_last=skip_last)
        path = run_exam(s, e)
        cut = _try_find_cut(path, s, e, gaps_in_range, True)
        if cut == -1:
            cut = _try_find_cut(path, s, e, gaps_in_range, False)
        if cut == -1:
            cut = _try_find_cut(path, s, e, None, False)
        if cut == -1:
            cut = begin + maxstep - 1
    if cut <= begin + 0.05 * maxstep or cut <= begin + 5000:
        cut = begin + maxstep - 1   # move by at least 5% and 5000bp
    return cut


def anno_to_gene(tg, seqname: str):
    """Convert a training/GenBank TGene annotation into an output Gene with
    typed exon states (reference GBProcessor::getAnnoSequence type
    assignment, src/genbank.cc:137-156)."""
    from .model.state_config import (
        ST, initial_exon_type, internal_exon_type, r_terminal_exon_type,
        r_internal_exon_type)
    g = og.Gene()
    g.geneid = tg.geneid
    g.id = tg.id
    g.seqname = seqname
    g.strand = tg.strand
    g.codingstart = tg.codingstart
    g.codingend = tg.codingend
    g.transstart = tg.transstart
    g.transend = tg.transend
    g.complete5utr = tg.complete_l if tg.strand == "+" else tg.complete_r
    g.complete3utr = tg.complete_r if tg.strand == "+" else tg.complete_l
    plus = tg.strand == "+"
    clength = 0
    nex = len(tg.exons)
    for i, (b, e) in enumerate(tg.exons):
        clength += e - b + 1
        if i == 0:
            if nex == 1:
                t = ST.singleG if plus else ST.rsingleG
            else:
                t = (initial_exon_type(clength) if plus
                     else r_terminal_exon_type(2 - clength))
        elif i == nex - 1:
            t = ST.terminal if plus else ST.rinitial
        else:
            t = (internal_exon_type(clength) if plus
                 else r_internal_exon_type(2 - clength))
        g.exons.append(og.PathState(b, e, t))
    for (b, e) in tg.introns:
        g.introns.append(og.PathState(b, e, ST.intron_type))
    for (b, e) in tg.utr5exons:
        g.utr5exons.append(og.PathState(
            b, e, ST.utr5internal if plus else ST.rutr5internal))
    for (b, e) in tg.utr3exons:
        g.utr3exons.append(og.PathState(
            b, e, ST.utr3internal if plus else ST.rutr3internal))
    return g


def evaluate_genbank(model: Model, path: str, engine: str = "auto",
                     argv_comment: Optional[str] = None) -> str:
    """Predict on a GenBank-annotated test set and print accuracy tables
    (reference evaluateOnTestSet, src/augustus.cc:254)."""
    from .io.genbank import read_genbank
    from .output.evaluation import Evaluation

    props = model.props
    utr_str = props.get("UTR", "off")
    with_utr = utr_str in ("both", "1", "on", "5", "true")
    annoseqs = read_genbank(path, with_utr=with_utr,
                            stop_excluded=props.get_bool(
                                "stopCodonExcludedFromCDS", False))
    out: List[str] = ["# Read in %d genbank sequences." % len(annoseqs)]
    ev = Evaluation()
    anno_opts = og.OutputOptions.from_properties(props)
    gid = 1
    strand = _strand_option(props)
    strand_text = {"+": "forward strand", "-": "reverse strand",
                   "both": "both strands"}[strand]
    for num, a in enumerate(annoseqs, start=1):
        out.append("#")
        out.append("# ----- sequence number %d (length = %d, name = %s)"
                   " -----" % (num, a.length, a.seqname))
        out.append("#")
        out.append("")
        out.append("# annotation: ")
        out.append("# Sequence %s length=%d" % (a.seqname, a.length))
        anno_genes = [anno_to_gene(tg, a.seqname) for tg in a.genes]
        for ag in anno_genes:
            og.print_gene_gff(ag, anno_opts, out, source="database")
        out.append("# Predicted genes for sequence number %d on %s"
                   % (num, strand_text))
        rec = FastaRecord(name=a.seqname, sequence=a.sequence)
        text, ngenes, transcripts = predict_sequence(
            model, rec, seq_number=num, geneid_start=gid, engine=engine,
            with_header=False)
        gid += ngenes
        if text:
            out.append(text.rstrip("\n"))
        ev.add_to_evaluation(transcripts, anno_genes, strand=strand,
                             quotient=0.0)
    ev.finish(out)
    ev.print_quotients(out)
    ev.print_tables(out)
    return "\n".join(out) + "\n"


def predict_sequence(model: Model, rec: FastaRecord, seq_number: int = 1,
                     geneid_start: int = 1, engine: str = "auto",
                     with_header: bool = True) -> tuple:
    """Predict genes on one sequence; returns (gff_text, n_genes).

    engine: "gold" (host float64, exact) or "scan" (device float32 fast
    path; identical except float near-ties / conv-capped exon lengths).

    Long sequences are decoded piecewise (reference
    NAMGene::doViterbiPiecewise, namgene.cc:524): cut points are searched
    in predicted intergenic regions, and interior piece boundaries are
    forced through the synchronisation (igenic) state.
    """
    props = model.props
    codes = genetics.encode(rec.sequence.lower())
    softmask = genetics.softmask_runs(rec.sequence)
    gff_hints = model.gff_hints.get(rec.name, []) \
        if getattr(model, "gff_hints", None) is not None else None

    # --predictionStart/--predictionEnd: cut the relevant piece and shift
    # output coordinates (reference augustus.cc cutRelevantPiece)
    seqlen = codes.shape[0]
    pstart = props.get_int("predictionStart", 1) - 1 \
        if "predictionStart" in props else 0
    pend = props.get_int("predictionEnd", seqlen) - 1 \
        if "predictionEnd" in props else seqlen - 1
    offset = 0
    if (pstart != 0 or pend != seqlen - 1) and not (pend < 0 and pstart < 0):
        pstart = max(pstart, 0)
        pend = min(pend, seqlen - 1)
        if pstart >= seqlen:
            raise ValueError("predictionStart is larger than sequence length")
        if pend < pstart:
            raise ValueError("predictionEnd is smaller than predictionStart")
        codes = codes[pstart: pend + 1]
        softmask = softmask[pstart: pend + 1]
        offset = pstart
    elif pstart < 0 and pend == pstart:
        offset = -pstart - 1

    n = codes.shape[0]
    maxstep = props.get_int("maxDNAPieceSize", 2000000)
    if maxstep < 1000:
        maxstep = 1000

    bodies: List[str] = []
    all_transcripts: List[og.Gene] = []
    gid = geneid_start
    total = 0
    begin = 0
    o = og.OutputOptions.from_properties(props)
    # the cut-point mini-viterbi inherits the boundary distributions set
    # for the PREVIOUS piece (reference quirk: getNextCutEndPoint runs
    # before the loop re-assigns initProbs/termProbs, namgene.cc:576-604)
    prev_init_synch = prev_term_synch = False
    any_evidence = False
    # ---- phase 1: piece boundaries (cut-point searches) ----------------
    pieces = []
    while begin < n:
        end = _next_cut_end_point(model, codes, softmask, gff_hints, begin,
                                  maxstep, engine, prev_init_synch,
                                  prev_term_synch)
        init_synch = begin > 0
        term_synch = end < n - 1
        pieces.append((begin, end, init_synch, term_synch))
        prev_init_synch, prev_term_synch = init_synch, term_synch
        begin = end + 1

    # ---- phase 2: optional mesh-parallel piece decode ------------------
    # pieces are independent DPs once the cut points are fixed; on a
    # multi-device mesh decode them as a sharded batch (reference scales
    # the same way with cluster chunk lists, createAugustusJoblist.pl)
    precomputed = [None] * len(pieces)
    import jax
    if (engine in ("auto", "scan") and len(pieces) > 1
            and props.get_bool("pieceParallel", True)
            and jax.device_count() > 1
            and not props.get_bool("mea", False)
            and props.get_int("sample", 0) <= 1):
        from .parallel.mesh import decode_pieces
        piece_inputs = []
        for (pb, pe, isyn, tsyn) in pieces:
            piece_inputs.append({
                "codes": codes[pb: pe + 1],
                "softmask": softmask[pb: pe + 1]
                if softmask is not None else None,
                "gff_hints": _piece_hints(gff_hints, pb, pe),
                "init_synch": isyn, "term_synch": tsyn})
        precomputed = decode_pieces(model, piece_inputs, engine)

    # ---- phase 3: per-piece gene finding + output ----------------------
    for pidx, (begin, end, init_synch, term_synch) in enumerate(pieces):
        sub_codes = codes[begin: end + 1]
        sub_mask = softmask[begin: end + 1] if softmask is not None else None
        sub_hints = _piece_hints(gff_hints, begin, end)
        agl, gold = _find_genes(model, sub_codes, sub_mask, sub_hints,
                                engine, init_synch, term_synch,
                                precomputed=precomputed[pidx])
        with_evidence = bool(getattr(gold, "has_hints", False)) or \
            gff_hints is not None
        any_evidence = any_evidence or with_evidence
        for ag in agl:
            ag.shift_coordinates(begin + offset)
            ag.id = f"g{gid}"
            ag.seqname = rec.name
            gid += 1
            tid = 1
            for tx in ag.transcripts:
                tx.seqname = rec.name
                tx.id = f"t{tid}"
                tx.geneid = ag.id
                tid += 1
                all_transcripts.append(tx)
        total += len(agl)
        if agl:
            from . import stats
            with stats.stage("print"):
                bodies.append(og.print_gene_list(
                    agl, codes, o, model.gcode,
                    with_evidence=with_evidence, seq_offset=offset))

    header = [
        f"#",
        f"# ----- prediction on sequence number {seq_number} "
        f"(length = {n}, name = {rec.name}) -----",
        f"#",
        f"# Predicted genes for sequence number {seq_number} on "
        + {"+": "forward strand", "-": "reverse strand",
           "both": "both strands"}[_strand_option(props)],
    ]
    body = "".join(bodies)
    if total == 0:
        body = "# (none)\n"
    if not with_header:
        return body, total, all_transcripts
    return "\n".join(header) + "\n" + body, total, all_transcripts


def predict_file(model: Model, path: str, engine: str = "auto") -> str:
    recs = read_fasta(path)
    props = model.props
    if recs and ("predictionStart" in props or "predictionEnd" in props):
        # reference cutRelevantPiece: with an actual cut, only the first
        # sequence is predicted (augustus.cc:581)
        seqlen = len(recs[0].sequence)
        ps = props.get_int("predictionStart", 1) - 1 \
            if "predictionStart" in props else 0
        pe = props.get_int("predictionEnd", seqlen) - 1 \
            if "predictionEnd" in props else seqlen - 1
        if (ps != 0 or pe != seqlen - 1) and not (pe < 0 and ps < 0):
            recs = recs[:1]
    chunks = []
    gid = 1
    for i, rec in enumerate(recs):
        text, ngenes, _ = predict_sequence(model, rec, seq_number=i + 1,
                                           geneid_start=gid, engine=engine)
        gid += ngenes
        chunks.append(text)
    return "".join(chunks)
