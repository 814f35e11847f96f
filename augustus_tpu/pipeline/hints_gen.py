"""Hint-generation converters.

Reference: scripts/blat2hints.pl (PSL spliced alignments -> exonpart /
intron hints), scripts/wig2hints.pl (wiggle coverage -> exonpart hints),
scripts/join_mult_hints.pl (merge identical hints, summing multiplicity)
and scripts/filterSpliceHints.pl (keep gt/gc-ag introns).
"""

from __future__ import annotations

import sys
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Tuple

MIN_INTRON = 41        # blat2hints.pl defaults
MAX_INTRON = 350000
EP_CUTOFF = 10         # trim exonpart hints by this at both ends
MAX_GAP_LEN = 14       # gaps up to this length are tolerated inside exons


def psl_to_hints(lines: Iterable[str], src: str = "E",
                 priority: int = 4) -> List[str]:
    """PSL -> hints GFF (reference scripts/blat2hints.pl): block gaps
    shorter than maxgaplen merge into exonparts; gaps within intron
    length bounds become intron hints; terminal blocks are trimmed by
    ep_cutoff."""
    out: List[str] = []
    for line in lines:
        f = line.rstrip("\n").split("\t")
        if len(f) < 21 or not f[0].isdigit():
            continue
        strand = f[8][-1]
        tname = f[13]
        qname = f[9]
        sizes = [int(x) for x in f[18].rstrip(",").split(",")]
        tstarts = [int(x) for x in f[20].rstrip(",").split(",")]
        # merge blocks into exon runs, emit introns at large gaps
        runs: List[Tuple[int, int]] = []
        introns: List[Tuple[int, int]] = []
        rb, re_ = tstarts[0], tstarts[0] + sizes[0] - 1
        for k in range(1, len(sizes)):
            gap_s = re_ + 1
            gap_e = tstarts[k] - 1
            gap = gap_e - gap_s + 1
            if gap <= MAX_GAP_LEN:
                re_ = tstarts[k] + sizes[k] - 1
                continue
            runs.append((rb, re_))
            if MIN_INTRON <= gap <= MAX_INTRON:
                introns.append((gap_s, gap_e))
            rb, re_ = tstarts[k], tstarts[k] + sizes[k] - 1
        runs.append((rb, re_))
        grp = f"grp={qname};pri={priority};src={src}"
        for (b, e) in runs:
            b2, e2 = b + EP_CUTOFF, e - EP_CUTOFF
            if b2 <= e2:
                out.append(f"{tname}\tb2h\texonpart\t{b2 + 1}\t{e2 + 1}"
                           f"\t0\t{strand}\t.\t{grp}")
        for (b, e) in introns:
            out.append(f"{tname}\tb2h\tintron\t{b + 1}\t{e + 1}\t0"
                       f"\t{strand}\t.\t{grp}")
    return out


def join_mult_hints(lines: Iterable[str]) -> List[str]:
    """Merge identical hints, accumulating mult= (reference
    scripts/join_mult_hints.pl, streaming over sorted input).

    Groups run while (seq, type, start, end, strand, frame) equal the
    previous line, sub-bucketed by the src= attribute letter; a bucket
    with one hint passes through VERBATIM (the reference keeps its grp=
    and mult= untouched), multi-hint buckets get score column 6 set to
    the summed multiplicity and "mult=N;" prepended with the first
    hint's grp=/mult= stripped.  (The reference iterates buckets in perl
    hash order, nondeterministic when one position has several sources;
    here insertion order is used.)"""
    import re as _re
    out: List[str] = []
    last: Optional[List[str]] = None
    buckets: Dict[str, List[List[str]]] = {}

    def flush() -> None:
        for src, hs in buckets.items():
            if len(hs) == 1:
                out.append("\t".join(hs[0]).rstrip("\n"))
                continue
            mult = 0
            for h in hs:
                m = _re.search(r"mult=(\d+)", h[8])
                mult += int(m.group(1)) if m else 1
            h = list(hs[0])
            h[8] = _re.sub(r"gro?u?p=[^;]*;", "", h[8], count=1)
            h[8] = _re.sub(r"mult=\d+;", "", h[8], count=1)
            h[5] = str(mult)
            h[8] = f"mult={mult};" + h[8]
            out.append("\t".join(h).rstrip("\n"))
        buckets.clear()

    for line in lines:
        if not line.strip():
            continue
        f = line.split("\t")
        if len(f) < 9:
            continue
        m = _re.search(r"so?u?rce?=(\w)", f[8])
        src = m.group(1) if m else "no_src"
        if last is not None and not (
                f[0] == last[0] and f[2] == last[2] and
                int(f[3]) == int(last[3]) and int(f[4]) == int(last[4])
                and f[6] == last[6] and
                f[7].rstrip("\n") == last[7].rstrip("\n")):
            flush()
        last = f
        buckets.setdefault(src, []).append(f)
    if last is not None:
        flush()
    return out


def wig_to_hints(lines: Iterable[str], width: int = 10, threshold:
                 float = 2.0, src: str = "W", prune: float = 0.1
                 ) -> List[str]:
    """wiggle coverage -> exonpart hints every `width` bases above
    threshold (reference scripts/wig2hints.pl core behavior)."""
    out: List[str] = []
    seq = None
    start = None
    step = 1
    pos = 0
    run_begin = None
    last = None

    def flush(endpos):
        nonlocal run_begin
        if run_begin is None:
            return
        b = run_begin
        while b + width - 1 <= endpos:
            out.append(f"{seq}\tw2h\texonpart\t{b}\t{b + width - 1}\t0"
                       f"\t.\t.\tsrc={src}")
            b += width
        run_begin = None

    for line in lines:
        line = line.strip()
        if line.startswith("track") or not line:
            continue
        if line.startswith("fixedStep"):
            flush(pos)
            kv = dict(t.split("=") for t in line.split()[1:])
            seq = kv["chrom"]
            pos = int(kv["start"]) - 1
            step = int(kv.get("step", 1))
            continue
        if line.startswith("variableStep"):
            flush(pos)
            kv = dict(t.split("=") for t in line.split()[1:])
            seq = kv["chrom"]
            step = None
            continue
        toks = line.split()
        if step is None:
            pos = int(toks[0])
            val = float(toks[1])
        else:
            pos += step
            val = float(toks[0])
        if val >= threshold:
            if run_begin is None:
                run_begin = pos
        else:
            flush(pos - 1)
    flush(pos)
    return out


def exonerate_to_hints(lines: Iterable[str], minintronlen: int = 41,
                       maxintronlen: int = 350000,
                       cdspart_cutoff: int = 15, source: str = "XNT",
                       priority: int = 4) -> List[str]:
    """Exonerate protein2genome GFF dump -> intron/CDSpart hints
    (reference scripts/exonerate2hints.pl): `cds` features are trimmed by
    cdspart_cutoff at both ends (collapsing to the midpoint if they
    cross), `intron` features are kept within the length bounds, and the
    protein id from the `gene` line's `sequence <id> ;` attribute groups
    the hints."""
    import re
    out: List[str] = []
    prot = ""
    for raw in lines:
        line = raw.split("#")[0]
        if not line.strip():
            continue
        if "\texonerate:protein2genome:local\t" not in line:
            continue
        f = line.rstrip("\n").split("\t")
        if len(f) < 8:
            continue
        seqname, typ = f[0], f[2]
        start, end = int(f[3]), int(f[4])
        score, strand = f[5], f[6]
        if end < start:
            start, end = end, start
        if typ == "intron":
            if minintronlen <= end - start + 1 <= maxintronlen:
                out.append(f"{seqname}\txnt2h\tintron\t{start}\t{end}\t"
                           f"{score}\t{strand}\t.\t"
                           f"src={source};grp={prot};pri={priority}")
        elif typ == "cds":
            start += cdspart_cutoff
            end -= cdspart_cutoff
            if start > end:
                start = end = (start + end) // 2
            out.append(f"{seqname}\txnt2h\tCDSpart\t{start}\t{end}\t"
                       f"{score}\t{strand}\t.\t"
                       f"src={source};grp={prot};pri={priority}")
        elif typ == "gene":
            m = re.search(r"sequence (\S+) ; ", line)
            if m:
                prot = m.group(1)
    return out


def polya_to_hints(lines: Iterable[str], hintradius: int = 10,
                   fmt: str = "old", swapstrand: bool = False,
                   source: str = "E", priority: int = 4) -> List[str]:
    """polyA/polyT site table -> tts hints (scripts/polyA2hints.pl):
    each 3' end becomes a tts hint of +-hintradius around the site;
    --swapstrand for polyT tables."""
    out: List[str] = []
    for raw in lines:
        if "Chromosome" in raw and "SeqName" in raw:
            continue
        f = raw.rstrip("\n").split("\t")
        if (fmt == "old" and len(f) < 26) or \
                (fmt == "new" and len(f) < 12) or \
                (fmt == "newer" and len(f) < 13):
            continue
        if fmt == "new":
            target, tts, strand = f[1], int(f[9]), f[2]
        elif fmt == "newer":
            target, tts, strand = f[2], int(f[10]), f[3]
        else:
            target, tts, strand = f[3], int(f[18]), f[2]
        qname = f[0]
        if swapstrand:
            strand = "-" if strand == "+" else "+"
        out.append(f"{target}\tpolyA\ttts\t{tts - hintradius}\t"
                   f"{tts + hintradius}\t.\t{strand}\t.\t"
                   f"pri={priority};src={source};est={qname}")
    return out


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        sys.stderr.write(
            "usage: python -m augustus_tpu.pipeline.hints_gen "
            "{psl2hints|joinmult|wig2hints|exonerate2hints|polyA2hints}"
            " < in > out.gff\n")
        return 1
    lines = sys.stdin
    if argv[0] == "psl2hints":
        print("\n".join(psl_to_hints(lines)))
    elif argv[0] == "joinmult":
        print("\n".join(join_mult_hints(lines)))
    elif argv[0] == "wig2hints":
        print("\n".join(wig_to_hints(lines)))
    elif argv[0] == "exonerate2hints":
        print("\n".join(exonerate_to_hints(lines)))
    elif argv[0] == "polyA2hints":
        swap = "--swapstrand" in argv
        print("\n".join(polya_to_hints(lines, swapstrand=swap)))
    else:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
