"""Format conversion helpers.

Reference: scripts/gtf2gff.pl (GTF <-> GFF3 with feature reshaping) and
scripts/getAnnoFasta.pl (extract coding / protein FASTA from a
prediction output).
"""

from __future__ import annotations

import sys
from typing import Dict, List


def gtf_to_gff3(lines) -> List[str]:
    """GTF -> GFF3 (reference scripts/gtf2gff.pl --gff3): gene and
    transcript lines get ID attributes, features get ID/Parent."""
    out = ["##gff-version 3"]
    counters: Dict[str, int] = {}
    for line in lines:
        if not line.strip() or line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        if len(f) < 9:
            continue
        feat, attrs = f[2], f[8]
        tid = gid = None
        if 'transcript_id "' in attrs:
            tid = attrs.split('transcript_id "')[1].split('"')[0]
        if 'gene_id "' in attrs:
            gid = attrs.split('gene_id "')[1].split('"')[0]
        if feat == "gene":
            gid = gid or attrs.strip()
            f[8] = f"ID={gid}"
        elif feat in ("transcript", "mRNA"):
            tid = tid or attrs.strip()
            f[8] = f"ID={tid};Parent={gid or tid.rsplit('.', 1)[0]}"
            f[2] = "mRNA"
        else:
            if tid is None:
                continue
            counters[(tid, feat)] = counters.get((tid, feat), 0) + 1
            f[8] = f"ID={tid}.{feat}{counters[(tid, feat)]};Parent={tid}"
        out.append("\t".join(f))
    return out


def get_anno_fasta(lines, kind: str = "protein") -> List[str]:
    """Extract the '# protein sequence = [...]' / coding sequences from a
    prediction output (reference scripts/getAnnoFasta.pl)."""
    out: List[str] = []
    tid = None
    collecting = False
    buf: List[str] = []
    tag = "# protein sequence = [" if kind == "protein" else \
        "# coding sequence = ["
    for line in lines:
        line = line.rstrip("\n")
        if "\ttranscript\t" in line:
            tid = line.split("\t")[-1]
        if line.startswith(tag):
            collecting = True
            buf = [line[len(tag):]]
        elif collecting:
            if line.startswith("# ") or line.startswith("#"):
                buf.append(line[2:] if line.startswith("# ") else line[1:])
            else:
                collecting = False
        if collecting and buf and buf[-1].endswith("]"):
            buf[-1] = buf[-1][:-1]
            out.append(f">{tid or 'seq'}")
            out.extend(buf)
            collecting = False
    return out


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        sys.stderr.write("usage: python -m augustus_tpu.pipeline.convert "
                         "{gtf2gff3|getprot} < in > out\n")
        return 1
    if argv[0] == "gtf2gff3":
        print("\n".join(gtf_to_gff3(sys.stdin)))
        return 0
    if argv[0] == "getprot":
        print("\n".join(get_anno_fasta(sys.stdin)))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
