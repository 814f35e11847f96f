"""augustus-compatible command line interface.

Usage: python -m augustus_tpu.cli.augustus [--key=value ...] queryfile
Mirrors the reference CLI (src/augustus.cc): --species is required, input is
FASTA; output is GFF/GTF on stdout.
"""

from __future__ import annotations

import sys
from typing import Dict, List


def parse_argv(argv: List[str]):
    args: Dict[str, str] = {}
    queryfile = None
    for a in argv:
        if a.startswith("--"):
            body = a[2:]
            if "=" in body:
                k, v = body.split("=", 1)
            else:
                k, v = body, "true"
            args[k] = v
        else:
            queryfile = a
    return args, queryfile


HEADER = """\
# This output was generated with AUGUSTUS-TPU (augustus_tpu {version}).
# A TPU-native reimplementation of AUGUSTUS (Stanke et al.), built on
# JAX/XLA; sources and documentation: see the repository README.
"""


def main(argv=None) -> int:
    from .. import __version__
    from ..predict import Model, predict_file

    args, queryfile = parse_argv(argv if argv is not None else sys.argv[1:])
    if queryfile is None and "queryfile" in args:
        queryfile = args.pop("queryfile")
    # --outfile/--errfile stream redirection (reference augustus.cc:29-33)
    if "outfile" in args:
        sys.stdout = open(args.pop("outfile"), "w")
    if "errfile" in args:
        sys.stderr = open(args.pop("errfile"), "w")
    if "species" not in args:
        sys.stderr.write("error: no species specified (--species=...)\n")
        return 1
    if queryfile is None and "alnfile" not in args:
        sys.stderr.write("error: no query file\n")
        return 1

    if "alnfile" in args:
        # comparative (CGP) mode: --treefile --alnfile --speciesfilenames
        # (reference augustus.cc:129-130 -> CompGenePred::start)
        from ..cgp import CompGenePred
        tree = args.pop("treefile")
        aln = args.pop("alnfile")
        tbl = args.pop("speciesfilenames")
        outdir = args.pop("/CompPred/outdir", ".")
        model = Model.load(args)
        cgp = CompGenePred(model, tree, aln, tbl, outdir=outdir)
        cgp.start()
        sys.stdout.write(HEADER.format(version=__version__))
        sys.stdout.write(f"# CGP outputs written to {outdir}\n")
        return 0

    from ..io.genbank import detect_format
    fmt = detect_format(queryfile)
    if fmt == "genbank" and "softmasking" not in args:
        # reference: softmasking default is off for .gb files
        # (augustus.cc:218-219)
        args["softmasking"] = "0"
    # informational verbosity levels 0-3 (reference /augustus/verbosity,
    # src/augustus.cc:150-220: level 1 reports extrinsic input, level 2
    # parameter initialization, level 3 input-format detection)
    try:
        verbosity = int(args.get("/augustus/verbosity",
                                 args.get("verbosity", "1")))
    except ValueError:
        verbosity = 1
    model = Model.load(args)
    sys.stdout.write(HEADER.format(version=__version__))
    if verbosity and "hintsfile" not in args:
        sys.stdout.write("# No extrinsic information on sequences "
                         "given.\n")
    elif verbosity and "hintsfile" in args:
        sys.stdout.write(f"# reading in the file "
                         f"{args['hintsfile']} ...\n")
        nseq = len(model.gff_hints) if model.gff_hints else 0
        sys.stdout.write(f"# Have extrinsic information about {nseq} "
                         "sequences (in the specified range). \n")
    if verbosity > 1:
        cfgdir = args.get("AUGUSTUS_CONFIG_PATH",
                          model.props.get("AUGUSTUS_CONFIG_PATH", ""))
        sys.stdout.write("# Initializing the parameters using config "
                         f"directory {cfgdir} ...\n")
    if verbosity > 2:
        sys.stdout.write(f"# Looks like {queryfile} is in {fmt} "
                         "format.\n")
    if fmt == "genbank":
        from ..predict import evaluate_genbank
        sys.stdout.write(evaluate_genbank(model, queryfile))
    else:
        sys.stdout.write(predict_file(model, queryfile))
    cl = " ".join(["augustus"] + (argv if argv is not None else sys.argv[1:]))
    sys.stdout.write(f"# command line:\n# {cl}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
