"""Profile the production predict_file path (warm run) with cProfile.

Finds where the e2e µs/base goes beyond the known prep+DP costs.
Run: python scripts/dev_profile_e2e.py [n_bases]
"""
import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME = "/root/reference/examples/autoAug/genome.fa"
HINTS = "/root/reference/examples/autoAug/hints.E.gff"
CONFIG = "/root/reference/config"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu.predict import Model, predict_file
    seq = read_fasta(GENOME)[0].sequence[:n]
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    fa.write(">chrI\n")
    for i in range(0, len(seq), 60):
        fa.write(seq[i: i + 60] + "\n")
    fa.close()
    gff = tempfile.NamedTemporaryFile("w", suffix=".gff", delete=False)
    with open(HINTS) as fh:
        for line in fh:
            parts = line.split("\t")
            if len(parts) > 5 and int(parts[4]) < n:
                gff.write(line)
    gff.close()
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
        "UTR": "off", "softmasking": "1",
        "hintsfile": gff.name,
        "extrinsicCfgFile": os.path.join(
            CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")})
    t0 = time.time()
    predict_file(model, fa.name, engine="auto")
    print(f"cold: {time.time()-t0:.1f}s", flush=True)
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    predict_file(model, fa.name, engine="auto")
    pr.disable()
    dt = time.time() - t0
    print(f"warm: {dt:.1f}s = {dt/n*1e6:.1f} us/base", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(45)
    st.sort_stats("tottime").print_stats(35)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
