"""Benchmark: PRODUCTION gene-prediction throughput (Mb/s), end to end.

Runs the shipped path — `predict_file` with engine="auto" (Pallas / XLA
scan device DP with gold fallback), human model, **hints on** (EST hints +
softmasking), on a real soft-masked C. elegans chrI region from the
reference's autoAug example — and reports warm-process wall-clock
throughput (host track prep + device DP + traceback + gene projection +
GFF printing; compile amortized via the persistent XLA cache) as ONE JSON
line.

Baseline: the reference AUGUSTUS 3.5.0 C++ binary, same machine, human
model: 200 kb in 2.43 s = 0.082 Mb/s single-core (see BASELINE.md; the
repo publishes no absolute throughput numbers).  This bench measures OUR
end-to-end production path against that number — not a kernel microbench.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MBPS = 0.082   # reference binary, human model, 200kb chrI chunk
CHUNK = int(os.environ.get("BENCH_CHUNK", 1000000))
GENOME = "/root/reference/examples/autoAug/genome.fa"
HINTS = "/root/reference/examples/autoAug/hints.E.gff"
CONFIG = "/root/reference/config"


def _subset_inputs(n):
    """First n bases of chrI (keeping case = softmask) + hints within."""
    from augustus_tpu.io.fasta import read_fasta
    seq = read_fasta(GENOME)[0].sequence[:n]
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    fa.write(">chrI\n")
    for i in range(0, len(seq), 60):
        fa.write(seq[i: i + 60] + "\n")
    fa.close()
    gff = tempfile.NamedTemporaryFile("w", suffix=".gff", delete=False)
    kept = 0
    with open(HINTS) as fh:
        for line in fh:
            parts = line.split("\t")
            if len(parts) > 5 and int(parts[4]) < n:
                gff.write(line)
                kept += 1
    gff.close()
    return fa.name, gff.name, len(seq), kept


def main() -> int:
    import jax
    from augustus_tpu.predict import Model, predict_file

    fa, gff, n, nhints = _subset_inputs(CHUNK)
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
        "UTR": "off", "softmasking": "1",
        "hintsfile": gff,
        "extrinsicCfgFile": os.path.join(
            CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")})

    from augustus_tpu import stats

    t0 = time.time()
    out = predict_file(model, fa, engine="auto")
    cold_s = time.time() - t0

    stats.reset(True)
    t0 = time.time()
    out = predict_file(model, fa, engine="auto")
    warm_s = time.time() - t0
    sys.stderr.write("# " + stats.report() + "\n")
    ngenes = sum(1 for l in out.splitlines() if "\tgene\t" in l)

    mbps = n / warm_s / 1e6
    sys.stderr.write(
        f"# bench: n={n} hints={nhints} genes={ngenes} "
        f"device={jax.devices()[0].platform} cold={cold_s:.1f}s "
        f"warm={warm_s:.1f}s\n")
    print(json.dumps({
        "metric": "production_e2e_mbps", "value": round(mbps, 5),
        "unit": "Mb/s", "vs_baseline": round(mbps / BASELINE_MBPS, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
