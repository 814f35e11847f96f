"""Worker process for the 2-process jax.distributed test.

Each process owns 4 virtual CPU devices; the global mesh has 8.  Both
processes collectively decode the same pieces via
parallel.distributed.decode_pieces_global and write the resulting
segment lists; the test compares them against the single-process
sequential decode.  (SURVEY §4: fake multi-host fixture with local JAX
processes.)

Usage: python distributed_worker.py <coordinator> <nprocs> <pid> <out>
"""

import os
import pickle
import sys

# jax.distributed.initialize must run before anything touches the XLA
# backend: the test spawns this worker with PYTHONPATH cleared (no
# sitecustomize jax pre-import) and JAX_PLATFORMS=cpu in the env
assert os.environ.get("JAX_PLATFORMS") == "cpu"

import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    coordinator, nprocs, pid, out_path = sys.argv[1:5]
    # initialize the distributed runtime BEFORE importing augustus_tpu
    # (its __init__ touches jax config/backend state)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(nprocs),
                               process_id=int(pid))
    from augustus_tpu.parallel import distributed
    assert jax.process_count() == int(nprocs)
    assert jax.device_count() == 8, jax.device_count()

    from augustus_tpu import genetics
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu.predict import Model

    model = Model.load({
        "species": "human",
        "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()[:32000]
    codes = genetics.encode(seq)
    pieces = []
    n = codes.shape[0]
    step = n // 4
    for i in range(4):
        b, e = i * step, min(n, (i + 1) * step) - 1
        pieces.append({
            "codes": codes[b: e + 1], "softmask": None, "gff_hints": None,
            "init_synch": b > 0, "term_synch": e < n - 1})
    res = distributed.decode_pieces_global(model, pieces)
    segs = [r[0] for r in res]
    with open(out_path, "wb") as fh:
        pickle.dump(segs, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
