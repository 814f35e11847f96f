"""Multi-host (2-process) jax.distributed decoding equality.

Spawns two local JAX processes (4 virtual CPU devices each, global mesh
of 8) that collectively decode the same sequence pieces via
parallel.distributed.decode_pieces_global; their results must be
identical to each other and to the single-process sequential decode
(reference: cluster chunk jobs + join_aug_pred.pl; SURVEY §2.14 maps
this to jax.distributed + pjit over pieces)."""

import os
import pickle
import socket
import subprocess
import sys

import pytest

from conftest import REFERENCE_CONFIG, has_reference

HERE = os.path.dirname(os.path.abspath(__file__))

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_decode(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the machine sitecustomize (PYTHONPATH) pre-imports jax and touches
    # the backend, which forbids jax.distributed.initialize; run the
    # workers without it
    env.pop("PYTHONPATH", None)
    env.pop("JAX_NUM_PROCESSES", None)
    outs = [str(tmp_path / f"p{i}.pkl") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             coord, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    for i, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        assert p.returncode == 0, \
            f"worker {i} failed:\n{err.decode()[-3000:]}"
    segs = [pickle.load(open(o, "rb")) for o in outs]
    assert segs[0] == segs[1], "processes disagree"

    # single-process sequential oracle on the same pieces
    import jax
    from augustus_tpu import genetics
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.scan import ScanEngine
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu.predict import Model

    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()[:32000]
    codes = genetics.encode(seq)
    n = codes.shape[0]
    step = n // 4
    for i in range(4):
        b, e = i * step, min(n, (i + 1) * step) - 1
        gold = GoldEngine(model.sg, model.cn, model.igp, model.exp,
                          model.inp, model.decomp, model.gcode)
        gold.set_boundaries(b > 0, e < n - 1)
        gold.prepare(codes[b: e + 1])
        se = ScanEngine(build_tracks(gold))
        se.run()
        assert se.traceback() == segs[0][i], f"piece {i} diverges"
