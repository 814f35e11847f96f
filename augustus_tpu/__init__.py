"""augustus_tpu — a TPU-native (JAX/XLA/Pallas) gene-prediction framework.

A from-scratch re-design of the capabilities of AUGUSTUS (generalized
hidden semi-Markov model gene finder) for TPU hardware:

  * all probabilities are kept in log space (float64 on host / exact path,
    float32+renormalization on the TPU fast path) instead of the reference's
    extended-range linear float (reference: src/lldouble.cc),
  * per-base emission terms are precomputed as dense score *tracks* with
    cumulative sums so any segment emission is O(1) (reference computes them
    lazily per candidate, src/exonmodel.cc:1925 seqProb),
  * the semi-Markov Viterbi runs as a banded scan suited to XLA/Pallas,
  * multi-sequence / multi-chunk parallelism uses jax.sharding over a device
    mesh instead of cluster job lists (reference: scripts/createAugustusJoblist.pl).
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compilation cache: the scan kernels take minutes to
# compile; cache them across CLI invocations (JAX skips entries
# transparently when the program or platform changes).  The env-var route
# does NOT work here: site customization may import jax before this
# package, and jax reads its config env vars at import time — so set the
# already-imported config directly.
import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _cache = _os.environ.get(
        "AUGUSTUS_TPU_XLA_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "augustus_tpu", "xla"))
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
