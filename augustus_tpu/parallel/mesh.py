"""Multi-chip execution: data parallelism over sequence chunks.

The reference scales to whole genomes with cluster job lists over sequence
chunks plus a merge script (scripts/createAugustusJoblist.pl,
scripts/join_aug_pred.pl).  The TPU-native equivalent: a batch of equal-length
chunks is sharded over a device mesh axis ("data"); each device runs the scan
DP on its chunks; per-chunk results (final columns + backpointer matrices)
are gathered back; host code stitches/merges genes exactly like
join_aug_pred (boundary handling lives in the piecewise layer).

A `psum` over per-chunk statistics doubles as the cross-device reduction used
by the etraining counting path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..engine.scan import ScanStatic, make_scan_fn


def make_batched_fn(static: ScanStatic, mesh: Mesh, axis: str = "data"):
    """Compile a sharded batch runner.

    Inputs: stacked arrays pytree with leading chunk axis (N, ...), v0
    (N, S).  N must be divisible by the mesh axis size.  Returns
    (v_final (N, S), backptrs (N, n-1, S), stats (per-chunk best score and a
    psum'd global total exercising the ICI collective)).
    """
    fn = make_scan_fn(static)

    def one_chunk(arrays, v0):
        vfin, bps = fn(arrays, v0)
        return vfin, bps

    def shard_body(arrays, v0):
        # arrays leaves: (N/axis, ...) on this device; vmap over chunks
        vfin, bps = jax.vmap(one_chunk)(arrays, v0)
        local_best = jnp.max(vfin, axis=1)                 # (N/axis,)
        total = jax.lax.psum(jnp.sum(local_best), axis)    # collective
        return vfin, bps, local_best, total

    # P(axis) acts as a pytree prefix: every leaf is sharded on its leading
    # (chunk) axis.
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_rep=False)
    return jax.jit(sharded)


def stack_arrays(array_list: List[Dict]) -> Dict:
    """Stack per-chunk arrays pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *array_list)
