"""Backend dispatch + compensated (double-float32) arithmetic for the
device-side track builder.

The host prep pipeline (engine/gold.py prepare + engine/device.py
build_tracks + engine/scan.py split_tracks + engine/pallas_pack.py
pack_tracks) computes per-base tables in float64 numpy and rounds once to
float32.  To build the same tables ON DEVICE inside a jit (killing the
~45 s/Mb host time and the ~0.6-1.3 GB/Mb H2D upload, see
docs/ROUND5_PERF_PLAN.md), the same code paths run traced with jax.numpy —
dispatched through `A` below — and the large-magnitude cumulative tracks
(content cumsums, the igenic rebase potential: O(1.4e6) at megabase scale,
f32 ulp ~0.06) are carried as DD double-float32 pairs so the final stored
f32 values match the host's f64-then-round results to ~1 ulp.

Host mode is unchanged: `A.xp` is numpy and DD simply wraps float64.
"""

from __future__ import annotations

import numpy as np

F32_NEG = np.float32(-1.0e30)


class _Accessor:
    """`A.xp` resolves to numpy (default) or jax.numpy (device tracing).

    Set via `use_jax()` context manager around traced prep code.  Not
    thread-safe; prep runs single-threaded.
    """

    def __init__(self):
        self._xp = np

    @property
    def xp(self):
        return self._xp

    @property
    def is_jax(self) -> bool:
        return self._xp is not np


A = _Accessor()


class use_jax:
    def __enter__(self):
        import jax.numpy as jnp
        self._prev = A._xp
        A._xp = jnp
        return self

    def __exit__(self, *exc):
        A._xp = self._prev
        return False


def asarr(x, dtype=None):
    return A.xp.asarray(x, dtype=dtype)


def shift_clip(track, c: int):
    """out[..., i] = track[..., clip(i + c, 0, L-1)] for a STATIC integer
    shift, as slice+edge-pad instead of a gather (XLA:TPU lowers n-length
    index gathers ~15x slower than slices — measured 7.2 ms vs 0.5 ms per
    op at n=1e6 on v5e).  Works for numpy and traced arrays, and DD."""
    if isinstance(track, DD):
        return DD(shift_clip(track.hi, c), shift_clip(track.lo, c))
    xp = A.xp
    L = track.shape[-1]
    if c == 0:
        return track
    if c > 0:
        c = min(c, L - 1)
        body = track[..., c:]
        edge = xp.repeat(track[..., -1:], c, axis=-1)
        return xp.concatenate([body, edge], axis=-1)
    c = min(-c, L - 1)
    body = track[..., : L - c]
    edge = xp.repeat(track[..., :1], c, axis=-1)
    return xp.concatenate([edge, body], axis=-1)


def sg(track, c: int, out_len=None):
    """shift_clip + optional truncation of the last axis."""
    out = shift_clip(track, c)
    if out_len is not None:
        out = out[..., :out_len]
    return out


def class_pick(arr, cls):
    """out[..., i] = arr[cls[i], ..., i] without a 2D gather: a static
    where-chain over the (small) leading class axis."""
    xp = A.xp
    if isinstance(arr, DD):
        return DD(class_pick(arr.hi, cls), class_pick(arr.lo, cls))
    C = arr.shape[0]
    out = arr[0]
    for c in range(1, C):
        out = xp.where(cls == c, arr[c], out)
    return out


def arange(n, dtype=None):
    """Position index array: numpy on the host, a traced iota under jax
    (an np.arange constant would otherwise be EMBEDDED per expression in
    the lowered program — hundreds of MB at megabase scale)."""
    if A.is_jax:
        return A.xp.arange(n, dtype=dtype)
    return np.arange(n, dtype=dtype)


def ftype():
    """Float dtype for plain (non-DD) track math."""
    return np.float64 if not A.is_jax else np.float32


def sanitize(x):
    """nan/-inf/+inf -> F32_NEG, clamp below at F32_NEG (xp-generic
    equivalent of the old in-place nan_to_num + maximum)."""
    xp = A.xp
    y = xp.asarray(x, dtype=ftype())
    y = xp.where(xp.isfinite(y), y, np.float64(F32_NEG))
    return xp.maximum(y, np.float64(F32_NEG))


def setm(a, mask, vals):
    """a[mask] = vals[mask] (mask full-shape boolean), functional."""
    return A.xp.where(mask, vals, a)


def seta(a, idx, vals, mode: str = "set"):
    """a[idx] = vals (or += for mode='add'); idx integer array.  On jax,
    out-of-range indices are dropped; numpy callers must pre-clip."""
    if A.is_jax:
        at = a.at[idx]
        return at.add(vals, mode="drop") if mode == "add" else \
            at.set(vals, mode="drop")
    a = np.array(a)
    if mode == "add":
        np.add.at(a, idx, vals)
    else:
        a[idx] = vals
    return a


def _two_sum(a, b):
    xp = A.xp
    if xp is np:
        with np.errstate(invalid="ignore"):
            s = a + b
            bb = s - a
            err = (a - (s - bb)) + (b - bb)
            err = np.where(np.isfinite(s), err, 0.0)
        return s, err
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    err = xp.where(xp.isfinite(s), err, xp.zeros_like(err))
    return s, err


class DD:
    """Double-float value: hi + lo with |lo| <= ulp(hi)/2.

    On the host (numpy f64) lo is identically zero and ops reduce to
    float64 arithmetic bit-for-bit (f64 headroom makes compensation
    unnecessary there); under jax tracing hi/lo are float32 and the pair
    carries ~48 bits of mantissa — enough for O(1e6)-magnitude log-space
    cumulative tracks at 1e-4 absolute precision.
    """

    __slots__ = ("hi", "lo")
    # numpy must defer binary ops to DD's reflected methods (an ndarray
    # would otherwise treat DD as an opaque scalar -> object arrays)
    __array_priority__ = 1000
    __array_ufunc__ = None

    def __init__(self, hi, lo=None):
        xp = A.xp
        self.hi = xp.asarray(hi, dtype=ftype())
        self.lo = xp.zeros_like(self.hi) if lo is None else lo

    # ---- construction ------------------------------------------------
    @staticmethod
    def cumsum_dd(x, axis=-1):
        """Compensated cumulative sum along `axis` of a plain array."""
        xp = A.xp
        x = xp.asarray(x, dtype=ftype())
        if not A.is_jax:
            return DD(np.cumsum(x, axis=axis))
        import jax

        def comb(a, b):
            (h1, l1), (h2, l2) = a, b
            s, e = _two_sum(h1, h2)
            lo = l1 + l2 + e
            hi, lo = _two_sum(s, lo)
            return hi, lo
        hi, lo = jax.lax.associative_scan(
            comb, (x, xp.zeros_like(x)), axis=axis)
        return DD(hi, lo)

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        return DD(self.hi[idx], self.lo[idx])

    def take(self, idx, axis=-1):
        xp = A.xp
        return DD(xp.take(self.hi, idx, axis=axis),
                  xp.take(self.lo, idx, axis=axis))

    # ---- arithmetic --------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, DD):
            return other
        return DD(A.xp.asarray(other, dtype=ftype()))

    def __add__(self, other):
        o = self._coerce(other)
        s, e = _two_sum(self.hi, o.hi)
        lo = self.lo + o.lo + e
        hi, lo = _two_sum(s, lo)
        return DD(hi, lo)

    __radd__ = __add__

    def __neg__(self):
        return DD(-self.hi, -self.lo)

    def __sub__(self, other):
        return self + (-self._coerce(other))

    def __rsub__(self, other):
        return (-self) + self._coerce(other)

    def where(self, cond, other):
        """DD(where(cond, self, other))."""
        xp = A.xp
        o = self._coerce(other)
        return DD(xp.where(cond, self.hi, o.hi),
                  xp.where(cond, self.lo, o.lo))

    def value(self):
        """Collapse to a plain float array (f64 host / f32 device)."""
        return self.hi + self.lo


class LinRamp:
    """coef * i for i in [-pad, n + pad), index-shifted by pad; DD-exact on
    device (cumsum of a constant), plain f64 on host.  Used for the
    large-magnitude linear terms (b*log4 overlap penalties) whose f32
    product rounding would otherwise reach ~ulp(coef*n) ~ 0.06 at 1 Mb."""

    def __init__(self, coef: float, n: int, pad: int = 128):
        self.pad = pad
        xp = A.xp
        if not A.is_jax:
            self.ramp = DD(np.arange(-pad, n + pad, dtype=np.float64)
                           * float(coef))
        else:
            step = xp.full((n + 2 * pad,), np.float32(coef))
            step = step.at[0].set(0.0)
            # cumsum[i] = coef*i; shift so index i maps to coef*(i - pad)
            self.ramp = DD.cumsum_dd(step) - DD(
                xp.full((n + 2 * pad,), np.float32(coef * pad)))

    def at(self, idx):
        """DD of coef*idx; idx must lie in [-pad, n+pad)."""
        return self.ramp.take(A.xp.clip(idx + self.pad, 0,
                                        self.ramp.shape[0] - 1))


def is_dd(x) -> bool:
    return isinstance(x, DD)


def val(x):
    """Plain float array from DD or array."""
    return x.value() if isinstance(x, DD) else x


def stk(parts, axis=0):
    """stack() that accepts DD or plain elements (uniform kinds)."""
    xp = A.xp
    if parts and isinstance(parts[0], DD):
        return DD(xp.stack([p.hi for p in parts], axis=axis),
                  xp.stack([p.lo for p in parts], axis=axis))
    return xp.stack(parts, axis=axis)


def where(cond, a, b):
    """where() accepting DD in either branch (result DD if any DD)."""
    xp = A.xp
    if isinstance(a, DD) or isinstance(b, DD):
        ad = a if isinstance(a, DD) else DD(xp.asarray(a, dtype=ftype()))
        return ad.where(cond, b)
    return xp.where(cond, a, b)
