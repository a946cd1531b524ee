"""TF-SAME 3D max pool with a cheap custom backward.

XLA lowers the gradient of `reduce_window(max)` to `select-and-scatter`,
whose TPU emitter is effectively serial per window — a round-3 train-step
trace showed the two 3x3x3/s1 tail pools inside the refinement scan
costing ~45 ms/step of a 218 ms step at B=16 (scripts/profile_train.py),
with all select-and-scatter ops together ~60 ms (~27%).

The backward here is the standard shift-and-compare identity instead:

    grad_x[q] = sum over window offsets o of
                g[p] * (x[q] == y[p]),   where p*s - pad + o == q

For each of the <= 27 static offsets, ONE `lax.pad` (interior padding =
gradient dilation for stride, negative edge padding = the shift/crop)
aligns `y`/`g` onto the input grid, then a fused compare-multiply-add
accumulates. Everything is elementwise and HBM-bandwidth-bound — no
serial scatter.

Tie semantics: select-and-scatter credits the FIRST maximal element per
window; this credits EVERY element equal to the window max (all are
valid subgradients of max; for conv-produced floats exact ties are
vanishing, and tests pin exact equality vs `jax.grad` of the
reduce_window form on tie-free inputs).

Reference parity: backward of ``MaxPool3dTFPadding`` (recon) — torch's
CUDA maxpool backward scatters through saved argmax indices; this is the
TPU-native equivalent trick.
"""

from __future__ import annotations

import functools
import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _same_pads(n: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME (lo, hi) padding for length n, window k, stride s."""
    out = -(-n // s)
    pad = max((out - 1) * s + k - n, 0)
    lo = pad // 2
    return lo, pad - lo


def _reduce_window_max(x, window, stride):
    dims = (1, *window, 1)
    strides = (1, *stride, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "SAME")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_3d_cheapgrad(x, window: Tuple[int, int, int],
                          stride: Tuple[int, int, int]):
    """`reduce_window(max)` forward, shift-and-compare backward."""
    return _reduce_window_max(x, window, stride)


def _fwd(x, window, stride):
    y = _reduce_window_max(x, window, stride)
    return y, (x, y)


def _bwd_core(x, y, g, window, stride):
    """grad wrt x of y = SAME-max-pool(x): shift-and-compare accumulation."""
    spatial = x.shape[1:4]
    pads = [_same_pads(n, k, s)
            for n, k, s in zip(spatial, window, stride)]
    # dilated length of the output grid placed on the input grid
    dil_len = [(y.shape[d + 1] - 1) * stride[d] + 1 for d in range(3)]
    g = g.astype(x.dtype)
    grad = jnp.zeros_like(x)
    zero = jnp.asarray(0, x.dtype)
    ninf = jnp.asarray(-jnp.inf, x.dtype)
    for o in itertools.product(*(range(k) for k in window)):
        # window p's offset-o element touches input q = p*s - lo + o, so
        # shift the (dilated) output grid by t_d = lo_d - o_d; negative
        # edge padding crops, interior padding dilates for stride > 1
        cfgs = [(0, 0, 0)]
        for d in range(3):
            # want aligned[q] = dilated[q + t]; lax.pad puts dilated[i] at
            # position low + i, so low = -t (negative = crop), and high
            # tops the length back up to the input extent
            t = pads[d][0] - o[d]
            cfgs.append((-t, spatial[d] - dil_len[d] + t, stride[d] - 1))
        cfgs.append((0, 0, 0))
        g_al = lax.pad(g, zero, cfgs)
        y_al = lax.pad(y, ninf, cfgs)
        grad = grad + jnp.where(x == y_al, g_al, zero)
    return grad


def _bwd(window, stride, res, g):
    x, y = res
    return (_bwd_core(x, y, g, window, stride),)


max_pool_3d_cheapgrad.defvjp(_fwd, _bwd)


def _axis_windows(window):
    """Split a 3-D window into per-axis 1-D windows (separable max)."""
    out = []
    for axis in range(3):
        if window[axis] > 1:
            out.append((axis,
                        tuple(window[a] if a == axis else 1
                              for a in range(3))))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3d_s1_sepgrad(x, window: Tuple[int, int, int]):
    """Stride-1 SAME max pool: fused single-op forward at inference,
    separable shift-and-compare backward under differentiation.

    The PRIMAL is one `reduce_window` — inference programs are untouched.
    The fwd rule (which JAX uses only when differentiating) computes the
    pool as per-axis 1-D stages (max is separable, so the value is
    identical) and saves each stage's input/output; the backward then
    chains three 3-offset `_bwd_core` passes instead of one 27-offset
    pass. Measured at B=16 ucf_3step (bench_train --skip-fit):
    255.0 ms/step with XLA select-and-scatter, 247.0 with the 27-offset
    backward (the +-1 shifts on the tiny 7x7 tail spatial dims each force
    a lane relayout), 219.6 with this separable backward (+16% train
    throughput). Tie semantics: credits every tied maximum per stage
    (valid subgradient; exact ties are vanishing for conv outputs).
    """
    return _reduce_window_max(x, window, (1, 1, 1))


def _sep_fwd(x, window):
    stages = []
    cur = x
    for _axis, w in _axis_windows(window):
        y = _reduce_window_max(cur, w, (1, 1, 1))
        stages.append((cur, y, w))
        cur = y
    return cur, stages


def _sep_bwd(window, stages, g):
    for cur, y, w in reversed(stages):
        g = _bwd_core(cur, y, g, w, (1, 1, 1))
    return (g,)


max_pool_3d_s1_sepgrad.defvjp(_sep_fwd, _sep_bwd)
