"""3D convolution recast as 2D convolutions — the TPU fast path.

Reference parity: every ``nn.Conv3d`` in the reference backbone/heads
(``models/i3dpt.py::Unit3Dpy`` (recon)).

MEASURED VERDICT (scripts/bench_impls.py, full detect program, v5e B=64):
the direct conv3d HLO wins IN CONTEXT — 220 ms/batch vs 447 ("tcat") /
448 ("sum3"). XLA-TPU lowers the 3-spatial-dim conv well inside a large
program and fuses pads/epilogues, while these rewrites materialize tap
concats / shifted copies through HBM. (Standalone microbenches that showed
the opposite were relay-memoization artifacts — bf16 perturbations rounded
to identity, making every chained dispatch bit-identical.) The lowerings
stay selectable (``StepConfig.conv3d_impl``) and parity-tested for future
hardware/XLA revisions. Two equivalent rewrites:

``tcat`` — fold the k_t temporal taps into input channels:

    y[b,t] = sum_dt conv2d(x[b, t*st + dt - pad], w[dt])
           = conv2d(concat_dt x[b, t*st + dt - pad], concat_dt w[dt])

  one big 2D conv over the (B*T_out) batch with k_t*C input channels —
  more contraction depth per MXU pass, at the cost of materializing the
  k_t-times-wider input.

``sum3`` — keep the k_t separate 2D convs and add the shifted results;
  no activation blow-up, relies on XLA fusing the adds.

Both are exact reorderings of the same sum (bit-level differences are
float reassociation only). ``kt == 1`` collapses to a single 2D conv over
(B*T) for either impl. Temporal stride is supported via strided tap
slicing (tcat) — SAME semantics match ``lax.conv_general_dilated``'s
TF-SAME rule exactly (tested in tests/test_conv3d.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DN3 = ("NDHWC", "DHWIO", "NDHWC")
DN2 = ("NHWC", "HWIO", "NHWC")


def tf_same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME (left, right) padding for one dimension."""
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def _temporal_taps(x: jnp.ndarray, kt: int, st: int):
    """List of kt views x[:, dt - pad + t*st] for t in range(T_out)."""
    T = x.shape[1]
    To = -(-T // st)
    pl, pr = tf_same_pads(T, kt, st)
    xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0), (0, 0), (0, 0)))
    return [xp[:, i : i + (To - 1) * st + 1 : st] for i in range(kt)], To


def conv3d_same(
    x: jnp.ndarray,          # [B, T, H, W, C]
    w: jnp.ndarray,          # [kt, kh, kw, C, F]
    stride: Tuple[int, int, int] = (1, 1, 1),
    impl: str = "tcat",
) -> jnp.ndarray:
    """TF-SAME 3D conv, equal to ``lax.conv_general_dilated(..., 'SAME',
    NDHWC/DHWIO)``, computed per `impl` ("direct" | "tcat" | "sum3")."""
    if impl == "direct":
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding="SAME",
            dimension_numbers=DN3,
        )

    B, T, H, W, C = x.shape
    kt, kh, kw, _, F = w.shape
    st, sh, sw = stride

    if kt == 1:
        To = -(-T // st)
        xs = x[:, : (To - 1) * st + 1 : st] if st > 1 else x
        y = jax.lax.conv_general_dilated(
            xs.reshape(B * To, H, W, C), w[0], (sh, sw), "SAME",
            dimension_numbers=DN2,
        )
        return y.reshape(B, To, y.shape[1], y.shape[2], F)

    taps, To = _temporal_taps(x, kt, st)
    if impl == "sum3" and st == 1:
        y = None
        for i in range(kt):
            yi = jax.lax.conv_general_dilated(
                taps[i].reshape(B * To, H, W, C), w[i], (sh, sw), "SAME",
                dimension_numbers=DN2,
            )
            y = yi if y is None else y + yi
    else:  # tcat (also the strided-sum3 fallback)
        xc = jnp.concatenate(taps, axis=-1).reshape(B * To, H, W, kt * C)
        wc = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(kh, kw, kt * C, F)
        y = jax.lax.conv_general_dilated(
            xc, wc, (sh, sw), "SAME", dimension_numbers=DN2,
        )
    return y.reshape(B, To, y.shape[1], y.shape[2], F)
