"""Decompose detect_clip time on the real TPU: backbone vs refinement loop.

Chained timing only (see utils/profiling.py) — per-call timings lie on the
relay transport. All jitted functions take `variables` as an ARGUMENT
(closing over 22M params embeds them as constants and explodes compile).
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.nets import FeatureNet
from step_tpu.preprocess import device_preprocess
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

BATCH = 64
ITERS = 20


def chained(fn, variables, x, iters=ITERS):
    """fn: (variables, x) -> same-shaped x (dependency chain)."""
    y = fn(variables, x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        x = fn(variables, x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def report_cost(name, lowered):
    try:
        c = lowered.compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        print(f"flops[{name:9s}] = {float(c.get('flops', 0))/1e9:8.1f} G  "
              f"bytes={float(c.get('bytes accessed', 0))/1e9:6.2f} G",
              flush=True)
    except Exception as e:
        print(f"cost_analysis({name}) failed: {e}", flush=True)


def main():
    cfg = PRESETS["ucf_3step"]
    model = STEPDetector(cfg)
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model, device=device)
    T = cfg.total_frames
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(rng.rand(BATCH, T, cfg.image_size, cfg.image_size, 3),
                    jnp.float32), device)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, BATCH)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    # --- full detect, chained via tubes -> proposals ---
    @jax.jit
    def full(variables, rgb, props, prop_mask):
        out = detect_clip(variables, rgb, props, prop_mask, cfg, model)
        return out["tubes"]

    def full_chain(v, props):
        return full(v, rgb, props, prop_mask)

    t_full = chained(full_chain, variables, proposals)
    print(f"full detect        : {t_full*1e3:8.2f} ms/batch  "
          f"({BATCH/t_full:7.1f} clips/s)", flush=True)

    # --- backbone only, chained by folding a scalar back into the input ---
    fnet = FeatureNet(two_stream=cfg.two_stream, depth=cfg.backbone_depth,
                      s2d=cfg.stem_s2d, fuse_bn_relu=cfg.fused_bn_relu,
                      dtype=jnp.dtype(cfg.compute_dtype))
    fvars = {"params": variables["params"]["features"],
             "batch_stats": variables["batch_stats"]["features"]}
    fvars = jax.device_put(fvars, device)

    @jax.jit
    def backbone(fv, x):
        feat = fnet.apply(fv, device_preprocess(x))
        # perturbation must survive dtype rounding or the relay
        # memoizes identical dispatches and returns garbage timings
        return x * (1.0 + jnp.tanh(jnp.mean(feat)).astype(x.dtype) * 1e-3)

    t_bb = chained(backbone, fvars, rgb)
    print(f"backbone (stem)    : {t_bb*1e3:8.2f} ms/batch  "
          f"({100*t_bb/t_full:5.1f}% of full)", flush=True)

    # --- forward only (no NMS surface): model.apply ---
    @jax.jit
    def fwd(variables, rgb, props):
        out = model.apply(variables, rgb, props, None, train=False)
        return out["tubes"][-1]

    def fwd_chain(v, props):
        return fwd(v, rgb, props)

    t_fwd = chained(fwd_chain, variables, proposals)
    print(f"forward (no NMS)   : {t_fwd*1e3:8.2f} ms/batch  "
          f"(NMS+score surface ≈ {(t_full-t_fwd)*1e3:6.2f} ms)", flush=True)

    # --- one head tail application at detect shapes ---
    from step_tpu.models.i3d import I3DTail

    tail = I3DTail(depth=cfg.backbone_depth, dtype=jnp.dtype(cfg.compute_dtype))
    BP = BATCH * cfg.max_proposals
    pooled_shape = (BP, 5, cfg.pooled_size, cfg.pooled_size, 832)
    pooled = jax.device_put(
        jnp.asarray(np.random.RandomState(1).rand(*pooled_shape),
                    jnp.dtype(cfg.compute_dtype)), device)
    tvars = tail.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 7, 7, 832),
                                                       jnp.dtype(cfg.compute_dtype)))
    tvars = jax.device_put(tvars, device)

    @jax.jit
    def tail_fn(tv, x):
        y = tail.apply(tv, x)
        return x * (1.0 + jnp.tanh(jnp.mean(y)).astype(x.dtype) * 1e-3)

    t_tail = chained(tail_fn, tvars, pooled)
    print(f"one tail (B*P={BP}) : {t_tail*1e3:8.2f} ms  (x3 steps ≈ "
          f"{3*t_tail*1e3:6.1f} ms)", flush=True)

    # --- flops/bytes from XLA ---
    report_cost("full", full.lower(variables, rgb, proposals, prop_mask))
    report_cost("backbone", backbone.lower(fvars, rgb))
    report_cost("forward", fwd.lower(variables, rgb, proposals))
    report_cost("tail", tail_fn.lower(tvars, pooled))


if __name__ == "__main__":
    main()
