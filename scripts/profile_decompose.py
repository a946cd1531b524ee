"""Decompose detect_clip time on the real TPU: backbone vs heads vs ROI.

Chained timing only (see utils/profiling.py) — per-call timings lie on the
relay transport.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.nets import FeatureNet
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

BATCH = 64
ITERS = 20


def chained(fn, x, iters=ITERS, key=None):
    """fn: x -> same-shaped x (dependency chain)."""
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


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

    # --- full detect, self-chained via tubes->proposals ---
    @jax.jit
    def full(props):
        out = detect_clip(variables, rgb, props, prop_mask, cfg, model)
        return out["tubes"]

    t_full = chained(full, proposals)
    print(f"full detect        : {t_full*1e3:8.2f} ms/batch  "
          f"({BATCH/t_full:7.1f} clips/s)")

    # --- backbone only, chained by feeding a scalar back into the input ---
    fvars = {"params": variables["params"]["features"],
             "batch_stats": variables["batch_stats"]["features"]}
    fnet = FeatureNet(two_stream=cfg.two_stream, depth=cfg.backbone_depth,
                      s2d=cfg.stem_s2d, fuse_bn_relu=cfg.fused_bn_relu,
                      dtype=jnp.dtype(cfg.compute_dtype))

    @jax.jit
    def backbone(x):
        from step_tpu.preprocess import device_preprocess
        feat = fnet.apply(fvars, device_preprocess(x))
        # fold the feature back into an rgb-shaped carrier (dependency chain)
        return x + jnp.mean(feat).astype(x.dtype) * 1e-9

    t_bb = chained(backbone, rgb)
    print(f"backbone (stem)    : {t_bb*1e3:8.2f} ms/batch  "
          f"({100*t_bb/t_full:5.1f}% of full)")

    # --- single step-loop iteration cost: detect with 1 step vs 3 ---
    cfg1 = cfg.replace(num_steps=1, iou_thresholds=(0.4,),
                       step_loss_weights=(1.0,), temporal_extension=False)
    model1 = STEPDetector(cfg1)
    v1 = jax.tree_util.tree_map(lambda x: x, variables)
    v1 = {
        "params": dict(v1["params"]),
        "batch_stats": dict(v1["batch_stats"]),
    }
    sl = lambda t: jax.tree_util.tree_map(lambda a: a[:1], t)
    v1["params"]["steps"] = sl(variables["params"]["steps"])
    v1["batch_stats"]["steps"] = sl(variables["batch_stats"]["steps"])

    @jax.jit
    def one_step(props):
        out = detect_clip(v1, rgb, props, prop_mask, cfg1, model1)
        return out["tubes"]

    t_one = chained(one_step, proposals)
    print(f"1-step detect      : {t_one*1e3:8.2f} ms/batch  "
          f"(per extra step ≈ {(t_full-t_one)/2*1e3:6.2f} ms)")

    # --- flops breakdown from XLA ---
    for name, f, args in (("full", full, (proposals,)),
                          ("backbone", backbone, (rgb,)),
                          ("one_step", one_step, (proposals,))):
        try:
            c = f.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            print(f"flops[{name:9s}] = {float(c.get('flops', 0))/1e9:8.1f} G  "
                  f"bytes={float(c.get('bytes accessed', 0))/1e9:6.2f} G")
        except Exception as e:
            print(f"cost_analysis({name}) failed: {e}")


if __name__ == "__main__":
    main()
