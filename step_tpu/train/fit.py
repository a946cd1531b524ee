"""Epoch-level training driver.

Reference parity: the epoch/iteration loop of ``train.py`` (recon): iterate
the loader, step the optimizer, print/log per-step losses, checkpoint every
N steps, support --resume. TPU-native: one jitted sharded train step; host
threads prefetch/augment the next batch while the device runs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector
from step_tpu.parallel.distributed import make_global_batch
from step_tpu.parallel.mesh import create_mesh, replicated_sharding
from step_tpu.train.trainer import create_train_state, make_parallel_train_step
from step_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

_BATCH_KEYS = ("rgb", "flow", "proposals", "prop_mask", "gt_tubes", "gt_labels", "gt_mask")


def _make_tb_scalar_writer(path):
    """`scalar(tag, value, step)` writer or None. Tries tensorflow (baked
    into the TPU image), then torch.utils.tensorboard — so the packaged
    `tb` extra (tensorboard, no tensorflow) still produces event files."""
    try:
        import tensorflow as tf

        w = tf.summary.create_file_writer(path)

        def scalar(tag, value, step):
            with w.as_default():
                tf.summary.scalar(tag, value, step=step)

        scalar.close = w.close
        return scalar
    except ImportError:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter

        w = SummaryWriter(path)

        def scalar(tag, value, step):
            w.add_scalar(tag, value, global_step=step)

        scalar.close = w.close
        return scalar
    except ImportError:
        return None


class MetricsLogger:
    """Console + JSONL + optional TensorBoard metrics (reference: console
    prints + tensorboardX)."""

    def __init__(self, log_dir: Optional[str] = None, print_every: int = 20,
                 tensorboard: bool = True):
        self.print_every = print_every
        self.jsonl = None
        self.tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                self.tb = _make_tb_scalar_writer(os.path.join(log_dir, "tb"))

    def log(self, step: int, metrics: dict, extra: Optional[dict] = None):
        record = {"step": step}
        for k, v in metrics.items():
            arr = np.asarray(v)
            record[k] = arr.tolist() if arr.ndim else float(arr)
        if extra:
            record.update(extra)
        if self.jsonl:
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()
        if self.tb is not None:
            for k, v in record.items():
                if isinstance(v, float):
                    self.tb(k, v, step)
                elif isinstance(v, list) and v and isinstance(v[0], float):
                    for i, vi in enumerate(v):
                        self.tb(f"{k}/{i}", vi, step)
        if step % self.print_every == 0:
            loss = record.get("loss", float("nan"))
            cps = record.get("clips_per_sec", 0.0)
            print(f"step {step}: loss={loss:.4f} clips/s={cps:.1f}", flush=True)

    def close(self):
        if self.jsonl:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def fit(
    cfg: StepConfig,
    loader,
    num_epochs: int = 1,
    ckpt_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
    resume: bool = False,
    ckpt_every: int = 500,
    mesh=None,
    model: Optional[STEPDetector] = None,
    eval_fn: Optional[Callable] = None,
    eval_every_epochs: int = 1,
    seed: int = 0,
    handle_signals: bool = True,
    # Dispatch the NEXT batch's device_put right after the current step so
    # a host with real async DMA overlaps transfer with compute. MEASURED
    # on the relay-tunneled v5e (bench_train.py): the relay serializes
    # uploads with compute in dispatch order, so there is no overlap to
    # win (1.31 s/step without prefetch ≈ 1.0 s upload + 0.26 s compute,
    # vs 1.46 WITH prefetch — the extra resident buffer only adds
    # overhead). Default off; flip on for PCIe/direct-attached hosts.
    prefetch_upload: bool = False,
    # Path to a Kinetics-pretrained torch I3D checkpoint (.pt/.pth, any
    # naming normalize_i3d_state_dict recognizes): converted and loaded
    # into the backbone before training (reference BaseNet.__init__
    # pretrained init (recon)); a --resume checkpoint still wins.
    pretrained_i3d: Optional[str] = None,
):
    """Train `cfg` on `loader` (a DataLoader). Returns the final TrainState."""
    model = model or STEPDetector(cfg)
    if mesh is None:
        # Pure-DP constraint: the global batch must split evenly over the
        # data axis. Use every device when possible, otherwise the largest
        # divisor of batch_size (e.g. batch 2 on an 8-device host → mesh 2).
        n = len(jax.devices())
        if jax.process_count() > 1 and cfg.batch_size % n:
            # multi-host: a devices[:n] subset would exclude some hosts'
            # local devices and make_array_from_process_local_data would
            # fail/deadlock — require a clean global split instead
            # (cfg.batch_size is the GLOBAL batch; train.py hands each
            # process batch_size // process_count)
            raise ValueError(
                f"global batch {cfg.batch_size} must divide over all "
                f"{n} devices in a multi-host run")
        while cfg.batch_size % n:
            n -= 1
        mesh = create_mesh((n,), cfg.mesh_axes)
    state = create_train_state(cfg, jax.random.PRNGKey(seed), model)
    if pretrained_i3d:
        from step_tpu.models.convert import pretrained_detector_variables

        loaded = pretrained_detector_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            pretrained_i3d, cfg)
        # fresh optimizer moments for the pretrained start (the moment
        # trees were init'ed on the random params)
        state = state.replace(params=loaded["params"],
                              batch_stats=loaded["batch_stats"],
                              opt_state=state.tx.init(loaded["params"]))
        print(f"initialized backbone from {pretrained_i3d}", flush=True)
    state = jax.device_put(state, replicated_sharding(mesh))
    start_epoch, start_batch = 0, 0
    if resume and ckpt_dir:
        try:
            state, data_iter = restore_checkpoint(ckpt_dir, state)
            start_epoch = int(data_iter.get("epoch", 0))
            start_batch = int(data_iter.get("batch_index", 0))
            print(
                f"resumed from step {int(state.step)} "
                f"(epoch {start_epoch}, batch {start_batch})", flush=True,
            )
        except FileNotFoundError:
            pass

    pstep = make_parallel_train_step(cfg, model, mesh)
    logger = MetricsLogger(log_dir)
    rng = jax.random.PRNGKey(seed + 1)

    # Preemption safety: SIGTERM/SIGINT (what cluster schedulers and TPU
    # maintenance events send) flips a flag; the step loop then writes a
    # final checkpoint and returns cleanly, so `resume=True` continues
    # mid-epoch with no lost work (reference analog: none — torch training
    # dies and replays from the last periodic checkpoint).
    stop_signal = {"seen": None}
    orig_handlers = {}
    if handle_signals and ckpt_dir:
        import signal as _signal

        def _on_signal(signum, frame):
            if stop_signal["seen"] is not None:
                # second signal: the loop hasn't reached a checkpointable
                # boundary (e.g. blocked in a wedged device call) — restore
                # the default action and let it proceed, so the process
                # stays killable without SIGKILL
                _signal.signal(signum, orig_handlers.get(signum, _signal.SIG_DFL))
                _signal.raise_signal(signum)
                return
            stop_signal["seen"] = signum

        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                orig_handlers[sig] = _signal.signal(sig, _on_signal)
            except ValueError:       # not the main thread
                break

    # The device must be able to run AHEAD of the host: reading
    # `int(state.step)` (or any metric) every iteration is a device sync
    # that serializes host input prep against the step. Track the step on
    # the host and flush buffered device metrics only every `print_every`
    # steps — jax's async dispatch then pipelines input transfer and
    # compute across up to that many steps.
    host_step = int(state.step)
    pending: list = []
    t_window = time.time()

    def flush():
        # Window-average throughput: sync on the newest buffered metrics so
        # every step in the window has actually executed, then divide the
        # window's clips by its wall time. (Per-dispatch deltas measure the
        # HOST dispatch gap under async dispatch — misleadingly fast.)
        nonlocal t_window
        if not pending:
            t_window = time.time()
            return
        # Close the window with a concrete VALUE readback, not
        # block_until_ready: the relay transport acks the latter before
        # execution finishes (CLAUDE.md), which would exclude the real
        # drain time from every window and overstate clips/s.
        float(jnp.asarray(pending[-1][1]["loss"]))
        cps = len(pending) * cfg.batch_size / max(time.time() - t_window, 1e-6)
        for s, m, extra in pending:
            extra["clips_per_sec"] = cps
            logger.log(s, m, extra)
        pending.clear()
        t_window = time.time()

    def batches():
        """Flattened (epoch, batch_index, raw_batch) stream honoring the
        exact-resume skip (deterministic per-epoch order)."""
        for epoch in range(start_epoch, num_epochs):
            for bi, batch in enumerate(loader.epoch(epoch)):
                if epoch == start_epoch and bi < start_batch:
                    continue
                yield epoch, bi, {
                    k: np.asarray(v) for k, v in batch.items()
                    if k in _BATCH_KEYS
                }

    def epoch_end(epoch):
        flush()
        if eval_fn is not None and (epoch + 1) % eval_every_epochs == 0:
            eval_metrics = eval_fn(state, epoch)
            print(f"epoch {epoch} eval: {eval_metrics}", flush=True)

    try:
        # Double-buffered upload: the NEXT batch's sharded device_put is
        # dispatched immediately after the current step, so the host→device
        # transfer (the dominant cost on slow transports — ~1.0 s/step on
        # the relay-tunneled v5e at B=16/224px) overlaps the device compute
        # instead of serializing in front of its own step. Two batches are
        # resident at a time (~43 MB each at the production config, uint8).
        gen = batches()
        nxt = next(gen, None)
        nxt_dev = None
        while nxt is not None:
            if nxt_dev is None:
                nxt_dev = make_global_batch(nxt[2], mesh)
            (epoch, bi, _), device_batch = nxt, nxt_dev
            state, metrics = pstep(state, device_batch, rng)
            nxt = next(gen, None)
            # prefetch_upload=False restores the upload-before-own-step
            # order (A/B toggle; see bench_train.py)
            nxt_dev = (make_global_batch(nxt[2], mesh)
                       if (nxt is not None and prefetch_upload) else None)
            host_step += 1
            pending.append((
                host_step,
                metrics,
                {"epoch": epoch, "batch_index": bi},
            ))
            done = host_step >= cfg.total_steps
            preempted = stop_signal["seen"] is not None
            if len(pending) >= logger.print_every or done or preempted:
                flush()
            if preempted:
                save_checkpoint(
                    ckpt_dir, state,
                    {"epoch": epoch, "batch_index": bi + 1}, wait=True)
                print(f"signal {stop_signal['seen']}: checkpointed at "
                      f"step {host_step} (epoch {epoch}, batch {bi + 1}); "
                      "resume with resume=True", flush=True)
                return state
            if ckpt_dir and host_step % ckpt_every == 0:
                flush()
                save_checkpoint(
                    ckpt_dir, state, {"epoch": epoch, "batch_index": bi + 1}
                )
            if done:
                epoch_end(epoch)
                break
            if nxt is None or nxt[0] != epoch:
                epoch_end(epoch)
        flush()
        if ckpt_dir:
            save_checkpoint(ckpt_dir, state, {"epoch": num_epochs, "batch_index": 0},
                            wait=True)
    finally:
        if orig_handlers:
            import signal as _signal

            for sig, h in orig_handlers.items():
                _signal.signal(sig, h)
        logger.close()
    return state
