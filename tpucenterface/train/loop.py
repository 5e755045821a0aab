"""Training loop with checkpoint/resume + metrics logging
(SURVEY.md §2 C9/C10: replaces the reference's train.py epoch loop +
torch.save/load; TPU-native: DP-sharded jitted step, prefetched input
pipeline, orbax checkpoints, safetensors weight export).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np

from tpucenterface.config import ModelConfig, PreprocessConfig, TrainConfig
from tpucenterface.data.loader import batch_iterator
from tpucenterface.runtime.prefetch import prefetch_to_device
from tpucenterface.runtime.sharding import batch_sharding, data_mesh
from tpucenterface.train.step import (
    TrainState,
    make_train_state,
    make_train_step,
    shard_train_step,
)


def save_checkpoint(workdir: str, state: TrainState) -> str:
    """Orbax checkpoint of the full train state (params/opt/stats/step).

    Fetches through weights.io.fetch_exact: a bare device_get through the
    axon relay silently returned transposed 1x1-conv kernels (measured r5
    — the root cause of the flagship "loss falls, AP 0.0" failures).
    """
    import orbax.checkpoint as ocp

    from tpucenterface.weights.io import fetch_exact

    step = int(state.step)
    path = os.path.abspath(os.path.join(workdir, f"ckpt_{step:07d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, fetch_exact(state))
    return path


def restore_checkpoint(workdir: str, template: TrainState) -> Optional[TrainState]:
    """Restore the latest ckpt_* under workdir, or None."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(workdir):
        return None
    cands = sorted(d for d in os.listdir(workdir) if d.startswith("ckpt_"))
    if not cands:
        return None
    path = os.path.abspath(os.path.join(workdir, cands[-1]))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=jax.device_get(template))


def export_weights(workdir: str, state: TrainState, name: str = "model.safetensors"):
    """Write the live weights; with EMA on, also model_ema.safetensors
    (EMA params + the live batch_stats — the running BN stats track the
    live params, which the EMA set approaches; the standard pairing).

    Fetches through weights.io.fetch_exact — see its docstring: a bare
    device_get here exported transposed 1x1-conv kernels on the relay
    backend while the orbax checkpoint of the SAME state was correct.
    """
    from tpucenterface.weights.io import fetch_exact, save_safetensors

    path = os.path.join(workdir, name)
    live = fetch_exact(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    save_safetensors(live, path)
    if state.ema_params is not None:
        save_safetensors(
            {
                "params": fetch_exact(state.ema_params),
                "batch_stats": live["batch_stats"],
            },
            os.path.join(workdir, name.replace(".safetensors", "")
                         + "_ema.safetensors"),
        )
    return path


def _is_transient_compile_error(e: Exception) -> bool:
    """True for the axon relay's transient remote-compile RPC failures.

    Measured failure mode (r5): a long TPU run dies at a recompile
    boundary (e.g. the FrozenBN step-fn swap) with
    `JaxRuntimeError: INTERNAL: http://...:.../remote_compile: read body:
    response body closed before all bytes were read` — the relay dropped
    one compile RPC; the program and train state are untouched (failure
    is pre-execution, so no donated buffer was consumed). Retrying the
    step re-issues the compile. Scoped narrowly to compile-phase relay
    errors: execution-phase failures are NOT retried (donation may have
    invalidated inputs) and re-raise immediately.
    """
    msg = str(e)
    return "remote_compile" in msg or "remote_setup" in msg


def call_with_compile_retry(fn, *args, retries: int = 2, _sleep=time.sleep):
    """Call fn(*args), retrying (with backoff) only on transient
    compile-phase relay errors — see _is_transient_compile_error."""
    for attempt in range(retries + 1):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if attempt >= retries or not _is_transient_compile_error(e):
                raise
            _sleep(2.0 * (attempt + 1))


def train(
    records: Sequence,
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    pre_cfg: PreprocessConfig = PreprocessConfig(),
    workdir: str = "runs/train",
    n_devices: Optional[int] = None,
    max_steps: Optional[int] = None,
    log_every: int = 20,
    ckpt_every: int = 1000,
    resume: bool = True,
    log_fn: Callable[[int, Dict[str, float]], None] = None,
    wh_log: bool = False,
    seed: int = 0,
    # 0 preserves the exact sequential sample stream for a given seed
    # (workers>0 uses per-sample RNG streams — different, documented in
    # data.loader); the CLI passes --workers explicitly.
    loader_workers: int = 0,
) -> TrainState:
    """Run (or resume) training over WIDER records; returns the final state."""
    os.makedirs(workdir, exist_ok=True)
    steps_per_epoch = max(1, len(records) // train_cfg.batch_size)
    model, state, tx = make_train_state(
        model_cfg,
        train_cfg,
        rng=jax.random.PRNGKey(seed),
        input_size=train_cfg.input_size,
        steps_per_epoch=steps_per_epoch,
    )
    restored_step = -1
    if resume:
        restored = restore_checkpoint(workdir, state)
        if restored is not None:
            state = restored
            restored_step = int(state.step)

    mesh = data_mesh(n_devices)
    step_fn = make_train_step(model, tx, train_cfg, pre_cfg)
    jitted, state = shard_train_step(step_fn, mesh, state)
    # FrozenBN recipe (TrainConfig.freeze_bn_steps): a second compiled step
    # takes over past the warmup boundary — BN normalizes with the (now
    # final) running averages exactly as inference will, stats stop
    # updating. Compiled lazily so runs that never cross the boundary (or
    # have it off) pay nothing.
    frozen_jitted = None

    def step_for(step_idx: int):
        nonlocal frozen_jitted, state
        if (
            train_cfg.freeze_bn_steps <= 0
            or step_idx < train_cfg.freeze_bn_steps
        ):
            return jitted
        if frozen_jitted is None:
            frozen_fn = make_train_step(
                model, tx, train_cfg, pre_cfg, frozen_bn=True
            )
            frozen_jitted, state = shard_train_step(frozen_fn, mesh, state)
        return frozen_jitted

    total_steps = max_steps or steps_per_epoch * train_cfg.epochs
    # Host-side step counter: fetching `int(state.step)` every iteration
    # would force a device sync per step and defeat the async dispatch
    # pipeline prefetch_to_device sets up. Metrics (device values) are only
    # materialized at log_every/ckpt boundaries.
    start_step = step = int(state.step)
    # the restored step's ckpt directory already exists on disk — a resume
    # that runs zero further steps (start_step >= total_steps) must not
    # re-save it (orbax refuses to overwrite an existing ckpt directory)
    last_ckpt_step = restored_step
    batches = batch_iterator(
        records, train_cfg, seed=seed, wh_log=wh_log, workers=loader_workers
    )
    t0 = time.perf_counter()
    for batch in prefetch_to_device(batches, size=2, sharding=batch_sharding(mesh)):
        if step >= total_steps:
            break
        state, metrics = call_with_compile_retry(step_for(step), state, batch)
        step += 1
        if log_fn is not None and step % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}  # device fetch here
            m["imgs_per_sec"] = (
                (step - start_step)
                * train_cfg.batch_size
                / max(time.perf_counter() - t0, 1e-9)
            )
            log_fn(step, m)
        if ckpt_every and step % ckpt_every == 0:
            save_checkpoint(workdir, state)
            last_ckpt_step = step
    if step != last_ckpt_step:
        # final save unless the periodic save just wrote this exact step
        # (orbax refuses to overwrite an existing ckpt directory)
        save_checkpoint(workdir, state)
    export_weights(workdir, state)
    return state
