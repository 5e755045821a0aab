"""Jitted train step + state, DP-shardable over a device mesh (SURVEY.md §2 C9).

TPU-first: one `jax.jit` program with `jax.sharding.NamedSharding` annotations
— batch split over the 'data' mesh axis, params/opt-state replicated. GSPMD
inserts the gradient all-reduce over ICI; BatchNorm batch statistics also
reduce over the full logical batch automatically (no hand-written psum,
contrast with the reference's DataParallel — SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpucenterface.config import ModelConfig, PreprocessConfig, TrainConfig
from tpucenterface.model.centernet import CenterFaceNet, init_model
from tpucenterface.train.losses import detection_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA weight set (TrainConfig.ema_decay > 0), else None (an empty
    # pytree — absent from sharding/checkpoint trees when off)
    ema_params: Any = None


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "batch_stats", "opt_state", "step", "ema_params"],
    meta_fields=[],
)


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """Adam with epoch-boundary LR step drops (canonical CenterNet training)."""
    sched = optax.piecewise_constant_schedule(
        cfg.lr, {int(e * steps_per_epoch): cfg.lr_drop_factor for e in cfg.lr_drops}
    )
    tx = optax.adam(sched)
    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def make_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    rng: Optional[jax.Array] = None,
    input_size: int = 64,
    steps_per_epoch: int = 1,
) -> Tuple[CenterFaceNet, TrainState, optax.GradientTransformation]:
    model, variables = init_model(model_cfg, rng=rng, input_size=input_size)
    tx = make_optimizer(train_cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ema_params=(
            jax.tree.map(jnp.array, variables["params"])
            if train_cfg.ema_decay > 0
            else None
        ),
    )
    return model, state, tx


def make_train_step(
    model: CenterFaceNet,
    tx: optax.GradientTransformation,
    train_cfg: TrainConfig,
    pre_cfg: PreprocessConfig = PreprocessConfig(),
    frozen_bn: bool = False,
):
    """Build the pure (state, batch) -> (state, metrics) step function.

    batch['image'] is uint8 BGR (host augmenters emit raw canvases);
    normalization runs device-side, sharing constants with the inference
    preprocess (one codepath for the parity-critical mean/std).

    frozen_bn=True builds the post-warmup FrozenBN step
    (TrainConfig.freeze_bn_steps): BatchNorm normalizes with its running
    averages (exactly as inference will) and batch_stats pass through
    unchanged; gradients flow through the now-affine normalization. The
    model has no other train-mode behavior (no dropout), so this is a pure
    normalization-consistency switch.
    """
    mean = jnp.asarray(pre_cfg.mean, jnp.float32)
    std = jnp.asarray(pre_cfg.std, jnp.float32)

    def _normalize(img):
        x = img.astype(jnp.float32)
        if img.dtype == jnp.uint8 and pre_cfg.bgr_input:
            x = x[..., ::-1]
        if img.dtype == jnp.uint8:
            x = (x / 255.0 - mean) / std
        return x  # float inputs pass through (tests feed pre-normalized)

    if frozen_bn:

        def _apply(params, batch_stats, x):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=False,
            )
            return out, {"batch_stats": batch_stats}

    else:

        def _apply(params, batch_stats, x):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )

    if train_cfg.remat:
        # rematerialize the forward: activations recomputed in the backward
        # pass instead of stored — memory for FLOPs (jax.checkpoint)
        _apply = jax.checkpoint(_apply)

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = _apply(params, batch_stats, _normalize(batch["image"]))
        total, metrics = detection_loss(outputs, batch, train_cfg)
        return total, (metrics, mutated["batch_stats"])

    ema_d = jnp.float32(train_cfg.ema_decay)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            # fused into the step program: one extra multiply-add per param,
            # no additional dispatch or host traffic
            new_ema = jax.tree.map(
                lambda e, p: e * ema_d + p.astype(e.dtype) * (1.0 - ema_d),
                new_ema,
                new_params,
            )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def shard_train_step(train_step, mesh: Mesh, state: TrainState):
    """jit the step with DP shardings: batch over 'data', state replicated.

    Returns (jitted_step, sharded_state). The returned program is the
    multi-chip training executable — GSPMD emits the grad/BN psums over ICI.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = jax.tree.map(lambda _: repl, state)
    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, repl)
    return jitted, sharded_state


def make_dummy_batch(
    batch: int, size: int, train_cfg: TrainConfig, stride: int = 4
) -> Dict[str, jnp.ndarray]:
    """Tiny synthetic batch with one centered GT box per image (for dryruns)."""
    h = w = size // stride
    m = train_cfg.max_objs
    hm = jnp.zeros((batch, h, w, 1), jnp.float32).at[:, h // 2, w // 2, 0].set(1.0)
    ind = jnp.zeros((batch, m), jnp.int32).at[:, 0].set((h // 2) * w + w // 2)
    mask = jnp.zeros((batch, m), jnp.float32).at[:, 0].set(1.0)
    out = {
        "image": jnp.zeros((batch, size, size, 3), jnp.float32),
        "hm": hm,
        "ind": ind,
        "mask": mask,
        "wh": jnp.ones((batch, m, 2), jnp.float32) * 2.0 * mask[..., None],
        "off": jnp.ones((batch, m, 2), jnp.float32) * 0.3 * mask[..., None],
    }
    if train_cfg.with_landmarks:
        out["lm"] = jnp.ones((batch, m, 10), jnp.float32) * 0.5 * mask[..., None]
        out["lm_mask"] = mask
    return out
