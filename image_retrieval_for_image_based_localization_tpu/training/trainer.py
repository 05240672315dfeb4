"""Contrastive/triplet training — data-parallel over the mesh.

Mirrors the reference's `train.py` loop (SURVEY.md §3.2: Adam, exponential
lr decay, tuples of (q, p, n1..n5), contrastive loss, per-epoch hard-negative
re-mining), re-designed TPU-first:

  * tuples are batched ``[B, T, H, W, C]`` and flattened to one big
    ``[B*T, ...]`` conv batch — the MXU sees a dense batch instead of the
    reference's bs=1 image-at-a-time backward (SURVEY.md §3.2 hot loop);
  * data parallelism via jit sharding over the mesh's ``data`` axis:
    params replicated, batch sharded, gradient psum inserted by XLA;
  * BatchNorm runs in train mode with cross-batch stats (reference
    semantics); running stats are carried in the state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
    RetrievalNet,
)
from image_retrieval_for_image_based_localization_tpu.ops.losses import (
    contrastive_loss,
    triplet_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: str = "contrastive"      # 'contrastive' | 'triplet'
    margin: float = 0.7
    lr: float = 1e-6               # reference default for fine-tuning
    lr_decay: float = 0.99         # exponential PER-EPOCH decay (the
    # reference steps ExponentialLR once per epoch; see steps_per_epoch)
    steps_per_epoch: int = 1       # optimizer steps per epoch — the decay
    # applies as lr * lr_decay ** (step // steps_per_epoch), so with the
    # true per-epoch step count the schedule matches the reference instead
    # of collapsing by orders of magnitude within one epoch
    weight_decay: float = 1e-6
    optimizer: str = "adam"        # 'adam' | 'sgd' (reference train.py's
    # --optimizer choice; SGD uses torch-style momentum: wd folds into the
    # gradient BEFORE the momentum trace)
    momentum: float = 0.9
    update_every: int = 1          # gradient accumulation (reference
    # --update-every): apply the optimizer every k-th micro-batch. optax
    # MultiSteps AVERAGES the accumulated gradients where the reference
    # SUMS them — equivalent up to lr*k; documented deviation (mean keeps
    # lr meaning independent of k)
    n_neg: int = 5
    batch_tuples: int = 5          # tuples per step
    # rematerialize trunk activations in backward (jax.checkpoint): trades
    # ~1.3x FLOPs for O(sqrt) activation memory — enables large tuple
    # batches at 1024px on one chip
    remat: bool = False


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """The reference train.py's optimizer choice: Adam (fine-tuning
    default) or SGD with momentum, both with L2 weight decay folded into
    the gradient before the core transform (torch.optim semantics) and
    the exponential per-epoch lr schedule."""
    spe = max(int(cfg.steps_per_epoch), 1)
    if cfg.optimizer == "adam":
        core = optax.scale_by_adam()
    elif cfg.optimizer == "sgd":
        # torch.optim.SGD momentum: buf = momentum*buf + grad; update = buf
        core = optax.trace(decay=cfg.momentum, nesterov=False)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r} (adam|sgd)")
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        core,
        optax.scale_by_schedule(
            lambda step: -cfg.lr
            * (cfg.lr_decay ** jnp.floor(step.astype(jnp.float32) / spe))
        ),
    )
    if cfg.update_every > 1:
        # gradient accumulation: params move only on every k-th
        # micro-batch; the schedule's step counter advances per APPLIED
        # step, so steps_per_epoch must be given in applied steps
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.update_every)
    return tx


def create_train_state(
    model: RetrievalNet,
    rng: jax.Array,
    input_shape: Tuple[int, int, int] = (224, 224, 3),
    cfg: TrainConfig = TrainConfig(),
    variables: Optional[Dict] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    if variables is None:
        variables = model.init(rng, jnp.zeros((1, *input_shape), jnp.float32))
    tx = make_optimizer(cfg)
    params = variables["params"]
    return (
        TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=0,
        ),
        tx,
    )


def _loss_fn(model, cfg: TrainConfig, params, batch_stats, pixels, labels, mask=None):
    """pixels: [B, T, H, W, C]; labels: [B, T] (+1 pos / -1 neg / 0 query);
    mask: optional [B, T, H, W] pixel-validity for padded bucket shapes."""
    B, T, H, W, C = pixels.shape
    flat = pixels.reshape(B * T, H, W, C)
    fmask = None if mask is None else mask.reshape(B * T, H, W)
    mutable = ["batch_stats"] if batch_stats else []

    def fwd(params, batch_stats, flat, fmask):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, flat, mask=fmask, train=True, mutable=mutable)

    if cfg.remat:
        fwd = jax.checkpoint(fwd)
    out = fwd(params, batch_stats, flat, fmask)
    if mutable:
        desc, updates = out
        new_stats = updates["batch_stats"]
    else:
        desc, new_stats = out, batch_stats
    desc = desc.reshape(B, T, -1)
    if cfg.loss == "contrastive":
        loss = contrastive_loss(desc, labels, margin=cfg.margin)
    elif cfg.loss == "triplet":
        loss = triplet_loss(desc, margin=cfg.margin)
    else:
        raise ValueError(cfg.loss)
    return loss, new_stats


def make_train_step(
    model: RetrievalNet,
    tx: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    mesh: Optional[jax.sharding.Mesh] = None,
    from_u8: bool = False,
):
    """Build the jitted train step. With a mesh, batch is sharded over 'data'.

    ``from_u8=True`` builds the production tuple path: the step takes
    ``(state, pixels_u8 [B,T,H,W,3] uint8, sizes [B,T,2] int32, labels)`` —
    raw resized pixels travel host→device as uint8 (4x less transfer);
    ImageNet normalization, validity-mask construction, and pad zeroing run
    on device, and the mask flows into the mask-aware pooling so padded
    bucket rows train on exactly the valid pixels. (Caveat shared with any
    padded conv batch: BatchNorm train-mode statistics still see the zeroed
    padding — bucketed shapes keep that bias small; the reference trains
    bs=1 exact shapes where the issue doesn't arise.)
    """

    if model.use_pallas and model.pooling not in ("gem", "netvlad"):
        raise ValueError(
            "training with use_pallas=True is only supported for GeM and "
            "NetVLAD pooling (gem_l2n_fused and netvlad_fused define custom "
            "VJPs) — use use_pallas=False for training other heads"
        )

    def apply_updates(state, loss, new_stats, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
        )

    if from_u8:
        from image_retrieval_for_image_based_localization_tpu.data.images import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        def step_fn(state: TrainState, pixels_u8, sizes, labels):
            B, T, H, W, _ = pixels_u8.shape
            row = jax.lax.broadcasted_iota(jnp.int32, (B, T, H, W), 2)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, T, H, W), 3)
            mask = (row < sizes[..., 0, None, None]) & (
                col < sizes[..., 1, None, None]
            )
            x = pixels_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            x = x * mask[..., None]
            (loss, new_stats), grads = jax.value_and_grad(
                functools.partial(_loss_fn, model, cfg), has_aux=True
            )(state.params, state.batch_stats, x, labels, mask=mask)
            return apply_updates(state, loss, new_stats, grads)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            return jax.jit(
                step_fn,
                in_shardings=(None, data, data, data),
                out_shardings=(None, rep),
                donate_argnums=(0,),
            )
        return jax.jit(step_fn, donate_argnums=(0,))

    def step_fn(state: TrainState, pixels, labels):
        (loss, new_stats), grads = jax.value_and_grad(
            functools.partial(_loss_fn, model, cfg), has_aux=True
        )(state.params, state.batch_stats, pixels, labels)
        return apply_updates(state, loss, new_stats, grads)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(None, data, data),
            out_shardings=(None, rep),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_val_step(model: RetrievalNet, cfg: TrainConfig = TrainConfig()):
    """Validation loss (reference ``validate()``): eval-mode forward (frozen
    BN running stats), same tuple loss, no gradients."""

    def _loss_eval(params, batch_stats, pixels, labels):
        B, T, H, W, C = pixels.shape
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        desc = model.apply(variables, pixels.reshape(B * T, H, W, C), train=False)
        desc = desc.reshape(B, T, -1)
        if cfg.loss == "contrastive":
            return contrastive_loss(desc, labels, margin=cfg.margin)
        return triplet_loss(desc, margin=cfg.margin)

    return jax.jit(_loss_eval)


def validate(state: TrainState, val_step, batches) -> float:
    """Mean validation loss over an iterable of (pixels, labels) batches."""
    import numpy as _np

    losses = [
        float(val_step(state.params, state.batch_stats, jnp.asarray(p), jnp.asarray(l)))
        for p, l in batches
    ]
    return float(_np.mean(losses)) if losses else 0.0


def make_eval_step(model: RetrievalNet):
    """Descriptor forward in eval mode (frozen BN) for validation loss."""

    @jax.jit
    def eval_fn(params, batch_stats, pixels):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        B, T, H, W, C = pixels.shape
        desc = model.apply(variables, pixels.reshape(B * T, H, W, C))
        return desc.reshape(B, T, -1)

    return eval_fn


def tuples_to_batch(images: np.ndarray, n_neg: int) -> Tuple[np.ndarray, np.ndarray]:
    """images: [B, 2+n_neg, H, W, C] (q, p, negs) -> (pixels, labels)."""
    B, T = images.shape[:2]
    assert T == 2 + n_neg
    labels = np.zeros((B, T), np.int32)
    labels[:, 1] = 1
    labels[:, 2:] = -1
    return images, labels


def train_epoch(
    state: TrainState,
    train_step,
    batches,
) -> Tuple[TrainState, float]:
    """Run one epoch over an iterable of (pixels, labels) host batches."""
    losses = []
    for pixels, labels in batches:
        state, loss = train_step(state, jnp.asarray(pixels), jnp.asarray(labels))
        losses.append(float(loss))
    return state, float(np.mean(losses)) if losses else 0.0
