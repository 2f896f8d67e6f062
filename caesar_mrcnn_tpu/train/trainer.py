"""Optimizer, layer freezing, train step, training loop.

Re-design of the reference's compile/train machinery
(reference: mrcnn/model.py:2255-2517):

* the ``optimizer`` config knob is honored (SGD+momentum or Adam) — the
  reference declared ``OPTIMIZER='ADAM'`` but its compile hard-coded SGD
  (reference: mrcnn/model.py:2260-2262 vs scripts/run.py:193);
* gradient clip-norm 5.0 (reference: mrcnn/model.py:2261);
* decoupled weight decay on conv/dense kernels, excluding BN scale/bias
  and biases (the reference added keras L2 on all weights except
  gamma/beta, mrcnn/model.py:2283-2290; wd = 2*l2_lambda equivalence);
* layer-freeze stage selectors ``heads|3+|4+|5+|all`` via param-path
  masking (reference regexes: mrcnn/model.py:2432-2443);
* data-parallel train step: batch sharded over the mesh, params
  replicated, XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import re
import time
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import logger
from ..config import Config
from ..models.losses import compute_losses
from ..models.mask_rcnn import MaskRCNN, forward_train
from ..models.meta import parse_image_meta_jax
from ..parallel.mesh import batch_sharding, replicated

# --------------------------------------------------------------- freezing

# Training-stage selectors (reference: mrcnn/model.py:2432-2443). A param
# path is trainable when any of its stage patterns matches.
_STAGE_PATTERNS = {
    "heads": [r"^fpn\b|/fpn|fpn_", r"rpn", r"classifier_head", r"mask_head"],
    "3+": [r"res3", r"res4", r"res5", r"^fpn\b|/fpn|fpn_", r"rpn", r"classifier_head", r"mask_head"],
    "4+": [r"res4", r"res5", r"^fpn\b|/fpn|fpn_", r"rpn", r"classifier_head", r"mask_head"],
    "5+": [r"res5", r"^fpn\b|/fpn|fpn_", r"rpn", r"classifier_head", r"mask_head"],
    "all": [r".*"],
}


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def trainable_mask(params, layers: str):
    """Boolean pytree: True = trainable under the stage selector."""
    pats = [re.compile(p) for p in _STAGE_PATTERNS[layers]]

    def decide(path, _):
        s = _path_str(path)
        return any(p.search(s) for p in pats)

    return jax.tree_util.tree_map_with_path(decide, params)


def decay_mask(params):
    """True where decoupled weight decay applies: kernels only, never BN
    scale/bias or biases."""

    def decide(path, _):
        s = _path_str(path)
        return s.endswith("kernel") and "bn" not in s.lower() and "BatchNorm" not in s

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(config: Config, params, layers: str = "all") -> optax.GradientTransformation:
    acc_dtype = getattr(config, "opt_state_dtype", "float32")
    acc = None if acc_dtype in ("float32", "", None) else jnp.dtype(acc_dtype)
    if config.optimizer.lower() == "adam":
        opt = optax.adam(config.learning_rate, mu_dtype=acc)
    elif config.optimizer.lower() == "sgd":
        opt = optax.sgd(
            config.learning_rate,
            momentum=config.learning_momentum,
            accumulator_dtype=acc,
        )
    else:
        raise ValueError(f"unknown optimizer {config.optimizer}")
    chain = [
        optax.clip_by_global_norm(config.gradient_clip_norm),
        optax.add_decayed_weights(2.0 * config.weight_decay, mask=decay_mask(params)),
        opt,
    ]
    tx = optax.chain(*chain)
    if layers != "all":
        mask = trainable_mask(params, layers)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask),
        )
    k = getattr(config, "grad_accum_steps", 1)
    if k and k > 1:
        # Average grads over k micro-batches, apply one update — an
        # effective batch of k*batch_size without the activation memory
        # (config.grad_accum_steps). Exactness for equal-size
        # micro-batches is per-loss mean-of-means; tested in
        # tests/test_train.py.
        tx = optax.MultiSteps(tx, every_k_schedule=int(k))
    return tx


# ------------------------------------------------------------- train state


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    config: Config, variables: Dict, layers: str = "all"
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, params, layers)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state), tx


# --------------------------------------------------------------- train step


def _unpackbits(packed: jnp.ndarray, count: int) -> jnp.ndarray:
    """np.packbits inverse (big-endian bit order) for on-device mask
    reconstruction; jnp has no unpackbits."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (-1,))[..., :count]


def mold_batch(batch: Dict, cfg: Config) -> Dict:
    """Device-side molding of the wire formats (see generator.make_sample
    and config.train_wire): cast images to f32 and subtract the pixel mean
    (reference mold_image: mrcnn/model.py:2964-2969), and for the compact
    wire reconstruct dense RPN targets (scatter of positive/negative index
    lists; out-of-range pads drop), unpack bit-packed GT masks, and
    broadcast mono images back to the configured channel count. Runs
    inside jit, so everything fuses with the first consumers. Dense
    batches (externally built) are detected by key and pass through the
    legacy casts."""
    b = dict(batch)
    images = batch["images"]
    if images.shape[-1] == 1 and cfg.image_shape[2] != 1:
        images = jnp.broadcast_to(images, images.shape[:-1] + (cfg.image_shape[2],))
    b["images"] = images.astype(jnp.float32) - jnp.asarray(
        cfg.mean_pixel, jnp.float32
    )
    if "rpn_pos_idx" in batch:
        from ..utils.anchors import get_anchors

        a = get_anchors(cfg).shape[0]
        pos, neg = batch["rpn_pos_idx"], batch["rpn_neg_idx"]

        def scatter_match(p, n):
            m = jnp.zeros((a,), jnp.int32)
            m = m.at[n].set(-1, mode="drop")
            return m.at[p].set(1, mode="drop")

        def scatter_deltas(p, v):
            return jnp.zeros((a, 4), jnp.float32).at[p].set(v, mode="drop")

        b["rpn_match"] = jax.vmap(scatter_match)(pos, neg)
        b["rpn_deltas"] = jax.vmap(scatter_deltas)(pos, batch["rpn_pos_deltas"])
        del b["rpn_pos_idx"], b["rpn_neg_idx"], b["rpn_pos_deltas"]
    else:
        b["rpn_match"] = batch["rpn_match"].astype(jnp.int32)
    if "gt_masks_packed" in batch:
        mh, mw = (
            tuple(cfg.mini_mask_shape)
            if cfg.use_mini_mask
            else tuple(cfg.image_shape[:2])
        )
        g = cfg.max_gt_instances
        bits = _unpackbits(batch["gt_masks_packed"], mh * mw * g)
        b["gt_masks"] = bits.reshape(bits.shape[:-1] + (mh, mw, g)).astype(jnp.float32)
        del b["gt_masks_packed"]
    else:
        b["gt_masks"] = batch["gt_masks"].astype(jnp.float32)
    return b


def make_train_step(
    model: MaskRCNN,
    tx: optax.GradientTransformation,
    anchors: np.ndarray,
    mesh=None,
    class_weights: Optional[np.ndarray] = None,
) -> Callable:
    """Build the jitted train step.

    When ``mesh`` is provided the step is compiled with the batch sharded
    over the ``data`` axis and params/opt-state replicated — the
    data-parallel gradient psum happens inside XLA over ICI.

    ``class_weights`` [C] enables class-weighted head classification loss
    (reference: scripts/run.py:785-815 -> mrcnn/model.py:2498).

    If the batch carries a ``"rois"`` key, those external ROIs replace the
    RPN proposal path (reference USE_RPN_ROIS=False mode,
    mrcnn/model.py:2066-2078).

    When ``config.train_bn``, BatchNorm running statistics are updated
    each step and threaded through ``TrainState.batch_stats``
    (reference TRAIN_BN: mrcnn/model.py:57-72, config.py:216).
    """
    cfg = model.config
    anchors = jnp.asarray(anchors)
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        batch = mold_batch(batch, cfg)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outputs, new_stats = forward_train(
                model,
                variables,
                rng,
                batch["images"],
                batch["gt_class_ids"],
                batch["gt_boxes"],
                batch["gt_masks"],
                anchors,
                ext_rois=batch.get("rois"),
            )
            meta = parse_image_meta_jax(batch["image_meta"])
            losses = compute_losses(
                outputs,
                batch["rpn_match"],
                batch["rpn_deltas"],
                meta["active_class_ids"],
                cfg,
                class_weights=cw,
            )
            return losses["total_loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        batch_stats = new_stats if (cfg.train_bn and new_stats) else state.batch_stats
        new_state = TrainState(state.step + 1, params, batch_stats, opt_state)
        return new_state, losses

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(
    model: MaskRCNN,
    anchors: np.ndarray,
    mesh=None,
    class_weights: Optional[np.ndarray] = None,
) -> Callable:
    """Forward-only loss computation for validation batches
    (reference: mrcnn/model.py:2446-2451, 2487-2499 validation_data)."""
    cfg = model.config
    anchors = jnp.asarray(anchors)
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def eval_fn(state: TrainState, batch: Dict, rng: jax.Array):
        batch = mold_batch(batch, cfg)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs, _ = forward_train(
            model,
            variables,
            rng,
            batch["images"],
            batch["gt_class_ids"],
            batch["gt_boxes"],
            batch["gt_masks"],
            anchors,
            ext_rois=batch.get("rois"),
        )
        meta = parse_image_meta_jax(batch["image_meta"])
        return compute_losses(
            outputs,
            batch["rpn_match"],
            batch["rpn_deltas"],
            meta["active_class_ids"],
            cfg,
            class_weights=cw,
        )

    if mesh is None:
        return jax.jit(eval_fn)

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, data, rep), out_shardings=rep)


# ------------------------------------------------------------------- loop


def train_loop(
    model: MaskRCNN,
    state: TrainState,
    train_step: Callable,
    batches: Iterator[Dict],
    steps: int,
    rng: jax.Array,
    log_every: int = 50,
    callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Run ``steps`` optimizer steps; returns final state + last losses."""
    history: Dict[str, float] = {}
    t_mark = time.time()
    i_mark = 0
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        batch = next(batches)
        state, losses = train_step(state, batch, sub)
        if (i + 1) % log_every == 0 or i == steps - 1:
            history = {k: float(v) for k, v in losses.items()}
            now = time.time()
            # interval rate, not cumulative average: the first interval
            # absorbs the compile, later ones show the steady state
            rate = (now - t_mark) / max(i + 1 - i_mark, 1)
            t_mark, i_mark = now, i + 1
            logger.info(
                "step %d/%d loss=%.4f (%.2f s/step) %s",
                i + 1,
                steps,
                history.get("total_loss", float("nan")),
                rate,
                {k: round(v, 4) for k, v in history.items() if k != "total_loss"},
            )
            if callback is not None:
                callback(i + 1, history)
    return state, history
