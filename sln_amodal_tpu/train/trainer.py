"""Jitted train step + training loop, data-parallel over a device mesh.

The TPU-native replacement for the reference's Python step loop
(``/root/reference/model.py:304-462``): one compiled program per stage that
does forward → 6 losses → grads → clip → SGD, batched over images, sharded
batch-first over the mesh's ``data`` axis. Gradients are averaged across
devices by XLA (the sharded program inserts the psum over ICI) — this is the
first-class replacement for the reference's dormant DataParallel machinery
(SURVEY.md §2.3).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.sln import SLNAmodal
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from ..utils.logging import StepTimer, log
from . import checkpoint as ckpt_lib
from . import losses as losses_lib
from .optim import StageSchedule, make_optimizer, trainable_mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def batched_losses(config: Config, out, batch) -> Dict[str, jnp.ndarray]:
    """Mean of the per-image 6-term loss over the batch dimension."""

    def per_image(rpn_logits, rpn_deltas, targets_ci, targets_valid,
                  targets_deltas, targets_masks, class_logits, bbox_deltas,
                  mask_logits, rpn_match, rpn_tgt):
        return losses_lib.total_loss(
            rpn_match=rpn_match,
            rpn_target_deltas=rpn_tgt,
            rpn_logits=rpn_logits,
            rpn_pred_deltas=rpn_deltas,
            target_class_ids=targets_ci,
            roi_valid=targets_valid,
            mrcnn_class_logits=class_logits,
            target_deltas=targets_deltas,
            mrcnn_pred_deltas=bbox_deltas,
            target_masks=targets_masks,
            mask_logits=mask_logits,
        )

    per = jax.vmap(per_image)(
        out.rpn_logits,
        out.rpn_deltas,
        out.targets.class_ids,
        out.targets.valid,
        out.targets.deltas,
        out.targets.masks,
        out.class_logits,
        out.bbox_deltas,
        out.mask_logits,
        batch["rpn_match"],
        batch["rpn_deltas"],
    )
    return {k: jnp.mean(v) for k, v in per.items()}


def make_train_step(model: SLNAmodal, config: Config,
                    tx: optax.GradientTransformation, trainable: Any = None):
    """One fused forward → losses → grad → update step.

    ``trainable`` (optional) is a boolean pytree over ``params`` marking the
    stage's trainable leaves (see :func:`optim.trainable_mask`). Frozen
    leaves are ``stop_gradient``-ed *inside* the loss, so JAX never traces
    their backward — the TPU-native equivalent of the reference setting
    ``requires_grad = False`` before training
    (``/root/reference/model.py:347-353``). Measured caveat: for the plain
    jitted step the mask changes NOTHING at the XLA level — the optimizer
    chain zeroes frozen grads before any consumer (``optim._zero_frozen``),
    so XLA already dead-code-eliminates the frozen backward (heads-stage
    step flops < all-stage flops with or without the mask). The mask earns
    its keep where grads stay live before the zeroing: under
    ``optax.MultiSteps`` accumulation the raw-grad accumulator defeats DCE
    and only the stop_gradient freeze elides the frozen backward. Either
    way the resulting update is bit-identical with or without the mask.
    All three facts are pinned by ``tests/test_stopgrad_freeze.py``.
    """
    if trainable is not None:
        def freeze(params):
            return jax.tree_util.tree_map(
                lambda p, m: p if m else jax.lax.stop_gradient(p),
                params, trainable)
    else:
        def freeze(params):
            return params

    def loss_fn(params, rng, batch):
        out = model.apply(
            freeze(params),
            rng,
            batch["images"],
            batch["gt_class_ids"],
            batch["gt_boxes"].astype(jnp.float32),
            batch["gt_masks"].astype(jnp.float32),
            method=SLNAmodal.train_step_outputs,
        )
        losses = batched_losses(config, out, batch)
        return losses["total"], losses

    def train_step(state: TrainState, rng, batch):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), losses

    return train_step


class Trainer:
    """Orchestrates staged training (the reference's ``train_model``)."""

    def __init__(self, config: Config, variables: Any,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 checkpoint_dir: Optional[str] = None):
        self.config = config
        self.model = SLNAmodal(config)
        self.variables = variables
        self.mesh = mesh if mesh is not None else make_mesh()
        self.checkpoint_dir = checkpoint_dir
        self.epoch = 0
        self.last_state: Optional[TrainState] = None  # full state after the last epoch
        self._jit_val_loss = None  # compiled once, reused across validate()

    def _to_global(self, batch):
        """Multi-host: assemble this process's local batch into global
        batch-sharded arrays (parallel/multihost.py). Single process — the
        common case — passes batches through untouched (jit's in_shardings
        place them)."""
        if jax.process_count() == 1:
            return batch
        leaves = jax.tree_util.tree_leaves(batch)
        if leaves and isinstance(leaves[0], jax.Array) \
                and not leaves[0].is_fully_addressable:
            return batch  # already global (the device-prep SPMD path)
        from ..parallel.multihost import global_batch
        return global_batch(batch, self.mesh)

    def _make_tx(self, stage, learning_rate: float,
                 accumulate_steps: int = 1) -> optax.GradientTransformation:
        cfg = self.config
        tx = make_optimizer(
            self.variables, stage, learning_rate,
            momentum=cfg.learning_momentum, weight_decay=cfg.weight_decay,
            clip_norm=cfg.gradient_clip_norm,
        )
        if accumulate_steps > 1:
            # the reference steps the optimizer every BATCH_SIZE micro-batches
            # (model.py:442-448); MultiSteps is the jit-native equivalent.
            tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
        return tx

    def train_stage(self, loader: Iterable, stage: str, learning_rate: float,
                    epochs: int, steps_per_epoch: Optional[int] = None,
                    seed: int = 0, on_epoch_end=None,
                    accumulate_steps: int = 1,
                    resume_state_path: Optional[str] = None,
                    start_epoch: int = 0) -> Dict[str, float]:
        cfg = self.config
        steps = steps_per_epoch or cfg.steps_per_epoch
        tx = self._make_tx(stage, learning_rate, accumulate_steps)
        opt_state = tx.init(self.variables)
        state = TrainState(self.variables, opt_state, jnp.zeros((), jnp.int32))
        if resume_state_path is not None:
            # mid-stage resume: params + momentum + step counter all continue
            state = ckpt_lib.restore_train_state(resume_state_path, state)
            self.variables = state.params

        step_fn = make_train_step(
            self.model, cfg, tx, trainable=trainable_mask(self.variables, stage))
        if len(self.mesh.devices.reshape(-1)) > 1:
            data_sh = batch_sharding(self.mesh)
            repl = replicate(self.mesh)
            jit_step = jax.jit(
                step_fn,
                in_shardings=(repl, repl, data_sh),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        else:
            # Single device: explicit NamedShardings are pure overhead — and
            # on the experimental axon TPU platform they are pathological
            # (measured 140 ms/step plain vs >20 s/step sharded).
            jit_step = jax.jit(step_fn, donate_argnums=(0,))

        base_rng = jax.random.PRNGKey(seed)
        timer = StepTimer()
        last: Dict[str, float] = {}
        it = iter(loader)
        stage_name = stage if isinstance(stage, str) else "custom-mask"
        for epoch in range(start_epoch, epochs):
            log(f"Stage '{stage_name}' epoch {epoch + 1}/{epochs} lr={learning_rate}")
            # per-epoch rng derived from the epoch index so a killed run
            # resumed at epoch k draws the same keys an uninterrupted run did
            rng = jax.random.fold_in(base_rng, epoch)
            for step in range(steps):
                batch = self._to_global(next(it))
                rng, sub = jax.random.split(rng)
                state, losses = jit_step(state, sub, batch)
                if step % 50 == 0 or step == steps - 1:
                    last = {k: float(v) for k, v in losses.items()}
                    dt = timer.tick()
                    log(
                        f"  step {step + 1}/{steps} "
                        + " ".join(f"{k}={v:.4f}" for k, v in sorted(last.items()))
                        + f" ({dt:.2f}s)"
                    )
            self.epoch += 1
            self.variables = state.params
            self.last_state = state
            if on_epoch_end is not None:
                on_epoch_end(self.epoch, self.variables)
        self.variables = state.params
        return last

    def validate(self, loader: Iterable, steps: Optional[int] = None,
                 seed: int = 1) -> Dict[str, float]:
        """Mean losses over validation batches, no parameter updates.

        (The reference defines VALIDATION_STEPS but its loop never validates
        — config.py:54; this is the working superset.)
        """
        cfg = self.config
        steps = steps or cfg.validation_steps

        if self._jit_val_loss is None:
            def loss_fn(params, rng, batch):
                out = self.model.apply(
                    params, rng, batch["images"], batch["gt_class_ids"],
                    batch["gt_boxes"].astype(jnp.float32),
                    batch["gt_masks"].astype(jnp.float32),
                    method=type(self.model).train_step_outputs,
                )
                return batched_losses(cfg, out, batch)

            if len(self.mesh.devices.reshape(-1)) > 1:
                # shard validation exactly like the train step — otherwise a
                # >1-device mesh silently validates on one device with
                # replicated data (round-2 review finding)
                repl, data_sh = replicate(self.mesh), batch_sharding(self.mesh)
                self._jit_val_loss = jax.jit(
                    loss_fn, in_shardings=(repl, repl, data_sh))
            else:
                self._jit_val_loss = jax.jit(loss_fn)
        jit_loss = self._jit_val_loss
        rng = jax.random.PRNGKey(seed)
        totals: Dict[str, float] = {}
        it = iter(loader)
        for _ in range(steps):
            batch = self._to_global(next(it))
            rng, sub = jax.random.split(rng)
            losses = jit_loss(self.variables, sub, batch)
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        return {k: v / steps for k, v in totals.items()}

    def train(self, loader: Iterable, steps_per_epoch: Optional[int] = None,
              sticky_freeze: bool = False, on_epoch_end=None,
              resume_epoch: int = 0,
              resume_state_path: Optional[str] = None) -> None:
        """The reference 3-stage schedule. ``sticky_freeze=True`` reproduces
        the reference's effective behavior (each stage can only shrink the
        trainable set — i.e. heads-only throughout).

        ``resume_epoch`` skips the first N global epochs (the capability the
        reference's broken epoch-regex never delivered, model.py:246-249):
        fully-completed stages are skipped, and when the target lands
        mid-stage, ``resume_state_path`` (a ``.state`` file saved by
        :func:`checkpoint.save_train_state`) restores optimizer momentum and
        the step counter too. At a stage boundary only params carry over —
        exactly what a fresh stage does anyway (each stage re-inits its
        optimizer). ``self.variables`` must already hold the resumed params.
        """
        sched = StageSchedule(self.config.learning_rate, sticky_freeze)
        done = resume_epoch
        self.epoch = resume_epoch
        for idx, (stage, lr, epochs) in enumerate(sched.stages):
            if done >= epochs:
                done -= epochs
                continue
            mask = sched.stage_mask(self.variables, idx) if sticky_freeze else stage
            self.train_stage(
                loader, mask, lr, epochs, steps_per_epoch,
                on_epoch_end=on_epoch_end,
                resume_state_path=(resume_state_path if done > 0 else None),
                start_epoch=done,
            )
            done = 0
            resume_state_path = None
