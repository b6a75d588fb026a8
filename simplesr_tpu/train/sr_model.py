"""SRModel: the training state machine.

API parity with reference models/sr_model.py:12-740 — same constructor
surface and lifecycle (init / train_step / validation_step / test_and_plot /
before_epoch / after_train_batch / after_validation_batch / after_epoch /
after_training), checkpoints keep-5 saved only on a new best tracked metric,
best-checkpoint restore on early stop and at end of training, whole-model
saves every epoch plus "best", four TensorBoard writers, batch/epoch metric
histories.

TPU-native redesign of the hot path: the reference's two-GradientTape
simultaneous G/D update (sr_model.py:403-453) becomes ONE jitted, donated
function that differentiates a combined scalar

    total = gen_loss(G(θg), D(stop_grad(θd), ·)) +
            disc_loss(D(θd, stop_grad(G(θg)(lr))), labels)

w.r.t. (θg, θd): the stop_gradients reproduce exactly the two-tape gradient
flow (gen grads never touch θd, disc grads never flow into G), XLA CSEs the
identical discriminator primal forwards, and both optimizer updates + image
metrics + BatchNorm running-stat updates fuse into one device program. The
train loop stays fully async — metric scalars are folded lazily on host.

Checkpointing is Orbax (SURVEY.md §5): state pytree = {step, best metric,
G/D params, BatchNorm stats, optimizer states}, max_to_keep=5.
"""

import os
from pathlib import Path
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from simplesr_tpu.ops import metrics as image_metrics_lib
from simplesr_tpu.ops.resize import resize as _resize
from simplesr_tpu.train.early_stopping import EarlyStopping
from simplesr_tpu.train.metrics import MetricBundle
from simplesr_tpu.train.optimizers import build_optimizer
from simplesr_tpu.train import serialization


# Live Orbax managers by checkpoint path (this process). With async
# checkpointing a write can still be in flight when ANOTHER SRModel over the
# same directory reads (fresh-instance resume, GAN warm start from an
# in-process pretrain) — waiting on the reader's own manager can't help, so
# readers look the writer's manager up here and wait on IT. Cross-process
# readers must rely on training ending properly (after_training waits);
# Orbax commits atomically either way, so a mid-flight read sees "no
# checkpoint", never a corrupt one.
_LIVE_CKPT_MANAGERS = {}


@struct.dataclass
class SRTrainState:
    """The full training state pytree (checkpointed as-is)."""
    step: jnp.ndarray
    best_metric: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    g_ema_params: Any  # {} when EMA tracking is off
    d_params: Any
    d_batch_stats: Any
    d_opt_state: Any
    rng: Any


class SRModel:
    def __init__(self,
                 model_type,
                 generator,
                 generator_optimizer="Adam",
                 generator_optimizer_config=None,
                 discriminator=None,
                 discriminator_optimizer=None,
                 discriminator_optimizer_config=None,
                 image_metrics=None,
                 early_stop_metric="psnr",
                 early_stop_patience=100,
                 epoch_train_summary_writer=None,
                 batch_train_summary_writer=None,
                 epoch_validation_summary_writer=None,
                 batch_validation_summary_writer=None,
                 resnet_checkpoint=None,
                 config=None,
                 seed=0,
                 mesh=None,
                 skip_nonfinite_updates=True,
                 tb_batch_interval=50,
                 ema_decay=None,
                 ema_eval=False,
                 grad_accum_steps=None,
                 fsdp=False,
                 distill=None,
                 async_checkpointing=True,
                 tensor_parallel=False,
                 pipeline_parallel=False,
                 pipeline_microbatches=None,
                 paired_ways=None):
        if model_type.lower() not in ("gan", "resnet"):
            raise ValueError("model type not recognized")
        if generator is None:
            raise ValueError("no generator was supplied")
        if generator_optimizer is None and resnet_checkpoint is None:
            raise ValueError("no generator optimizer was supplied")
        if model_type.lower() == "gan" and discriminator is None:
            raise ValueError("model type is GAN but no discriminator supplied")
        if model_type.lower() == "gan" and discriminator_optimizer is None:
            raise ValueError("model type is GAN but no discriminator optimizer supplied")
        if model_type.lower() == "resnet" and discriminator is not None:
            raise ValueError("model type is Resnet but discriminator was supplied")

        self._model_type = model_type.lower()
        self.name = model_type
        # placement attrs exist before any state restore can run (the
        # resnet_checkpoint warm start below calls _place_state); the mesh
        # block further down fills them in
        self._mesh = None
        self._fsdp = bool(fsdp)
        self._state_sharding = None
        self._epochs = 0
        self._iterations = 0
        self._tb_batch_interval = tb_batch_interval
        self._epoch_train_summary_writer = epoch_train_summary_writer
        self._batch_train_summary_writer = batch_train_summary_writer
        self._epoch_validation_summary_writer = epoch_validation_summary_writer
        self._batch_validation_summary_writer = batch_validation_summary_writer

        self._model_dir = "./models"
        self._checkpoint_dir = "./checkpoints"
        self._config = config
        if config is not None:
            if getattr(config, "model_dir", None):
                self._model_dir = config.model_dir
            if getattr(config, "checkpoint_dir", None):
                self._checkpoint_dir = config.checkpoint_dir

        self._generator = generator
        self._g_tx = build_optimizer(generator_optimizer, generator_optimizer_config)
        self._generator_optimizer_config = generator_optimizer_config

        self._discriminator = discriminator
        self._d_tx = None
        self._discriminator_optimizer_config = discriminator_optimizer_config
        if self._model_type == "gan":
            self._d_tx = build_optimizer(discriminator_optimizer,
                                         discriminator_optimizer_config)

        # Divergence guard: the reference documents RRDB training collapsing
        # to black images with "restart training" as the recovery procedure
        # (reference README.md:97-106; SURVEY.md §5). Wrapping the optimizers
        # in optax.apply_if_finite silently drops steps with non-finite
        # gradients instead of poisoning the params.
        # Gradient accumulation (beyond-reference knob, companion to the
        # generator's `remat:` flag): k micro-batches accumulate into one
        # averaged optimizer update — the effective batch is k× what fits in
        # HBM at once. BatchNorm stats still update per micro-batch
        # (standard; equals training at the micro-batch size). The EMA
        # shadow advances only on macro boundaries so its decay stays
        # per-*update* (see _build_train_step).
        if grad_accum_steps is not None and int(grad_accum_steps) < 1:
            raise ValueError(
                f"grad_accum_steps must be >= 1, got {grad_accum_steps}")
        self._grad_accum = 1 if grad_accum_steps is None else int(grad_accum_steps)
        if self._grad_accum > 1:
            import optax
            self._g_tx = optax.MultiSteps(self._g_tx,
                                          every_k_schedule=self._grad_accum)
            if self._d_tx is not None:
                self._d_tx = optax.MultiSteps(self._d_tx,
                                              every_k_schedule=self._grad_accum)

        # apply_if_finite wraps OUTSIDE MultiSteps: it screens the incoming
        # micro-gradients, so a non-finite micro-batch is dropped before the
        # accumulator sees it (MultiSteps zeroes acc_grads by multiplication,
        # so a NaN reaching it would poison every later macro update —
        # measured; tests/train/test_grad_accum.py). A dropped micro-step
        # doesn't advance the accumulation counter: the macro update simply
        # waits for the next finite micro-batch.
        if skip_nonfinite_updates:
            import optax
            self._g_tx = optax.apply_if_finite(self._g_tx, max_consecutive_errors=100)
            if self._d_tx is not None:
                self._d_tx = optax.apply_if_finite(self._d_tx, max_consecutive_errors=100)

        # EMA shadow of the generator params (beyond-reference knob; the
        # ESRGAN lineage ships EMA'd generators). Initialized AT the params
        # (no zero-init bias), updated inside the fused train step, and
        # saved alongside the raw weights by after_training/save_model.
        if ema_decay is not None and not 0.0 < float(ema_decay) < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        self._ema_decay = None if ema_decay is None else float(ema_decay)
        if ema_eval and self._ema_decay is None:
            raise ValueError("ema_eval=True requires ema_decay")
        self._ema_eval = bool(ema_eval)

        # ---------------------------------------------------------- state
        g_vars = dict(generator.variables)
        g_params = g_vars.pop("params")
        g_stats = g_vars.pop("batch_stats", {})
        d_params, d_stats, d_opt = {}, {}, ()
        if self._model_type == "gan":
            d_vars = dict(discriminator.variables)
            d_params = d_vars.pop("params")
            d_stats = d_vars.pop("batch_stats", {})
            d_opt = self._d_tx.init(d_params)
        # copies, not aliases — the train step donates the state buffers
        g_ema = jax.tree_util.tree_map(jnp.array, g_params) \
            if self._ema_decay is not None else {}
        self._state = SRTrainState(
            step=jnp.zeros((), jnp.int32),
            best_metric=jnp.asarray(-1.0, jnp.float32),
            g_params=g_params, g_batch_stats=g_stats,
            g_opt_state=self._g_tx.init(g_params), g_ema_params=g_ema,
            d_params=d_params, d_batch_stats=d_stats, d_opt_state=d_opt,
            rng=jax.random.key(seed),
        )

        if resnet_checkpoint is not None:
            # Warm-start the GAN generator from a pixel-pretrained run's
            # checkpoint directory (reference sr_model.py:158-167).
            self._restore_resnet_checkpoint(resnet_checkpoint)

        # ------------------------------------------------------ checkpoints
        # Async by default (TPU-native: Orbax snapshots the arrays to host
        # synchronously inside save() — safe against the donated state
        # buffers — then writes in a background thread, so the keep-5 save
        # overlaps the next epoch instead of stalling the loop). Every read
        # path below calls wait_until_finished() first, so restores/resume
        # always see a durable checkpoint.
        self._async_ckpt = bool(async_checkpointing)
        ckpt_path = os.path.abspath(os.path.join(self._checkpoint_dir, self._model_type))
        # keep-5-on-best manager (restore target for early stop / best saves)
        self._ckpt_mgr = self._open_ckpt_manager(ckpt_path, keep=5)
        # keep-1 LAST-state manager: written every epoch (and at preemption)
        # so an interrupted run resumes from its newest state, not its best
        self._resume_mgr = self._open_ckpt_manager(ckpt_path + "_resume",
                                                   keep=1)
        self._last_resume_step = None
        self._in_epoch = False

        # ---------------------------------------------------------- metrics
        self._image_metrics = image_metrics if image_metrics is not None else \
            dict(psnr=image_metrics_lib.psnr)
        # early stopping tracks a metric that must actually be computed;
        # auto-add it when it's one of the built-in image metrics
        if early_stop_metric not in self._image_metrics and \
                hasattr(image_metrics_lib, early_stop_metric):
            self._image_metrics[early_stop_metric] = getattr(
                image_metrics_lib, early_stop_metric)
        names = list(self._image_metrics)
        self._train_epoch_metrics = MetricBundle(names)
        self._valid_epoch_metrics = MetricBundle(names)
        self._batch_metrics = MetricBundle(names)

        self._train_batch_history = {}
        self._train_epoch_history = {}
        self._valid_batch_history = {}
        self._valid_epoch_history = {}

        self._early_stop_metric = early_stop_metric
        self._early_stop_patience = early_stop_patience
        self._early_stopping_util = EarlyStopping(
            metric_key=early_stop_metric, patience=early_stop_patience)

        # Optional device mesh: when set, the jitted steps carry SPMD
        # shardings — batches split on the data axis; XLA inserts the
        # gradient all-reduce over ICI (no reference counterpart: the
        # reference has no parallelism of any kind, SURVEY.md §2). State is
        # replicated by default; with fsdp=True every large param/opt/EMA
        # leaf is instead sharded across the SAME data axis (ZeRO-3: 1/N of
        # the weights and Adam moments per chip, all-gather at use,
        # reduce-scattered update — parallel/fsdp.py).
        self._mesh = mesh
        if mesh is not None:
            from simplesr_tpu.parallel.mesh import replicated
            if self._fsdp:
                from simplesr_tpu.parallel.fsdp import state_shardings
                self._state_sharding = state_shardings(mesh, self._state)
            else:
                self._state_sharding = replicated(mesh)
            self._state = jax.device_put(self._state, self._state_sharding)
        elif self._fsdp:
            raise ValueError("fsdp=True requires a device mesh (mesh=...)")

        # Tensor-parallel training (beyond-reference knob): the generator
        # forward inside the fused step runs channel-split over the mesh's
        # "model" axis (parallel/tensor.py — Megatron SRResNet or
        # all-column-parallel RRDB). The collectives have exact transposes,
        # so the backward pass shards the trunk FLOPs the same way; the
        # state pytree, checkpoints and optimizer are untouched (standard
        # param tree, replicated). Composes with a "data" batch axis.
        self._tp_fwd = None
        if tensor_parallel:
            from simplesr_tpu.parallel.tensor import tp_apply, MODEL_AXIS
            from simplesr_tpu.parallel.mesh import DATA_AXIS
            if self._mesh is None or MODEL_AXIS not in self._mesh.axis_names:
                raise ValueError(
                    "tensor_parallel=True requires a mesh with a "
                    f"'{MODEL_AXIS}' axis (e.g. make_mesh({{'data': d, "
                    "'model': t}}))")
            batch_axis = DATA_AXIS if DATA_AXIS in self._mesh.axis_names \
                else None
            # fails loudly here on unsupported modules / non-divisible
            # widths / BatchNorm (tp_apply validates)
            self._tp_fwd = tp_apply(generator.model(), self._mesh,
                                    batch_axis=batch_axis)

        # Pipeline-parallel training (beyond-reference knob): the generator
        # trunk is staged across the mesh's "stage" axis and microbatches
        # stream through the ring (parallel/pipeline.py — GPipe fill/drain
        # as one lax.scan + ppermute). jax.grad differentiates straight
        # through the scan, so the SAME schedule shards the backward trunk;
        # state pytree, optimizer and checkpoints are the standard tree
        # (replicated). Composes with a "data" batch axis (dp×pp).
        self._pp_fwd = None
        if pipeline_parallel:
            from simplesr_tpu.parallel.pipeline import (STAGE_AXIS,
                                                        pipeline_apply)
            from simplesr_tpu.parallel.mesh import DATA_AXIS
            if tensor_parallel:
                raise ValueError("pipeline_parallel and tensor_parallel are "
                                 "mutually exclusive (stage vs channel split "
                                 "of the same trunk)")
            if self._mesh is None or STAGE_AXIS not in self._mesh.axis_names:
                raise ValueError(
                    "pipeline_parallel=True requires a mesh with a "
                    f"'{STAGE_AXIS}' axis (e.g. make_mesh({{'data': d, "
                    "'stage': s}}))")
            n_stages = self._mesh.shape[STAGE_AXIS]
            m = int(pipeline_microbatches or n_stages)
            batch_axis = DATA_AXIS if DATA_AXIS in self._mesh.axis_names \
                else None
            # fails loudly here on non-SRResNet / BatchNorm / indivisible
            # trunks (pipeline_apply validates)
            self._pp_fwd = pipeline_apply(generator.model(), self._mesh,
                                          num_microbatches=m,
                                          batch_axis=batch_axis)

        # Paired-trunk training (beyond-reference knob, train/paired.py):
        # `ways` batch items pack into the channel dimension for the whole
        # generator forward inside the fused step, with every conv kernel
        # embedded block-diagonally as part of the trace. Exact — same loss,
        # same gradients, same parameter tree/checkpoints as unpaired — but
        # every conv (fwd + both grads) runs at ways·C channels, filling the
        # MXU's 128 lanes at C=64. BN-free SRResNet only; validation and
        # inference stay on the standard layout.
        self._paired_fwd = None
        self._paired_ways = 1
        if paired_ways is not None:
            if tensor_parallel or pipeline_parallel:
                raise ValueError(
                    "paired_ways is mutually exclusive with tensor_parallel/"
                    "pipeline_parallel (they re-lay-out the same trunk)")
            from simplesr_tpu.train.paired import paired_train_apply
            self._paired_fwd = paired_train_apply(generator.model(),
                                                  paired_ways)
            self._paired_ways = int(paired_ways)

        # Knowledge distillation (beyond-reference knob, train/distill.py):
        # a frozen teacher runs inside the fused step; its output is an
        # extra stop-gradiented target for the generator. Resolved last so
        # the teacher variables can ride the mesh replicated.
        self._distill = None
        if distill is not None:
            from simplesr_tpu.train.distill import build_distiller
            self._distill = build_distiller(
                distill,
                student_upsample_factor=generator.module_config().get(
                    "upsample_factor"),
                mesh=self._mesh)

        self._train_step_fn = None
        self._valid_step_fn = None

    # ================================================== jitted step builders

    def _g_apply(self, params, stats, x, train):
        if train and self._paired_fwd is not None:
            # packed-trunk layout (train/paired.py) — same params, exact
            # gradients; BN-free by construction so stats pass through
            return self._paired_fwd(params, x), stats
        if self._tp_fwd is not None:
            # channel-split forward; no BatchNorm by construction (tp_apply
            # rejects batch_norm=True), so train/eval are the same function
            return self._tp_fwd(params, x), stats
        if self._pp_fwd is not None:
            # stage-split forward; no BatchNorm by construction
            # (pipeline_apply rejects it), so train/eval are the same
            return self._pp_fwd(params, x), stats
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        module = self._generator.model()
        if train and stats:
            out, mut = module.apply(variables, x, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return module.apply(variables, x, train=train), stats

    def _d_apply(self, params, stats, x, train):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        module = self._discriminator.model()
        if train and stats:
            out, mut = module.apply(variables, x, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return module.apply(variables, x, train=train), stats

    def _image_metric_values(self, hr, sr):
        return {k: jnp.mean(fn(hr, sr)) for k, fn in self._image_metrics.items()}

    def _build_train_step(self):
        gan = self._model_type == "gan"
        gen = self._generator
        disc = self._discriminator
        g_tx, d_tx = self._g_tx, self._d_tx
        ema_decay = self._ema_decay
        grad_accum = self._grad_accum
        distiller = self._distill

        def loss_fn(both_params, state, lr, hr, key):
            g_params, d_params = both_params
            sr, g_stats = self._g_apply(g_params, state.g_batch_stats, lr, train=True)
            sr = jnp.asarray(sr, jnp.float32)

            sr_critic = hr_critic = None
            d_loss = 0.0
            d_metrics = {}
            d_stats = state.d_batch_stats
            if gan:
                # discriminator branch: grads flow into θd only
                sr_c_d, d_stats = self._d_apply(
                    d_params, d_stats, jax.lax.stop_gradient(sr), train=True)
                hr_c_d, d_stats = self._d_apply(d_params, d_stats, hr, train=True)
                d_loss, d_metrics = disc.calculate_loss(key, sr_c_d, hr_c_d)
                # generator branch: same primal, θd stopped (XLA CSEs the fwd)
                d_params_stopped = jax.lax.stop_gradient(d_params)
                sr_critic, _ = self._d_apply(d_params_stopped, state.d_batch_stats,
                                             sr, train=True)
                hr_critic, _ = self._d_apply(d_params_stopped, state.d_batch_stats,
                                             hr, train=True)

            g_loss, g_metrics = gen.calculate_loss(sr, hr, sr_critic, hr_critic)
            if distiller is not None:
                # teacher target: extra generator term, gradient-free on
                # the teacher side (train/distill.py)
                d_term, d_term_metrics = distiller.loss_terms(sr, lr)
                g_loss = g_loss + d_term
                g_metrics.update(d_term_metrics)
                g_metrics["generator_loss"] = g_loss
            total = g_loss + d_loss
            aux = dict(sr=sr, g_stats=g_stats, d_stats=d_stats,
                       g_metrics=g_metrics, d_metrics=d_metrics)
            return total, aux

        def train_step(state, lr, hr):
            key, new_rng = jax.random.split(state.rng)
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                (state.g_params, state.d_params), state, lr, hr, key)
            g_grads, d_grads = grads
            g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                                 state.g_params)
            g_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                              state.g_params, g_updates)
            d_params, d_opt_state = state.d_params, state.d_opt_state
            if gan:
                d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                                     state.d_params)
                d_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                  state.d_params, d_updates)
            g_ema = state.g_ema_params
            if ema_decay is not None:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    g_ema, g_params)
                if grad_accum > 1:
                    # advance only when MultiSteps applied the macro update,
                    # so the EMA decay stays per-update — micro-steps leave
                    # params unchanged and must not bleed the shadow toward
                    # them k× as fast. Gate on gradient_step CHANGING (not
                    # mini_step == 0): when apply_if_finite rejects a
                    # non-finite micro-batch right after a macro boundary,
                    # mini_step is still 0 but no update happened — the
                    # counter comparison stays False there.
                    def _ms(s):
                        # walk wrapper states (apply_if_finite) to MultiSteps
                        while not hasattr(s, "mini_step"):
                            s = s.inner_state
                        return s
                    applied = (_ms(g_opt_state).gradient_step !=
                               _ms(state.g_opt_state).gradient_step)
                    g_ema = jax.tree_util.tree_map(
                        lambda n, e: jnp.where(applied, n, e), new_ema, g_ema)
                else:
                    g_ema = new_ema
            img_metrics = self._image_metric_values(hr, aux["sr"])
            new_state = state.replace(
                step=state.step + 1,
                g_params=g_params, g_batch_stats=aux["g_stats"],
                g_opt_state=g_opt_state, g_ema_params=g_ema,
                d_params=d_params, d_batch_stats=aux["d_stats"],
                d_opt_state=d_opt_state, rng=new_rng)
            return new_state, dict(g=aux["g_metrics"], d=aux["d_metrics"],
                                   img=img_metrics)

        if self._mesh is not None:
            from simplesr_tpu.parallel.mesh import replicated
            repl = replicated(self._mesh)
            batch_sh = self._batch_sharding()
            # state rides its own sharding tree: replicated by default,
            # per-leaf ZeRO-3 shardings under fsdp=True
            return jax.jit(train_step, donate_argnums=(0,),
                           in_shardings=(self._state_sharding, batch_sh, batch_sh),
                           out_shardings=(self._state_sharding, repl))
        return jax.jit(train_step, donate_argnums=(0,))

    def _batch_sharding(self):
        """Batch inputs shard over the mesh's data axis; a mesh without one
        (e.g. pure tensor-parallel {'model': n}) replicates the batch."""
        from simplesr_tpu.parallel.mesh import (DATA_AXIS, data_sharding,
                                                replicated)
        if DATA_AXIS in self._mesh.axis_names:
            return data_sharding(self._mesh)
        return replicated(self._mesh)

    def _data_axis_size(self):
        from simplesr_tpu.parallel.mesh import DATA_AXIS
        if self._mesh is None:
            return 1
        return self._mesh.shape.get(DATA_AXIS, 1)

    def _build_valid_step(self):
        gan = self._model_type == "gan"
        gen = self._generator
        disc = self._discriminator
        # ema_eval: validate (and hence early-stop / select the best
        # checkpoint) on the EMA shadow — the weights actually shipped when
        # ema_decay is on — instead of the raw params
        use_ema = self._ema_eval and self._ema_decay is not None
        distiller = self._distill

        def valid_step(state, lr, hr, key):
            g_params = state.g_ema_params if use_ema else state.g_params
            sr, _ = self._g_apply(g_params, state.g_batch_stats, lr, train=False)
            sr = jnp.asarray(sr, jnp.float32)
            sr_critic = hr_critic = None
            d_metrics = {}
            if gan:
                sr_critic, _ = self._d_apply(state.d_params, state.d_batch_stats,
                                             sr, train=False)
                hr_critic, _ = self._d_apply(state.d_params, state.d_batch_stats,
                                             hr, train=False)
                _, d_metrics = disc.calculate_loss(key, sr_critic, hr_critic)
            g_loss, g_metrics = gen.calculate_loss(sr, hr, sr_critic, hr_critic)
            if distiller is not None:
                d_term, d_term_metrics = distiller.loss_terms(sr, lr)
                g_metrics.update(d_term_metrics)
                g_metrics["generator_loss"] = g_loss + d_term
            img_metrics = self._image_metric_values(hr, sr)
            return dict(g=g_metrics, d=d_metrics, img=img_metrics)

        if self._mesh is not None:
            from simplesr_tpu.parallel.mesh import replicated
            repl = replicated(self._mesh)
            batch_sh = self._batch_sharding()
            return jax.jit(valid_step,
                           in_shardings=(self._state_sharding, batch_sh,
                                         batch_sh, repl),
                           out_shardings=repl)
        return jax.jit(valid_step)

    # ========================================================== public steps

    def _fit_batch_to_mesh(self, lr_batch, hr_batch, train=False):
        """Under a data mesh the jitted steps shard the batch dimension, so
        B must divide the data-axis size — and under paired training the
        TRAIN batch must additionally divide `paired_ways`. Uneven final
        batches from the pipeline are trimmed to the largest usable multiple
        (the tf.data ``drop_remainder`` analogue) instead of dying with a
        raw XLA sharding error; a too-small batch is skipped entirely."""
        n = self._data_axis_size() if self._mesh is not None else 1
        if train:  # validation runs the standard (unpacked) forward
            n *= self._paired_ways
        if n == 1:
            return lr_batch, hr_batch
        b = lr_batch.shape[0]
        if b % n == 0:
            return lr_batch, hr_batch
        import logging
        keep = (b // n) * n
        if keep == 0:
            logging.getLogger("simple_sr").warning(
                "skipping batch of %d: smaller than the required multiple "
                "of %d (data mesh x paired ways)", b, n)
            return None, None
        logging.getLogger("simple_sr").warning(
            "trimming uneven batch %d -> %d to a multiple of %d "
            "(enable DataPipeline(drop_remainder=True) to avoid this)",
            b, keep, n)
        return lr_batch[:keep], hr_batch[:keep]

    def train_step(self, lr_batch, hr_batch):
        """One optimization step (reference sr_model.py:403-453)."""
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        lr_batch, hr_batch = self._fit_batch_to_mesh(lr_batch, hr_batch,
                                                     train=True)
        if lr_batch is None:
            return
        self._state, metrics = self._train_step_fn(
            self._state, jnp.asarray(lr_batch), jnp.asarray(hr_batch))
        self._generator.accumulate_metrics(metrics["g"], train=True)
        if self._model_type == "gan":
            self._discriminator.accumulate_metrics(metrics["d"], train=True)
        for k, v in metrics["img"].items():
            self._train_epoch_metrics.ensure(k)(v)
            self._batch_metrics.ensure(k)(v)

    def validation_step(self, lr_batch, hr_batch):
        """One validation pass (reference sr_model.py:455-480)."""
        if self._valid_step_fn is None:
            self._valid_step_fn = self._build_valid_step()
        lr_batch, hr_batch = self._fit_batch_to_mesh(lr_batch, hr_batch)
        if lr_batch is None:
            return
        key = jax.random.fold_in(jax.random.key(4711), self._iterations)
        metrics = self._valid_step_fn(self._state, jnp.asarray(lr_batch),
                                      jnp.asarray(hr_batch), key)
        self._generator.accumulate_metrics(metrics["g"], train=False)
        if self._model_type == "gan":
            self._discriminator.accumulate_metrics(metrics["d"], train=False)
        for k, v in metrics["img"].items():
            self._valid_epoch_metrics.ensure(k)(v)
            self._batch_metrics.ensure(k)(v)

    def test_and_plot(self, lr_batch, save_dir, step, hr_batch=None, file_path=None):
        """SR a batch and save an annotated comparison grid (reference
        sr_model.py:482-517)."""
        from simplesr_tpu.eval import rendering

        sr_batch = self.generate(lr_batch)
        fname = f"{str(self._epochs).zfill(5)}_{str(step).zfill(3)}"
        kwargs = {
            self._model_type: np.asarray(sr_batch),
            "bicubic": np.asarray(_resize(jnp.asarray(lr_batch),
                                          (sr_batch.shape[1], sr_batch.shape[2]),
                                          method="bicubic")),
        }
        if hr_batch is not None:
            kwargs["ground truth"] = np.asarray(hr_batch)
        save_dir = os.path.join(save_dir, self._model_type)
        if file_path is not None:
            fp = file_path[0] if isinstance(file_path, (list, tuple)) else file_path
            save_dir = os.path.join(save_dir, Path(str(fp)).parent.stem)
        rendering.prepare_image_grid(save_dir=save_dir, fname=fname,
                                     original=None, psnr=None,
                                     low_res_key=None, **kwargs)

    def generate(self, lr_batch, ema=False):
        """SR with the current generator params (eval mode). ``ema=True``
        uses the EMA shadow weights (requires ``ema_decay``)."""
        variables = {"params": self._ema_or_raw_params(ema)}
        if self._state.g_batch_stats:
            variables["batch_stats"] = self._state.g_batch_stats
        return self._generator.generate(lr_batch, variables=variables)

    def _ema_or_raw_params(self, ema):
        if not ema:
            return self._state.g_params
        if self._ema_decay is None:
            raise ValueError("EMA weights requested but the model was "
                             "built without ema_decay")
        return self._state.g_ema_params

    # ============================================================ lifecycle

    def before_epoch(self):
        """Reset epoch metrics, bump epoch counter (reference :554-561)."""
        self._reset_epoch_metrics()
        self._epochs += 1
        self._in_epoch = True

    def after_train_batch(self):
        """Log batch metrics to TB + history, reset (reference :519-529).

        Async-hot-path note: the step counter is tracked host-side and batch
        histories record the *raw device scalars* (materialized lazily at
        serialization time), so this hook never blocks on the device.
        Per-batch TensorBoard scalars — which do force a sync — are written
        every ``tb_batch_interval`` steps instead of every step."""
        self._iterations += 1
        if self._batch_train_summary_writer is not None and \
                self._tb_batch_interval and \
                self._iterations % self._tb_batch_interval == 0:
            self._log_batch_metrics_to_tb(train=True)
        self._update_history(self._combined_batch_metrics(lazy=True),
                             self._train_batch_history)
        self._reset_batch_metrics()

    def after_validation_batch(self):
        if self._batch_validation_summary_writer is not None and \
                self._tb_batch_interval and \
                self._iterations % self._tb_batch_interval == 0:
            self._log_batch_metrics_to_tb(train=False)
        self._update_history(self._combined_batch_metrics(lazy=True),
                             self._valid_batch_history)
        self._reset_batch_metrics()

    def after_epoch(self):
        """Save model, log epoch metrics, track best metric, maybe early-stop
        (restoring best checkpoint), save checkpoint on new best
        (reference :563-599)."""
        self.save_model(self._model_dir)
        self._log_epoch_metrics_to_tb(train=True)
        self._log_epoch_metrics_to_tb(train=False)
        self._update_epoch_history()

        tracked = self._valid_epoch_metrics.ensure(self._early_stop_metric).result()
        if np.isnan(tracked):  # no validation data → fall back to train metric
            tracked = self._train_epoch_metrics.ensure(self._early_stop_metric).result()
        # best_metric holds the RUNNING BEST of the tracked metric — the value
        # the best-checkpoint was saved at (reference sr_model.py:593-599) —
        # not the last epoch's value; a down-epoch must leave it unchanged.
        if not np.isnan(tracked) and \
                float(tracked) > float(self._state.best_metric):
            self._state = self._state.replace(
                best_metric=jnp.asarray(tracked, jnp.float32))

        if self._check_early_stopping():
            self._restore_latest_checkpoint()

        if self._early_stopping_util.num_epochs_after_best() == 0:
            self._ckpt_mgr.save(int(self._state.step),
                                args=self._ckpt_args_save())
            if not self._async_ckpt:
                self._ckpt_mgr.wait_until_finished()

        # last-state resume point (keep-1, async): an interrupted run
        # continues from HERE via resume_training(), not from the best
        self._in_epoch = False
        self._save_resume_point(self._epochs, blocking=not self._async_ckpt)

    def after_training(self):
        """Restore best checkpoint, save '*_best' model (reference :601-609);
        with EMA tracking on, also '*_best_ema'."""
        self._restore_latest_checkpoint()
        self.save_model(self._model_dir, postfix="best")
        if self._ema_decay is not None:
            self.save_model(self._model_dir, postfix="best_ema", ema=True)
        self._reset_epoch_metrics()

    # ========================================================= checkpointing

    def _ckpt_args_save(self):
        import orbax.checkpoint as ocp
        return ocp.args.StandardSave(self._state_for_ckpt())

    def _open_ckpt_manager(self, path, keep):
        """Open an Orbax manager, draining any other in-process instance's
        in-flight async write to the same directory first (see
        _LIVE_CKPT_MANAGERS)."""
        import orbax.checkpoint as ocp
        prev_mgr = _LIVE_CKPT_MANAGERS.get(path)
        if prev_mgr is not None:
            try:
                prev_mgr.wait_until_finished()
            except Exception:
                pass
        mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=self._async_ckpt),
        )
        _LIVE_CKPT_MANAGERS[path] = mgr
        return mgr

    def _state_for_ckpt(self):
        state = self._state
        # orbax can't serialize typed PRNG keys — store raw key data
        return state.replace(rng=jax.random.key_data(state.rng))

    def _restore_latest_checkpoint(self):
        self._ckpt_mgr.wait_until_finished()  # async saves must be durable
        step = self._ckpt_mgr.latest_step()
        if step is None:
            return
        self._restore_step(self._ckpt_mgr, step)

    def _restore_step(self, mgr, step):
        import orbax.checkpoint as ocp
        template = jax.device_get(self._state_for_ckpt())
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        self._state = self._place_state(restored.replace(
            rng=jax.random.wrap_key_data(restored.rng)))

    def _restore_resnet_checkpoint(self, checkpoint_dir):
        """Warm-start the generator from a pixel-pretrain run's checkpoint
        directory (reference :158-167 takes the restored generator and its
        optimizer wholesale). The optimizer state is carried over only when
        this run's optimizer has the same structure; otherwise — e.g. the
        pretrain used an LR schedule and the GAN stage doesn't — params,
        batch stats, step and best metric restore and the new optimizer
        starts fresh (the correct thing: a foreign opt state is meaningless
        to a different optimizer)."""
        import orbax.checkpoint as ocp
        target = os.path.abspath(checkpoint_dir)
        writer = _LIVE_CKPT_MANAGERS.get(target)
        if writer is not None:  # pretrain ran in this process — drain its
            try:               # in-flight async save before reading
                writer.wait_until_finished()
            except Exception:
                pass
        mgr = ocp.CheckpointManager(target)
        step = mgr.latest_step()
        if step is None:
            raise ValueError(f"no checkpoint found in {checkpoint_dir}")

        # Template mirrors a pixel-pretrain (resnet-mode) state: empty
        # discriminator slots, raw PRNG key data.
        template = jax.device_get(jax.tree_util.tree_map(np.asarray, {
            "step": self._state.step,
            "best_metric": self._state.best_metric,
            "g_params": self._state.g_params,
            "g_batch_stats": self._state.g_batch_stats,
            "g_opt_state": self._state.g_opt_state,
            "g_ema_params": self._state.g_ema_params,
            "d_params": {},
            "d_batch_stats": {},
            "d_opt_state": (),
            "rng": jax.random.key_data(self._state.rng),
        }))
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
            opt_state = restored["g_opt_state"]
        except ValueError:
            import logging
            logging.getLogger("simple_sr").warning(
                "resnet checkpoint optimizer state does not match this "
                "run's optimizer; warm-starting params only")
            # template-free restore yields the raw saved tree (nested dicts
            # of arrays) — exactly what g_params/g_batch_stats are; the
            # foreign opt state is discarded
            restored = mgr.restore(step, args=ocp.args.StandardRestore())
            opt_state = self._state.g_opt_state
        # re-seed the EMA shadow at the warm-start weights (fresh copies —
        # the train step donates state buffers)
        g_ema = jax.tree_util.tree_map(jnp.array, restored["g_params"]) \
            if self._ema_decay is not None else self._state.g_ema_params
        self._state = self._place_state(self._state.replace(
            step=jnp.asarray(restored["step"]),
            best_metric=jnp.asarray(restored["best_metric"]),
            g_params=restored["g_params"],
            g_batch_stats=restored["g_batch_stats"],
            g_opt_state=opt_state, g_ema_params=g_ema))
        mgr.close()

    def latest_checkpoint(self):
        """Latest checkpoint step + manager (reference returns the tf
        Checkpoint object, :226-240)."""
        self._ckpt_mgr.wait_until_finished()
        return self._ckpt_mgr.latest_step(), self._ckpt_mgr

    def resume(self):
        """Restore the latest checkpoint of this run's checkpoint directory
        (full state: params, optimizer, step, best metric, RNG). Returns the
        restored step or None if no checkpoint exists. Closes the reference's
        open 'load GAN checkpoint' TODO (sr_model.py:169)."""
        self._ckpt_mgr.wait_until_finished()
        step = self._ckpt_mgr.latest_step()
        if step is None:
            return None
        self._restore_latest_checkpoint()
        self._iterations = int(self._state.step)
        return step

    # ------------------------------------------ preemption-tolerant resume

    def _resume_meta_path(self):
        return os.path.join(self._checkpoint_dir,
                            f"{self._model_type}_resume_meta.json")

    def _save_resume_point(self, completed_epochs, blocking):
        """Write the keep-1 last-state checkpoint (if the step advanced) +
        the host-side meta sidecar (epoch counter, early-stop state, epoch
        histories) — everything resume_training() needs that the device
        state pytree doesn't carry."""
        step = int(self._state.step)
        if step != self._last_resume_step:
            self._resume_mgr.save(step, args=self._ckpt_args_save())
            self._last_resume_step = step
        self._write_resume_meta(completed_epochs)
        if blocking:
            self._resume_mgr.wait_until_finished()
            self._ckpt_mgr.wait_until_finished()

    def save_resume_point(self):
        """Durably checkpoint the CURRENT state for preemption (SIGTERM on
        a spot/preemptible TPU VM — train/training.py installs the handler).
        Blocks until both managers' writes are on disk. A mid-epoch call
        records the last COMPLETED epoch: the interrupted epoch is re-run
        on resume, continuing from the preempted state (its partial updates
        are kept — extra training, never lost work)."""
        completed = self._epochs - 1 if self._in_epoch else self._epochs
        self._save_resume_point(max(completed, 0), blocking=True)

    def _write_resume_meta(self, completed_epochs):
        import json

        def _floats(history):
            return {k: [float(v) for v in vs] for k, vs in history.items()}

        meta = {
            "completed_epochs": int(completed_epochs),
            "iterations": int(self._iterations),
            "model_type": self._model_type,
            "early_stop": self._early_stopping_util.state_dict(),
            "train_epoch_history": _floats(self._train_epoch_history),
            "valid_epoch_history": _floats(self._valid_epoch_history),
        }
        path = self._resume_meta_path()
        tmp = f"{path}.tmp{os.getpid()}"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)  # atomic: readers never see a partial file

    def _read_resume_meta(self):
        import json
        try:
            with open(self._resume_meta_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def resume_training(self):
        """Resume an interrupted run: restore the newest durable state (the
        per-epoch last-state resume point when present, else the best
        checkpoint) plus the host-side counters, early-stop state and epoch
        histories from the meta sidecar. Returns the number of COMPLETED
        epochs — run_training continues from there — or None when the
        checkpoint directory holds nothing to resume. Beyond-reference:
        the reference restarts preempted runs from scratch (its resume TODO,
        sr_model.py:169, was never implemented)."""
        self._ckpt_mgr.wait_until_finished()
        self._resume_mgr.wait_until_finished()
        resume_step = self._resume_mgr.latest_step()
        best_step = self._ckpt_mgr.latest_step()
        if resume_step is None and best_step is None:
            return None
        if resume_step is not None and (best_step is None
                                        or resume_step >= best_step):
            self._restore_step(self._resume_mgr, resume_step)
        else:
            self._restore_latest_checkpoint()
        self._iterations = int(self._state.step)
        self._last_resume_step = int(self._state.step)

        meta = self._read_resume_meta()
        if meta is None:
            import logging
            logging.getLogger("simple_sr").warning(
                "resume: checkpoint restored but no resume meta found — "
                "epoch counters and early-stop state start fresh (the "
                "restored weights act as a warm start)")
            return 0
        self._epochs = int(meta["completed_epochs"])
        self._iterations = int(meta.get("iterations", self._iterations))
        self._early_stopping_util.load_state_dict(meta["early_stop"])
        self._train_epoch_history = {
            k: list(v) for k, v in meta["train_epoch_history"].items()}
        self._valid_epoch_history = {
            k: list(v) for k, v in meta["valid_epoch_history"].items()}
        return self._epochs

    def save_model(self, save_path, postfix=None, ema=False):
        """Save the generator as a whole-model file (.h5 equivalent,
        reference :233-244). ``ema=True`` saves the EMA shadow weights."""
        if postfix is None:
            postfix = self._epochs
        variables = {"params": jax.device_get(self._ema_or_raw_params(ema))}
        if self._state.g_batch_stats:
            variables["batch_stats"] = jax.device_get(self._state.g_batch_stats)
        path = os.path.join(save_path,
                            f"{self._model_type}_gen_{postfix}{serialization.MODEL_EXT}")
        serialization.save_model(self._generator.module_config(), variables, path)
        return path

    # ============================================================== metrics

    def iterations(self):
        return self._iterations

    def stop_early(self):
        return self._early_stopping_util.stop_early()

    def generator(self):
        """The generator flax module (reference returns the Keras model)."""
        return self._generator.model()

    def generator_wrapper(self):
        return self._generator

    def discriminator_wrapper(self):
        return self._discriminator

    @property
    def state(self):
        return self._state

    def set_state(self, state):
        self._state = self._place_state(state)

    def _place_state(self, state):
        """Re-place a (possibly host-resident, e.g. checkpoint-restored)
        state pytree onto the mesh with this model's shardings — replicated,
        or per-leaf ZeRO-3 under fsdp=True. No-op without a mesh."""
        if self._state_sharding is None:
            return state
        return jax.device_put(state, self._state_sharding)

    @property
    def model_type(self):
        return self._model_type

    def histories(self):
        return dict(train_batch=self._train_batch_history,
                    train_epoch=self._train_epoch_history,
                    valid_batch=self._valid_batch_history,
                    valid_epoch=self._valid_epoch_history)

    def _combined_batch_metrics(self, lazy=False):
        if lazy:
            out = dict(self._batch_metrics.last_values())
            out.update(self._generator.batch_metrics().last_values())
            if self._model_type == "gan":
                out.update(self._discriminator.batch_metrics().last_values())
            return out
        out = dict(self._batch_metrics.results())
        out.update(self._generator.batch_metrics().results())
        if self._model_type == "gan":
            out.update(self._discriminator.batch_metrics().results())
        return out

    def _combined_epoch_metrics(self, train=True):
        own = self._train_epoch_metrics if train else self._valid_epoch_metrics
        out = dict(own.results())
        out.update(self._generator.epoch_metrics(train).results())
        if self._model_type == "gan":
            out.update(self._discriminator.epoch_metrics(train).results())
        return out

    def _log_batch_metrics_to_tb(self, train=True):
        writer = self._batch_train_summary_writer if train else \
            self._batch_validation_summary_writer
        if writer is None:
            return
        for name, value in self._combined_batch_metrics().items():
            writer.add_scalar(f"{name}_batch", value, self._iterations)

    def _log_epoch_metrics_to_tb(self, train=True):
        writer = self._epoch_train_summary_writer if train else \
            self._epoch_validation_summary_writer
        if writer is None:
            return
        for name, value in self._combined_epoch_metrics(train).items():
            writer.add_scalar(name, value, self._epochs)

    def _check_early_stopping(self):
        self._early_stopping_util.evaluate_stop_criterion(
            self._valid_epoch_history.get(self._early_stop_metric)
            or self._train_epoch_history.get(self._early_stop_metric, [float("-inf")]))
        return self.stop_early()

    def _update_epoch_history(self):
        self._update_history(self._combined_epoch_metrics(train=True),
                             self._train_epoch_history)
        self._update_history(self._combined_epoch_metrics(train=False),
                             self._valid_epoch_history)

    @staticmethod
    def _update_history(metrics, history):
        for name, value in metrics.items():
            history.setdefault(name, []).append(value)

    def _reset_epoch_metrics(self):
        self._train_epoch_metrics.reset()
        self._valid_epoch_metrics.reset()
        self._generator.reset_epoch_metrics()
        if self._model_type == "gan":
            self._discriminator.reset_epoch_metrics()

    def _reset_batch_metrics(self):
        self._batch_metrics.reset()
        self._generator.reset_batch_metrics()
        if self._model_type == "gan":
            self._discriminator.reset_batch_metrics()

    def formatted_epoch_metrics(self):
        train = self._format_metrics(True, "Training")
        valid = self._format_metrics(False, "Validation")
        return train + valid

    def _format_metrics(self, train, header):
        own = self._train_epoch_metrics if train else self._valid_epoch_metrics
        img = "".join(f"{k}: {v:.5f}\n" for k, v in own.results().items())
        gen = self._generator.formatted_epoch_metrics(train=train)
        out = f"{header}\n{img}Generator\n{gen}"
        if self._model_type == "gan":
            out += "Discriminator\n" + self._discriminator.formatted_epoch_metrics(train=train)
        return out

    def __str__(self):
        return (f"# SR Model\n"
                f"model type: {self._model_type}\n"
                f"generator optimizer config: {self._generator_optimizer_config}\n"
                f"discriminator optimizer config: {self._discriminator_optimizer_config}\n"
                f"image metrics: {list(self._image_metrics)}\n"
                f"early stop metric: {self._early_stop_metric}\n"
                f"early stop patience: {self._early_stop_patience}\n\n"
                f"{self._generator}\n{self._discriminator}")

    # ============================================================== factory

    @staticmethod
    def init(config, generator, generator_optimizer,
             generator_optimizer_config=None, discriminator=None,
             discriminator_optimizer=None, discriminator_optimizer_config=None,
             image_metrics=None):
        """Infer model type + pull early-stop/TB config from a ConfigUtil
        (reference sr_model.py:704-740). With ``config.data_parallel`` and
        more than one device, training shards over a data mesh;
        ``config.tensor_parallel: t`` additionally splits the generator's
        channels over a 'model' axis of size t (dp×tp when devices remain
        for a data axis)."""
        mesh = None
        fsdp = bool(getattr(config, "fsdp", False))
        tp = int(getattr(config, "tensor_parallel", 0) or 0)
        pp = int(getattr(config, "pipeline_parallel", 0) or 0)
        if tp > 1 and pp > 1:
            raise ValueError("tensor_parallel and pipeline_parallel are "
                             "mutually exclusive")
        if pp > 1:
            import jax as _jax
            from simplesr_tpu.parallel import make_mesh, STAGE_AXIS, DATA_AXIS
            ndev = len(_jax.devices())
            if ndev % pp != 0:
                raise ValueError(f"pipeline_parallel={pp} does not divide "
                                 f"the {ndev} visible devices")
            mesh = make_mesh({DATA_AXIS: ndev // pp, STAGE_AXIS: pp})
        elif tp > 1:
            import jax as _jax
            from simplesr_tpu.parallel import make_mesh, MODEL_AXIS, DATA_AXIS
            ndev = len(_jax.devices())
            if ndev % tp != 0:
                raise ValueError(f"tensor_parallel={tp} does not divide the "
                                 f"{ndev} visible devices")
            mesh = make_mesh({DATA_AXIS: ndev // tp, MODEL_AXIS: tp})
        elif getattr(config, "data_parallel", False) or fsdp:
            import jax as _jax
            if len(_jax.devices()) > 1:
                from simplesr_tpu.parallel import make_mesh
                mesh = make_mesh()
        if fsdp and mesh is None:
            # don't silently train with replicated state when the config
            # asked for sharded — the memory budget the user planned for
            # would be wrong without a trace
            import logging
            logging.getLogger("simple_sr").warning(
                "fsdp: true requested but only one device is visible — "
                "training with fully replicated state (no sharding)")
            fsdp = False
        model_type = "resnet" if discriminator is None else "gan"
        return SRModel(
            model_type=model_type, generator=generator,
            generator_optimizer=generator_optimizer,
            generator_optimizer_config=generator_optimizer_config,
            discriminator=discriminator,
            discriminator_optimizer=discriminator_optimizer,
            discriminator_optimizer_config=discriminator_optimizer_config,
            image_metrics=image_metrics,
            early_stop_metric=config.early_stop_metric,
            early_stop_patience=config.early_stop_patience,
            ema_decay=getattr(config, "ema_decay", None),
            ema_eval=getattr(config, "ema_eval", False),
            grad_accum_steps=getattr(config, "grad_accum_steps", None),
            fsdp=fsdp,
            distill=getattr(config, "distill", None),
            async_checkpointing=getattr(config, "async_checkpointing", True),
            tensor_parallel=tp > 1,
            pipeline_parallel=pp > 1,
            pipeline_microbatches=getattr(config, "pipeline_microbatches",
                                          None),
            paired_ways=getattr(config, "paired_train", None),
            epoch_train_summary_writer=config.epoch_train_summary_writer,
            batch_train_summary_writer=config.batch_train_summary_writer,
            epoch_validation_summary_writer=config.epoch_validation_summary_writer,
            batch_validation_summary_writer=config.batch_validation_summary_writer,
            config=config, mesh=mesh)
