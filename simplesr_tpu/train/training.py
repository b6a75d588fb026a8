"""Training operation: the epoch/batch driver loop.

Parity with reference operations/training.py:13-112 — epoch loop with early
stop, train + validation batch loops with after-batch hooks, periodic
test_and_plot on one train batch / one val batch / all test batches, epoch
timing + metric logging, JSON history dump, final PSNR/SSIM evaluation pass.

TPU notes: the device work is fully async — `train_step` dispatches the
jitted fused step and returns; the only forced syncs are the per-epoch metric
formats. `jax.profiler` trace capture can be enabled around the epoch loop
via `profile_dir` (the reference's perf logging analogue, SURVEY.md §5)."""

import os
import time
import logging

from simplesr_tpu.utils import logger as logger_mod
from simplesr_tpu.utils.train_result import TrainResult

log = logging.getLogger(logger_mod.RESULTS_LOGGER)


def run_training(config, data_pipeline, sr_model, plotting_interval=1,
                 profile_dir=None, resume=None):
    """Run a training session (see module docstring).

    Preemption tolerance (TPU-native addition — spot/preemptible TPU VMs
    get a SIGTERM before eviction): a SIGTERM during training finishes the
    in-flight batch, durably checkpoints the current state
    (SRModel.save_resume_point) and returns None. ``resume=True`` (or
    ``general.resume:`` in the YAML, see ConfigUtil.training_config)
    restores that state — params, optimizer, RNG, epoch counter,
    early-stop patience, epoch histories — and continues from the first
    unfinished epoch. Data order is re-derived from the pipeline seed, not
    checkpointed: the interrupted epoch is re-run from the preempted state."""
    _log_configurations(config, data_pipeline, sr_model)
    start_training = time.perf_counter()

    if resume is None:
        resume = bool(getattr(config, "resume", False))
    start_epoch = 0
    if resume:
        completed = sr_model.resume_training()
        if completed is None:
            log.info("resume requested but no checkpoint found - "
                     "starting fresh")
        else:
            start_epoch = min(completed, config.num_epochs)
            log.info(f"resuming after {completed} completed epochs "
                     f"(step {sr_model.iterations()})")

    preempted, restore_handler = _install_preemption_handler()

    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)

    num_epochs = config.num_epochs
    try:
        finished = _epoch_loop(config, data_pipeline, sr_model,
                               plotting_interval, start_epoch, num_epochs,
                               preempted)
    finally:
        restore_handler()

    if profile_dir:
        import jax
        jax.profiler.stop_trace()

    if not finished:  # preempted: state durably saved, exit fast
        return None

    training_duration = time.perf_counter() - start_training
    log.info(f"finished training ({training_duration:.2f} sec)")
    sr_model.after_training()

    histories = sr_model.histories()
    result = TrainResult(
        sr_model.name,
        histories["train_batch"], histories["train_epoch"],
        histories["valid_batch"], histories["valid_epoch"],
    )
    dump_dir = os.path.join(getattr(config, "save_path", "."), "json_dump")
    result.save_as_json(dump_dir)

    log.info("calculating psnr/ssim on validation set")
    from simplesr_tpu.eval import evaluation
    evaluation.evaluate_on_validationdata(
        config=config, model_name=sr_model.name, pipeline=data_pipeline,
        model=sr_model)
    log.info("done")
    return result


def _install_preemption_handler():
    """SIGTERM → a 'save a resume point and stop' event, installed for the
    duration of training only (main thread; no-op elsewhere). Returns
    (event, restore_fn) — restore_fn MUST run when training ends so SIGTERM
    regains its normal meaning outside the loop."""
    import signal
    import threading
    preempted = threading.Event()
    if threading.current_thread() is not threading.main_thread():
        return preempted, lambda: None
    prev = signal.signal(signal.SIGTERM, lambda *_: preempted.set())
    return preempted, lambda: signal.signal(signal.SIGTERM, prev)


def _epoch_loop(config, data_pipeline, sr_model, plotting_interval,
                start_epoch, num_epochs, preempted):
    """The epoch/batch driver loop. Returns True when training ran to
    completion (or early-stopped), False when preempted (resume point
    saved)."""
    for epoch in range(start_epoch, num_epochs):
        if sr_model.stop_early():
            break
        sr_model.before_epoch()
        start_epoch_t = time.perf_counter()

        for lr_batch, hr_batch in data_pipeline.train_batch_generator():
            if preempted.is_set():
                break
            sr_model.train_step(lr_batch, hr_batch)
            sr_model.after_train_batch()

        for lr_batch, hr_batch in data_pipeline.validation_batch_generator():
            if preempted.is_set():
                break
            sr_model.validation_step(lr_batch, hr_batch)
            sr_model.after_validation_batch()

        if preempted.is_set():
            sr_model.save_resume_point()
            log.info(f"preempted during epoch {epoch} - resume point saved "
                     f"(step {sr_model.iterations()}); rerun with "
                     "resume=True to continue")
            return False

        if epoch != 0 and plotting_interval and epoch % plotting_interval == 0:
            _plot_progress(config, data_pipeline, sr_model)

        epoch_duration = time.perf_counter() - start_epoch_t
        log.info(f"epoch: {epoch} ({epoch_duration:.2f} sec)\n"
                 + sr_model.formatted_epoch_metrics())
        _log_perf(config, epoch, epoch_duration, sr_model)
        sr_model.after_epoch()
    return True


def _log_perf(config, epoch, epoch_duration, sr_model):
    """Append per-epoch wall time + step counts to config.perf_logfile.
    (The reference creates this file path but never writes it —
    SURVEY.md §5; here it gets real content.)"""
    path = getattr(config, "perf_logfile", None)
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(f"epoch={epoch} duration_s={epoch_duration:.3f} "
                    f"total_steps={sr_model.iterations()}\n")
    except OSError:
        pass


def _plot_progress(config, data_pipeline, sr_model):
    for lr_batch, hr_batch in data_pipeline.train_batch_generator():
        sr_model.test_and_plot(lr_batch, config.pic_dir_train, 0, hr_batch)
        break
    for lr_batch, hr_batch in data_pipeline.validation_batch_generator():
        sr_model.test_and_plot(lr_batch, config.pic_dir_val, 0, hr_batch)
        break
    for step, (lr_batch, file_path) in enumerate(
            data_pipeline.test_batch_generator(batch_size=config.batch_size)):
        sr_model.test_and_plot(lr_batch, config.pic_dir_test, step, None)


def _log_configurations(config, data_pipeline, sr_model):
    path = getattr(config, "config_logfile", None)
    if not path:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a+") as f:
        f.write("# Base config\n")
        f.write(f"{config}\n")
        f.write("# Data Pipeline config\n")
        f.write(f"{data_pipeline}\n")
        f.write("# Model config\n")
        f.write(f"{sr_model}\n")
