"""Training loop: optax optimizer, sharded jitted train step, metrics, checkpoints.

TPU-native equivalent of the reference Lightning harness
(`/root/reference/matcha/models/baselightningmodule.py` + `train.py:81-109`):

  * AdamW lr 1e-4, betas (0.9, 0.999), weight decay 1e-6 with per-epoch cosine
    annealing to 1e-6 over 1000 epochs (`baselightningmodule.py:60-92`);
  * global-norm gradient clipping 1.0 and 2-step gradient accumulation
    (`train.py:88-89`) via optax.MultiSteps;
  * train/val losses = duration + prior + flow-matching (`baselightningmodule.py:94-151`);
  * Orbax checkpoints: top-k on val loss + always-keep-latest + auto-resume
    (`train.py:90-101`, `train.py:10-43`);
  * metrics to JSONL (+ TensorBoard when available), grad-norm logging.

The step is one jitted graph — encoder, MAS (Pallas on TPU), decoder fwd/bwd, optimizer
— compiled per (Tx, Ty) bucket; batches are sharded over the mesh's data axis and
parameters placed per the TP rules, so the same step function runs 1-chip or N-host.
"""

import json
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tpu.data.dataset import DataConfig, batch_iterator, num_batches
from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
from matcha_tpu.parallel import make_mesh, put_global_batch, shard_params


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 1e-6
    cosine_epochs: int = 1000  # CosineAnnealingLR T_max (epochs)
    eta_min: float = 1e-6
    grad_clip: float = 1.0
    accumulate_steps: int = 2
    max_epochs: int = 1000
    log_every: int = 10
    ckpt_dir: str = "checkpoints"
    keep_top_k: int = 3
    seed: int = 0
    mas_impl: str = "auto"
    log_grad_norm: bool = True
    # "fp32" = reference-parity "32-true"; "bf16" = mixed precision (bf16 U-Net
    # fwd/bwd on the MXU, f32 master weights / MAS / losses / optimizer).
    precision: str = "fp32"
    # when set, capture a jax.profiler trace (Perfetto/TensorBoard-viewable) of a few
    # post-compile steps of the first trained epoch into this directory
    profile_dir: Optional[str] = None
    # memory-bounded decoder training: train the CFM decoder on a random fixed-length
    # window of this many frames per sample (`matcha_tts.py:290-312`; dormant in the
    # reference's own config). Must be a multiple of 2**decoder downsamples.
    out_size: Optional[int] = None
    # checkpoint every N epochs (final epoch always saved; 1 = reference parity —
    # Lightning checkpoints per val epoch). Through a high-latency device tunnel
    # the per-epoch Orbax write can dominate short epochs; raise for long runs.
    ckpt_every_epochs: int = 1
    # K>1: run K gradient steps per device dispatch via lax.scan over a stacked
    # (K, B, ...) superbatch of identically-shaped bucket batches. Amortizes host
    # dispatch latency (~28 ms/step through a remote-device tunnel) over K steps.
    # K is a pure performance knob: batches execute in a K-independent window-sorted
    # order and each batch's rng key is derived from its epoch index (fold_in), so
    # the training trajectory is identical across K settings up to XLA scan-body
    # fusion ulps (test_k_dispatch_trajectory_bucket_independent).
    steps_per_dispatch: int = 1


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Per-epoch cosine annealing matching torch CosineAnnealingLR semantics."""

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), cfg.cosine_epochs)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * epoch / cfg.cosine_epochs))
        return cfg.eta_min + (cfg.lr - cfg.eta_min) * cos

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            make_lr_schedule(cfg, steps_per_epoch),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_steps)
    return tx


def total_loss(losses: dict) -> jnp.ndarray:
    return losses["dur_loss"] + losses["prior_loss"] + losses["diff_loss"]


def _make_one_step(model: MatchaTTS, tx: optax.GradientTransformation, train_cfg: TrainConfig):
    """The un-jitted (params, opt_state, batch, rng) -> (params, opt_state, metrics)
    gradient step shared by the single-dispatch and scan-dispatch step builders."""

    bf16 = train_cfg.precision == "bf16"

    def loss_fn(params, batch, rng):
        rng_cfm, rng_drop, rng_crop = jax.random.split(rng, 3)
        if bf16:
            from matcha_tpu.models.precision import mixed_precision_params

            params = mixed_precision_params(params)
        out = model.apply(
            {"params": params},
            batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
            deterministic=False,
            mas_impl=train_cfg.mas_impl,
            decoder_dtype=jnp.bfloat16 if bf16 else None,
            out_size=train_cfg.out_size,
            method=MatchaTTS.compute_losses,
            rngs={"cfm": rng_cfm, "dropout": rng_drop, "crop": rng_crop},
        )
        losses = {k: out[k] for k in ("dur_loss", "prior_loss", "diff_loss")}
        return total_loss(losses), losses

    def one_step(params, opt_state, batch, rng):
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses, loss=loss)
        if train_cfg.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return one_step


def make_train_step(model: MatchaTTS, tx: optax.GradientTransformation, train_cfg: TrainConfig):
    """Build the jitted (params, opt_state, batch, rng) -> updated state + metrics step."""

    one_step = _make_one_step(model, tx, train_cfg)

    # named wrapper (not jit(one_step)): the function name is part of the HLO module
    # name and therefore of the persistent compile-cache key — keep it stable
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        return one_step(params, opt_state, batch, rng)

    return train_step


def make_train_steps_scan(model: MatchaTTS, tx: optax.GradientTransformation,
                          train_cfg: TrainConfig):
    """Build a jitted K-steps-per-dispatch train function.

    Takes a stacked superbatch (each leaf (K, B, ...)) and K rng keys, runs K
    sequential gradient steps inside one compiled graph via `lax.scan`, and returns
    stacked (K,) per-step metrics. One dispatch instead of K: host->device latency
    (the dominant cost of small fused steps through a remote-device tunnel) is paid
    once, and XLA pipelines the scan body back-to-back on chip.
    """

    one_step = _make_one_step(model, tx, train_cfg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(params, opt_state, batches, rngs):
        def body(carry, inp):
            batch, rng = inp
            p, o, metrics = one_step(carry[0], carry[1], batch, rng)
            return (p, o), metrics

        (params, opt_state), metrics = jax.lax.scan(body, (params, opt_state), (batches, rngs))
        return params, opt_state, metrics

    return train_steps


def chunk_batches_by_shape(batches, k: int, window: int = 64):
    """Group a batch stream into lists of <= k identically-shaped batches, in an
    execution order INDEPENDENT of k.

    The stream is consumed in fixed windows of `window` items; each window is
    stably sorted by batch shape and same-shape runs are cut into groups of <= k
    (remainders flush within their window, never carried across windows). Neither
    the window size nor the sort depends on k, so the order in which batches reach
    the gradient step is identical for every k <= window: steps_per_dispatch is a
    pure dispatch-granularity knob, and pairing each batch with its rng key BEFORE
    chunking (Trainer.fit) makes training trajectories match bitwise across K
    (up to XLA scan-body fusion ulps). Memory: at most `window` batches buffered.

    Items may be bare batch dicts or (batch_dict, aux) tuples — shapes are read
    from the dict, aux (e.g. the batch's rng key) rides along untouched. The
    grouping is identical on every host because the input schedule is
    (matcha_tpu.data.dataset.batch_iterator's multi-host contract).
    """
    window = max(window, k)

    def shape_of(item):
        b = item[0] if isinstance(item, tuple) else item
        return tuple(sorted((name, np.shape(v)) for name, v in b.items()))

    def flush(buf):
        runs: dict = {}
        for it in buf:
            runs.setdefault(shape_of(it), []).append(it)
        for key in sorted(runs):  # deterministic shape order within the window
            run = runs[key]
            for i in range(0, len(run), k):
                yield run[i : i + k]

    buf: list = []
    for b in batches:
        buf.append(b)
        if len(buf) == window:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)


@partial(jax.jit, static_argnums=2)
def _fold_in_keys(base_rng, epoch, n: int):
    """All per-batch rng keys of one epoch in a single device dispatch:
    key_i = fold_in(fold_in(base, epoch), i) for the epoch's i-th scheduled batch."""
    k = jax.random.fold_in(base_rng, epoch)
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(n))


def make_eval_step(model: MatchaTTS, train_cfg: TrainConfig):
    @jax.jit
    def eval_step(params, batch, rng):
        out = model.apply(
            {"params": params},
            batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
            deterministic=True,
            mas_impl=train_cfg.mas_impl,
            method=MatchaTTS.compute_losses,
            rngs={"cfm": rng},
        )
        losses = {k: out[k] for k in ("dur_loss", "prior_loss", "diff_loss")}
        losses["loss"] = total_loss(losses)
        return losses

    return eval_step


def _tb_importable() -> bool:
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401

        return True
    except Exception:
        return False


class MetricLogger:
    """JSONL metric stream + optional TensorBoard mirror.

    Multi-host: rank 0 owns `metrics.jsonl` and TensorBoard; other ranks write
    `metrics_rank{i}.jsonl` (same shared filesystem, no interleaving) — which also
    makes cross-host metric agreement directly auditable."""

    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        rank = jax.process_index()
        name = "metrics.jsonl" if rank == 0 else f"metrics_rank{rank}.jsonl"
        self.jsonl = open(self.log_dir / name, "a")
        # tb_available is computed IDENTICALLY on every rank (an import check, not
        # the rank-0-only writer below) so collective work gated on it — e.g. the
        # params gather before validation rendering — is taken by all processes or
        # by none, never divergently.
        self.tb_available = use_tensorboard and _tb_importable()
        self.tb = None
        if self.tb_available and rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: dict, prefix: str = "", epoch: Optional[int] = None):
        row = {"step": step, "time": time.time()}
        if epoch is not None:
            row["epoch"] = int(epoch)  # direct step->epoch mapping for cli.analyze
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            row[key] = float(v)
            if self.tb is not None:
                self.tb.add_scalar(key, float(v), step)
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class Trainer:
    """End-to-end training driver (single-host or multi-host, mesh-sharded)."""

    def __init__(
        self,
        model_cfg: MatchaConfig = MatchaConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        data_cfg: DataConfig = DataConfig(),
        mesh=None,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.data_cfg = data_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = MatchaTTS(model_cfg)
        self.logger = MetricLogger(Path(train_cfg.ckpt_dir) / "logs")
        self._ckpt = None

    # ------------------------------------------------------------- checkpoints
    @property
    def checkpoints(self):
        if self._ckpt is None:
            from matcha_tpu.train.checkpoints import CheckpointStore

            self._ckpt = CheckpointStore(self.train_cfg.ckpt_dir, self.train_cfg.keep_top_k)
        return self._ckpt

    # ------------------------------------------------------------------- state
    def init_state(self, steps_per_epoch: int):
        params = init_params(self.model, jax.random.PRNGKey(self.train_cfg.seed))
        params = shard_params(self.mesh, params)
        tx = make_optimizer(self.train_cfg, steps_per_epoch)
        opt_state = tx.init(params)
        return params, opt_state, tx

    def fit(self, train_ds, val_ds, max_epochs: Optional[int] = None, resume: bool = True):
        cfg = self.train_cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        # exact iterator batch count (incl. per-window remainder drops), so the
        # per-epoch cosine boundary matches the actual epoch length
        steps_per_epoch = max(
            num_batches(len(train_ds), self.data_cfg, jax.process_count()), 1
        )

        params, opt_state, tx = self.init_state(steps_per_epoch)
        step, start_epoch = 0, 0
        if resume:
            restored = self.checkpoints.restore_latest(params, opt_state)
            if restored is not None:
                params, opt_state, step, start_epoch = restored
                print(f"resumed from step {step} (epoch {start_epoch})")

        # K>1 uses the scanned multi-step graph for full groups of K same-shape
        # batches and falls back to the single-step graph for window/epoch-end
        # remainders (a scan graph per remainder length would recompile every epoch).
        train_step = make_train_step(self.model, tx, cfg)
        if cfg.steps_per_dispatch > 1:
            train_steps_scan = make_train_steps_scan(self.model, tx, cfg)
        eval_step = make_eval_step(self.model, cfg)
        # Per-batch rng keys are derived by (epoch, schedule index) fold_in, not by
        # sequential splits: the batch->key pairing is therefore independent of the
        # dispatch grouping (steps_per_dispatch is a pure performance knob — see
        # chunk_batches_by_shape) AND of resume boundaries (a sequential-split
        # stream restarts from scratch on every fit() call, reusing early keys
        # after a resume; fold_in(epoch, i) reproduces the original keys).
        base_rng = jax.random.PRNGKey(cfg.seed + 1)
        eval_base = jax.random.PRNGKey(cfg.seed + 2)

        from matcha_tpu.utils.profiling import StepTimer

        epoch_timer = StepTimer()
        steps_done = 0  # steps executed this fit() call (profiling skips compile steps)
        dispatches_done = 0  # device dispatches this fit() (profiling trigger)
        profiling = False  # a trace is open (must be closed even on short runs)

        with self.mesh:
            for epoch in range(start_epoch, max_epochs):
                metrics = None
                train_iter = batch_iterator(
                    train_ds, self.data_cfg, epoch=epoch,
                    process_index=jax.process_index(), process_count=jax.process_count(),
                )
                # all of this epoch's step keys in one device dispatch
                epoch_keys = np.asarray(_fold_in_keys(base_rng, epoch, steps_per_epoch))
                pairs = (
                    ({kk: v for kk, v in b.items() if kk != "n_real"},
                     epoch_keys[i] if i < len(epoch_keys)
                     else np.asarray(jax.random.fold_in(
                         jax.random.fold_in(base_rng, epoch), i)))
                    for i, b in enumerate(train_iter)
                )
                with epoch_timer.measure() as epoch_out:
                    for chunk in chunk_batches_by_shape(pairs, cfg.steps_per_dispatch):
                        k = len(chunk)
                        # profile dispatches 2-3 of this fit(): past the
                        # first-compile wall, steady-state steps in one trace
                        if (cfg.profile_dir is not None and dispatches_done == 2
                                and not profiling):
                            jax.profiler.start_trace(cfg.profile_dir)
                            profiling = True
                        if cfg.steps_per_dispatch > 1 and k == cfg.steps_per_dispatch:
                            stacked = {
                                key: np.stack([np.asarray(b[key]) for b, _ in chunk])
                                for key in chunk[0][0]
                            }
                            stacked = put_global_batch(
                                self.mesh, stacked, stacked_steps=True
                            )
                            params, opt_state, metrics_k = train_steps_scan(
                                params, opt_state, stacked,
                                jnp.stack([jnp.asarray(r) for _, r in chunk]),
                            )
                            per_step = [
                                {kk: v[i] for kk, v in metrics_k.items()}
                                for i in range(k)
                            ]
                            metrics = per_step[-1]
                        else:  # K==1, or a window/epoch-end remainder (< K batches):
                            per_step = []
                            for b, r in chunk:
                                b = put_global_batch(self.mesh, b)
                                params, opt_state, metrics = train_step(
                                    params, opt_state, b, jnp.asarray(r)
                                )
                                per_step.append(metrics)
                        dispatches_done += 1
                        if profiling and dispatches_done >= 4:
                            jax.block_until_ready(metrics)
                            jax.profiler.stop_trace()
                            profiling = False
                        for i in range(k):
                            if (step + i) % cfg.log_every == 0:
                                self.logger.log(step + i, per_step[i],
                                                prefix="train/", epoch=epoch)
                        step += k
                        steps_done += k
                    if metrics is not None:
                        epoch_out["result"] = metrics

                # Validation. batch_iterator's schedule is globally synchronized (same
                # batches/shapes/count on every host) and each per-batch loss under
                # SPMD is a mean over the GLOBAL batch — so `agg` is identical on all
                # hosts and rank 0's checkpoint ranking uses cross-host-correct values
                # (reference `sync_dist=True` intent, `baselightningmodule.py:164-202`).
                val_metrics, val_weights = [], []
                eval_epoch_key = jax.random.fold_in(eval_base, epoch)
                for vi, batch in enumerate(batch_iterator(
                    val_ds, self.data_cfg, epoch=0, shuffle=False,
                    process_index=jax.process_index(), process_count=jax.process_count(),
                    drop_last=False,
                )):
                    # weight each batch mean by its DISTINCT item count so the
                    # wrap-padded final batch doesn't over-count its items
                    val_weights.append(batch.pop("n_real"))
                    batch = put_global_batch(self.mesh, batch)
                    eval_rng = jax.random.fold_in(eval_epoch_key, vi)
                    val_metrics.append(eval_step(params, batch, eval_rng))
                if val_metrics:
                    w = np.asarray(val_weights, np.float64)
                    agg = {
                        k: float(np.average([float(m[k]) for m in val_metrics], weights=w))
                        for k in val_metrics[0]
                    }
                else:
                    agg = {"loss": float("inf")}
                # async-dispatch-safe wall time of the training loop (StepTimer syncs
                # through the device tunnel before reading the clock)
                agg["epoch_seconds"] = epoch_timer.times[-1]
                self.logger.log(step, agg, prefix="val/", epoch=epoch)

                self._maybe_render_validation(params, val_ds, epoch, step, max_epochs)
                # every process participates in the distributed Orbax write; the
                # ranking value agg["loss"] is identical on all hosts (see above).
                # Cadence-gated (final epoch always saved) — see ckpt_every_epochs.
                if (epoch + 1) % cfg.ckpt_every_epochs == 0 or epoch + 1 == max_epochs:
                    self.checkpoints.save(step, epoch + 1, params, opt_state, agg["loss"])
        if profiling:  # run ended before step 4 — close the trace cleanly
            jax.profiler.stop_trace()
        return params, opt_state, step

    def _maybe_render_validation(self, params, val_ds, epoch: int, step: int,
                                 max_epochs: int) -> bool:
        """Rank-0 TensorBoard validation rendering, collective-work-gated.

        Rendering runs on rank 0 only, but a global-mesh-sharded tree cannot be
        applied by one process alone — full params must be gathered to host first
        (a collective: every process participates). That gather is gated on
        rendering actually happening: `logger.tb_available` is computed identically
        on every rank (an import probe, not the rank-0-only writer), so a pod
        without TensorBoard does ZERO per-epoch collective work for rendering.
        Renders on the checkpoint cadence (`ckpt_every_epochs`, final epoch always;
        reference renders every val epoch, `baselightningmodule.py:204-242` — the
        default cadence of 1 preserves that).

        Returns True iff the render path (and any gather) ran.
        """
        cfg = self.train_cfg
        if not self.logger.tb_available or len(val_ds) == 0:
            return False
        if not ((epoch + 1) % cfg.ckpt_every_epochs == 0 or epoch + 1 == max_epochs):
            return False
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            params = multihost_utils.process_allgather(params, tiled=True)
        if jax.process_index() == 0:
            self._log_validation_images(params, val_ds, epoch, step)
        return True

    def _log_validation_images(self, params, val_ds, epoch: int, step: int, n_samples: int = 2):
        """Render encoder/decoder/alignment images for the first val samples.

        Mirrors the reference's rank-0 `on_validation_end` TensorBoard rendering
        (`baselightningmodule.py:204-242`, synthesise with n_timesteps=10).
        """
        if self.logger.tb is None or len(val_ds) == 0:
            return
        from matcha_tpu.ops.masks import fix_len_compatibility
        from matcha_tpu.utils.plotting import plot_tensor

        try:
            for i in range(min(n_samples, len(val_ds))):
                item = val_ds.get(i)
                x = jnp.asarray(item["x"])[None, :]
                xl = jnp.asarray([x.shape[1]], jnp.int32)
                if epoch == 0:
                    self.logger.tb.add_image(
                        f"original/{i}", plot_tensor(item["y"].T), epoch, dataformats="HWC"
                    )
                mu_x, w_ceil, x_mask, y_len = self.model.apply(
                    {"params": params}, x, xl, method=MatchaTTS.encode_durations
                )
                budget = min(fix_len_compatibility(max(int(np.asarray(y_len).max()), 4)),
                             self.data_cfg.max_mel_len)
                out = self.model.apply(
                    {"params": params}, mu_x, w_ceil, x_mask, y_len, budget, 10,
                    method=MatchaTTS.decode_fixed, rngs={"noise": jax.random.PRNGKey(epoch)},
                )
                for name, arr in (
                    ("generated_enc", np.asarray(out["encoder_outputs"][0]).T),
                    ("generated_dec", np.asarray(out["decoder_outputs"][0]).T),
                    ("alignment", np.asarray(out["attn"][0])),
                ):
                    self.logger.tb.add_image(
                        f"{name}/{i}", plot_tensor(arr), epoch, dataformats="HWC"
                    )
        except Exception as e:  # rendering must never kill training
            print(f"validation image rendering failed: {e}")
