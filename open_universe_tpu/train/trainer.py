"""Training driver: fit/validate/checkpoint (replaces pytorch-lightning).

Implements the reference's training behavior (SURVEY.md §3.1, §3.4):
  * score-only (Universe) or two-optimizer GAN (UniverseGAN) steps, jitted
    over a data-parallel mesh
  * validation every ``val_check_interval`` steps: binned score loss over
    5 uniform time bins (feeding the 'adaptive' time-sampling histogram),
    then real enhancement + metric suite on ``max_enh_batches`` batches
  * checkpoints via orbax (all kept + 'last', like save_top_k=-1), with the
    config stored alongside so inference.load_model can ingest them
  * TensorBoard scalar logging (tensorboardX)

The GAN scheduler steps twice per optimization step, reproducing the
reference's convention where 600k Lightning steps = 300k generator steps
(universe_gan.py:230-302, experiment/universepp_vb_16k.yaml).
"""
from __future__ import annotations

import json
import logging
import math
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..models.universe import Universe
from ..models.universe_gan import UniverseGAN
from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .ema import ema_apply
from .optim import adamw, linear_warmup_cosine_annealing, make_clipper
from .steps import init_train_state, make_gan_train_step, make_train_step
from ..nn.module import buffer_mask

log = logging.getLogger(__name__)

VAL_SEED = 682479040  # reference universe.py:604


def _build_schedule(sch_cfg: Optional[dict], base_lr: float, max_steps: int,
                    gan_role: Optional[str] = None, freeze_step: int = 0):
    """LR schedule as a function of the optimizer's update count.

    gan_role None reproduces Lightning's one scheduler.step() per
    training_step.  For the GAN the reference steps BOTH schedulers after
    the disc update AND after the gen update (universe_gan.py:229-231,
    301-302), except during the disc-freeze phase where only the post-gen
    step happens.  With F = disc_freeze_step, at global step i the scheduler
    has therefore been stepped  min(i, F) + 2*max(i - F, 0)  times before
    the disc update (disc update count d maps to i = F + d), plus one more
    before the gen update once i >= F (the disc phase steps the scheduler
    first).  F=0 gives the flagship behavior: disc lr = sched(2i),
    gen lr = sched(2i + 1)."""
    if sch_cfg is None:
        return base_lr
    inner = sch_cfg.get("scheduler", sch_cfg)
    t_max = inner.get("T_max", max_steps) or max_steps
    sched = linear_warmup_cosine_annealing(
        base_lr, inner.get("T_warmup", 0), inner.get("T_cosine", t_max),
        t_max, inner.get("eta_min", 0.0))
    if gan_role is None:
        return sched
    if gan_role == "generator":
        def gen_sched(i):
            i = jnp.asarray(i)
            past = jnp.maximum(i - freeze_step, 0)
            return sched(jnp.minimum(i, freeze_step) + 2 * past
                         + (i >= freeze_step).astype(jnp.int32))
        return gen_sched
    if gan_role == "discriminator":
        return lambda d: sched(freeze_step + 2 * d)
    raise ValueError(gan_role)


class Trainer:
    def __init__(self, model: Universe, datamodule, output_dir,
                 max_steps: int = 600_000, val_check_interval: int = 5000,
                 seed: int = 0, log_every: int = 25, mesh=None,
                 max_val_batches: Optional[int] = None,
                 checkpoint_every: Optional[int] = None,
                 config: Optional[dict] = None,
                 profile_steps: Optional[tuple] = None,
                 tp_min_shard: int = 128):
        self.model = model
        self.dm = datamodule
        self.output_dir = Path(output_dir)
        self.max_steps = max_steps
        self.val_check_interval = val_check_interval
        self.seed = seed
        self.log_every = log_every
        self.max_val_batches = max_val_batches
        self.checkpoint_every = checkpoint_every or val_check_interval
        self.config = config
        self.profile_steps = profile_steps  # (start, stop) -> jax trace dump
        self.tp_min_shard = tp_min_shard  # smallest out-channel width tp-sharded
        self._first_val_done = False
        self.is_gan = isinstance(model, UniverseGAN)
        self.mesh = mesh if mesh is not None else make_mesh(tp=1)

        self.output_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / "checkpoints").mkdir(exist_ok=True)
        if config is not None:
            with open(self.output_dir / "config.yaml", "w") as f:
                yaml.safe_dump(config, f)

        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(str(self.output_dir / "tb"))
        except ImportError:  # pragma: no cover
            self.tb = None

        self._setup()

    # ------------------------------------------------------------------
    def _setup(self):
        model = self.model
        params = model.init(jax.random.key(self.seed))
        mask = buffer_mask(model, params)
        if hasattr(model, "trainable_mask"):
            # LoRA-style freezing: intersect with the model's trainable mask
            tmask = model.trainable_mask(params)
            mask = jax.tree_util.tree_map(lambda a, b: bool(a) and bool(b),
                                          mask, tmask)

        import optax

        if self.is_gan:
            opt = model.opt_kwargs or {}
            accum = opt.get("accumulate_grad_batches", 1)
            gen_cfg = opt.get("generator", {})
            disc_cfg = opt.get("discriminator", {})
            sch = model.schedule_kwargs or {}
            gen_keys = list(model.model_param_keys())
            gen_params = {k: params[k] for k in gen_keys}
            # see UniverseGAN.optimized_param_keys for the preserved
            # reference quirk (signal_decoupling_layer never optimized)
            optimized = set(getattr(model, "optimized_param_keys",
                                    model.model_param_keys)())
            gen_mask = {
                k: (mask[k] if k in optimized else jax.tree_util.tree_map(
                    lambda _: False, mask[k]))
                for k in gen_keys}
            sched_g = _build_schedule(sch.get("generator"),
                                      gen_cfg.get("lr", 2e-4),
                                      self.max_steps, gan_role="generator",
                                      freeze_step=model.disc_freeze_step)
            sched_d = _build_schedule(sch.get("discriminator"),
                                      disc_cfg.get("lr", 2e-4),
                                      self.max_steps, gan_role="discriminator",
                                      freeze_step=model.disc_freeze_step)
            self.tx = adamw(
                sched_g, betas=tuple(gen_cfg.get("betas", (0.8, 0.99))),
                weight_decay=gen_cfg.get("weight_decay", 0.0),
                weight_decay_exclude=gen_cfg.get("weight_decay_exclude",
                                                 ("prelu", "bias")),
                params=gen_params, trainable_mask=gen_mask)
            # the reference's disc config omits weight_decay, so its
            # torch.optim.AdamW applies the torch DEFAULT 0.01 to every disc
            # parameter including biases (configure_optimizers passes the
            # config straight through, universe_gan.py:416-419)
            self.tx_disc = adamw(
                sched_d, betas=tuple(disc_cfg.get("betas", (0.8, 0.99))),
                weight_decay=disc_cfg.get("weight_decay", 0.01))
            if accum and accum > 1:
                self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
                self.tx_disc = optax.MultiSteps(self.tx_disc,
                                                every_k_schedule=accum)
            self.state = init_train_state(model, params, self.tx,
                                          disc_tx=self.tx_disc)
            # donate_argnums: the old state buffers are dead after the step
            # (checkpointing saves a jax.device_get host copy first), and
            # double-buffering params+opt+EMA at batch 40 pushed XLA into
            # rematerialization fusions on v5e.
            self._step_fn = jax.jit(make_gan_train_step(
                model, self.tx, self.tx_disc,
                grad_clip_vals=opt.get("grad_clip_vals", {})),
                donate_argnums=(0,))
            # warmup phase (step < disc_freeze_step): a separate compiled
            # step that OMITS the discriminator compute — the disc convs are
            # the compute floor of the full step, and the full step would
            # pay them only to where-gate the result away.  Selected from
            # the host-side step counter in fit(); crossing the boundary
            # compiles the full step once.
            self._step_fn_frozen = None
            if model.disc_freeze_step > 0:
                self._step_fn_frozen = jax.jit(make_gan_train_step(
                    model, self.tx, self.tx_disc,
                    grad_clip_vals=opt.get("grad_clip_vals", {}),
                    disc_frozen=True), donate_argnums=(0,))
        else:
            opt = dict(model.opt_kwargs or {})
            sched = _build_schedule(model.schedule_kwargs, opt.get("lr", 2e-4),
                                    self.max_steps)
            self.tx = adamw(
                sched, betas=tuple(opt.get("betas", (0.8, 0.99))),
                weight_decay=opt.get("weight_decay", 0.0),
                weight_decay_exclude=opt.get("weight_decay_exclude",
                                             ("prelu", "bias")),
                params=params, trainable_mask=mask)
            accum = opt.get("accumulate_grad_batches", 1)
            if accum and accum > 1:
                self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
            gc = model.grad_clip_kwargs
            clipper = make_clipper({k: v for k, v in (gc or {}).items()
                                    if not k.startswith("_")}) if gc else None
            self.state = init_train_state(model, params, self.tx,
                                          clipper=clipper)
            self._step_fn = jax.jit(make_train_step(model, self.tx,
                                                    clipper=clipper),
                                    donate_argnums=(0,))

        # dp: params replicated, batch sharded (GSPMD emits the grad psum).
        # tp>1: wide weight matrices/kernels additionally sharded on their
        # output-channel axis (same rule as __graft_entry__.dryrun_multichip;
        # optimizer moments/EMA follow since they share parameter shapes).
        self.state = shard_params(self.mesh, self.state,
                                  min_last=self.tp_min_shard)

        # validation fns (jitted; one compile per val length bucket).
        # Diffusion models (Universe/UniverseGAN) validate with the binned
        # score loss; the enhancement family (EnhancementBaseModel,
        # UniverseLoRA) has no score to bin — it validates with its own
        # loss stack (reference enhancement/base.py:382-407).
        self.is_diffusion = isinstance(model, Universe)
        if self.is_diffusion:
            self._val_loss_fn = jax.jit(
                partial(self.model.compute_losses, train=False,
                        time_sampling="time_uniform"))
        else:
            self._val_loss_fn = jax.jit(self.model.validation_losses)
        self._enhance_fn = jax.jit(
            lambda p, mix, key: self.model.enhance(p, mix, key=key))

        # enhancement metric suite from the model's validation config
        self.enh_losses = {}
        for name, cfg in (self.model.val_kwargs.get("enh_losses") or {}).items():
            from ..configs.registry import instantiate

            try:
                self.enh_losses[name] = (instantiate(cfg)
                                         if isinstance(cfg, dict) else cfg)
            except Exception as e:
                log.warning("enh loss %s unavailable: %s", name, e)

        # adaptive time-sampling state (reference universe.py:391-412,630-638):
        # initialized uniform so the first steps (before any validation) use
        # a flat histogram with the SAME array shapes as later updates — the
        # jitted step compiles once.
        self._adaptive_mode = (
            self.model.train_kwargs.get("time_sampling") == "adaptive")
        n_bins = self.model.val_kwargs.get("n_bins", 5)
        tb = np.linspace(0.0, 1.0, n_bins + 1)
        pr_cum = tb.copy()
        pr_cum[-1] = 1.0 + 1e-5
        self.pr_cum = jnp.asarray(pr_cum)
        self.val_bins = jnp.asarray(tb)

    # ------------------------------------------------------------------
    def _log(self, metrics: Dict[str, Any], step: int):
        # rank-0 gating replaces the reference's utils/ddp.py checks
        if self.tb is None or jax.process_index() != 0:
            return
        for k, v in metrics.items():
            try:
                self.tb.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def _eval_params(self):
        """Parameters used for evaluation: EMA shadow when available."""
        if "ema" in self.state:
            return ema_apply(self.state["params"], self.state["ema"])
        return self.state["params"]

    # ------------------------------------------------------------------
    def _warmup_collectives(self):
        """Establish the mesh's communicator clique while all processes are
        still aligned (multi-host only; no-op otherwise).

        Communicator-context creation has a short rendezvous timeout on some
        backends (Gloo on XLA:CPU hardcodes ~30 s), while the processes'
        independent train-step compiles can skew their arrival at the first
        real collective by minutes. Contexts are cached per clique across
        executables (probed: a warmed clique survives a 90 s skew), so one
        tiny all-reduce here moves the skew from the unconfigurable context
        init onto the ordinary collective-stuck timeouts."""
        if jax.process_count() <= 1 or getattr(self, "_collectives_warm",
                                               False):
            return
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        names = self.mesh.axis_names
        # the full-mesh clique plus each axis's subgroup cliques (a psum
        # over 'dp' of a dp x tp mesh rendezvouses tp-many 4-device cliques,
        # distinct from the 8-device one)
        groups = [names] + ([(a,) for a in names] if len(names) > 1 else [])
        for axes in groups:
            f = shard_map(partial(jax.lax.psum, axis_name=axes),
                          mesh=self.mesh, in_specs=P(), out_specs=P(),
                          check_rep=False)
            size = int(np.prod([self.mesh.shape[a] for a in axes]))
            got = float(jax.device_get(jax.jit(f)(jnp.float32(1.0))))
            assert got == size, (axes, got, size)
        self._collectives_warm = True
        log.info("collective cliques warmed (%s) over %d devices",
                 ",".join("+".join(g) for g in groups),
                 int(self.mesh.devices.size))

    def fit(self, resume_from: Optional[str] = None):
        self._warmup_collectives()
        if resume_from:
            self.restore(resume_from)
        step = int(jax.device_get(self.state["step"]))
        key = jax.random.key(self.seed + 1)
        train_loader = self.dm.train_dataloader()
        log.info("starting training at step %d / %d", step, self.max_steps)
        t0 = time.perf_counter()

        while step < self.max_steps:
            for batch in train_loader:
                if step >= self.max_steps:
                    break
                key, sub = jax.random.split(key)
                jbatch = shard_batch(self.mesh, {
                    "noisy": batch["noisy"], "clean": batch["clean"]})
                if self.profile_steps and step == self.profile_steps[0]:
                    jax.profiler.start_trace(str(self.output_dir / "profile"))
                adaptive = ({"pr_cum": self.pr_cum, "bins": self.val_bins}
                            if self._adaptive_mode else None)
                step_fn = self._step_fn
                if (getattr(self, "_step_fn_frozen", None) is not None
                        and step < self.model.disc_freeze_step):
                    step_fn = self._step_fn_frozen
                self.state, metrics = step_fn(self.state, jbatch, sub,
                                              adaptive)
                step += 1
                if self.profile_steps and step == self.profile_steps[1]:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready()
                        if hasattr(x, "block_until_ready") else x,
                        metrics)
                    jax.profiler.stop_trace()
                    log.info("profiler trace written to %s",
                             self.output_dir / "profile")

                if step % self.log_every == 0:
                    metrics = jax.device_get(metrics)
                    dt = (time.perf_counter() - t0) / self.log_every
                    t0 = time.perf_counter()
                    metrics["perf/step_time_s"] = dt
                    self._log(metrics, step)
                    main = metrics.get("train/loss", metrics.get(
                        "train/loss_gen", metrics.get("train/main_loss", 0.0)))
                    log.info("step %d loss %.4f (%.3fs/step)", step,
                             float(main), dt)

                if step % self.val_check_interval == 0:
                    val_metrics = self.validate(step)
                    self._log(val_metrics, step)
                    self._last_val = dict(val_metrics)
                if step % self.checkpoint_every == 0:
                    self.save(step)
        self.save(step)
        self._wait_for_saves()  # block + commit last.json before returning
        return self.state

    def _pad_to_bucket(self, x):
        """Zero-pad (B, T, C) up to a multiple of ``validation.bucket_seconds``
        (default 1 s).  Validation/test clips are full-length and variable;
        jitting per unique length means one XLA compile per clip on TPU —
        bucketing bounds compiles to O(buckets)."""
        fs = self.model.fs
        bucket = self.model.val_kwargs.get("bucket_seconds", 1.0)
        t = x.shape[1]
        step_len = max(int(round(bucket * fs)), 1)
        t_pad = int(math.ceil(t / step_len) * step_len)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    def _bucketed_enhance(self, params, mix, key):
        """Enhance with the clip padded up to a length bucket.  The zero pad
        slightly perturbs the in-sampler RMS normalization (which is inverted
        on output), so the trimmed result is equivalent up to normalization
        rounding."""
        t = mix.shape[1]
        est = self._enhance_fn(params, self._pad_to_bucket(mix), key)
        return est[:, :t]

    def _enhance_and_score(self, params, step, bi, batch, mix, target, key,
                           enh_metrics):
        """Shared enhance + metric-suite part of validation (both model
        families; reference base.py:408-478 / universe.py:640-704)."""
        est = self._bucketed_enhance(params, mix, key)  # (B, T, 1)
        est_np = np.asarray(est)[:, :, 0][:, None, :]
        tgt_np = np.asarray(target)[:, :, 0][:, None, :]
        self._log_audio_samples(step, bi, np.asarray(batch["noisy"]),
                                tgt_np, est_np)
        for name, loss in self.enh_losses.items():
            vals = loss(est_np, tgt_np)
            if not isinstance(vals, dict):
                vals = {"": vals}
            for sub_name, v in vals.items():
                enh_metrics.setdefault(name + sub_name, []).append(float(v))

    def _validate_enhancement(self, step: int) -> Dict[str, float]:
        """Validation for the enhancement family (EnhancementBaseModel,
        UniverseLoRA; reference enhancement/base.py:382-478): the model's
        own loss stack on the val batch — no diffusion score bins — plus
        the shared enhance + metric pass."""
        model = self.model
        max_enh = model.val_kwargs.get("max_enh_batches", 4)
        key = jax.random.key(VAL_SEED)
        params = self._eval_params()
        loss_sums: Dict[str, float] = {}
        n_batches = 0
        enh_metrics: Dict[str, list] = {}

        for bi, batch in enumerate(self.dm.val_dataloader()):
            if self.max_val_batches is not None and bi >= self.max_val_batches:
                break
            mix = jnp.asarray(batch["noisy"])
            target = jnp.asarray(batch["clean"])
            key, sub = jax.random.split(key)
            _, vmetrics = self._val_loss_fn(params, sub,
                                            self._pad_to_bucket(mix),
                                            self._pad_to_bucket(target))
            for k, v in vmetrics.items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            n_batches += 1
            if bi < max_enh and self.enh_losses:
                key, sub = jax.random.split(key)
                self._enhance_and_score(params, step, bi, batch, mix, target,
                                        sub, enh_metrics)

        metrics = {k: v / n_batches for k, v in loss_sums.items()} \
            if n_batches else {}
        for k, vals in enh_metrics.items():
            metrics[k] = float(np.mean(vals))
        log.info("validation @%d: %s", step,
                 {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    # ------------------------------------------------------------------
    def validate(self, step: int) -> Dict[str, float]:
        if not self.is_diffusion:
            return self._validate_enhancement(step)
        model = self.model
        n_bins = model.val_kwargs.get("n_bins", 5)
        max_enh = model.val_kwargs.get("max_enh_batches", 4)
        key = jax.random.key(VAL_SEED)
        params = self._eval_params()

        tb = np.linspace(0.0, 1.0, n_bins + 1)
        bin_scores = np.zeros(n_bins)
        n_batches = 0
        enh_metrics: Dict[str, list] = {}

        for bi, batch in enumerate(self.dm.val_dataloader()):
            if self.max_val_batches is not None and bi >= self.max_val_batches:
                break
            mix = jnp.asarray(batch["noisy"])
            target = jnp.asarray(batch["clean"])
            (mix_n, target_n), *_ = model.normalize_batch((mix, target))
            # bucket pad AFTER normalization (stats match the reference's
            # native-length batch); the score loss averages over the padded
            # region too, a uniform dilution that cancels in the adaptive
            # histogram's relative bin scores
            mix_p, _ = model.pad(self._pad_to_bucket(mix_n))
            target_p, _ = model.pad(self._pad_to_bucket(target_n))
            for i in range(n_bins):
                key, sub = jax.random.split(key)
                ls = self._val_loss_fn(params, sub, mix_p, target_p,
                                       t_min=float(tb[i]),
                                       t_max=float(tb[i + 1]))
                bin_scores[i] += float(ls)
            n_batches += 1

            if bi < max_enh and self.enh_losses:
                key, sub = jax.random.split(key)
                self._enhance_and_score(params, step, bi, batch, mix, target,
                                        sub, enh_metrics)

        metrics: Dict[str, float] = {}
        if n_batches:
            bin_scores /= n_batches
            metrics["val/score"] = float(np.mean(bin_scores))
            for i in range(n_bins):
                metrics[f"val/score_{tb[i]:.2f}-{tb[i+1]:.2f}"] = bin_scores[i]
            # adaptive time-sampling histogram (universe.py:630-638)
            v = np.maximum(bin_scores, 5e-4)
            pr_cum = np.concatenate([[0.0], np.cumsum(v)])
            pr_cum /= pr_cum[-1]
            pr_cum[-1] = 1.0 + 1e-5
            self.pr_cum = jnp.asarray(pr_cum)
            self.val_bins = jnp.asarray(tb)
        for k, vals in enh_metrics.items():
            metrics[k] = float(np.mean(vals))
        log.info("validation @%d: %s", step,
                 {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    # ------------------------------------------------------------------
    def test(self, step: Optional[int] = None) -> Dict[str, float]:
        """Full test-set evaluation (reference train.py:105-119 /
        trainer.test): enhance every test clip, run the metric suite, and
        write per-file results + a mean summary to the run dir using the
        same JSON schema as bin/eval_metrics."""
        from ..bin.eval_metrics import summarize

        self._warmup_collectives()
        if step is None:
            step = int(jax.device_get(self.state["step"]))
        params = self._eval_params()
        key = jax.random.key(VAL_SEED)
        results: Dict[str, Dict[str, float]] = {}

        loader = self.dm.test_dataloader()
        for batch in loader:
            mix = jnp.asarray(batch["noisy"])
            target = np.asarray(batch["clean"])
            key, sub = jax.random.split(key)
            est = np.asarray(self._bucketed_enhance(params, mix, sub))
            lengths = np.asarray(batch.get(
                "length", [mix.shape[1]] * mix.shape[0]))
            keys = batch.get("key", [f"clip{len(results) + i}"
                                     for i in range(mix.shape[0])])
            for i, name in enumerate(keys):
                t_i = int(lengths[i])
                est_i = est[i, :t_i, 0][None, None, :]
                tgt_i = target[i, :t_i, 0][None, None, :]
                entry: Dict[str, float] = {}
                for lname, loss in self.enh_losses.items():
                    vals = loss(est_i, tgt_i)
                    if not isinstance(vals, dict):
                        vals = {"": vals}
                    for sub_name, v in vals.items():
                        entry[(lname + sub_name).replace("val/", "")] = float(v)
                results[str(name)] = entry

        summary = summarize(results)
        if jax.process_index() == 0:
            with open(self.output_dir / "test_results.json", "w") as f:
                json.dump(results, f, indent=2)
            with open(self.output_dir / "test_summary.json", "w") as f:
                json.dump(summary, f, indent=2)
        self._log({f"test/{k}": v for k, v in summary.items()
                   if k != "number"}, step)
        log.info("test @%d over %d files: %s", step, int(summary.get(
            "number", 0)), {k: round(v, 4) for k, v in summary.items()})
        return summary

    def _tb_audio(self, tag, samples, step, fs):
        """tensorboardX.add_audio builds its wav via soundfile, which is not
        in this image — encode 16-bit PCM with scipy and emit the Audio
        summary proto directly."""
        import io

        from scipy.io import wavfile
        from tensorboardX.proto.summary_pb2 import Summary

        x = np.clip(np.asarray(samples, dtype=np.float32).reshape(-1),
                    -1.0, 1.0)
        buf = io.BytesIO()
        wavfile.write(buf, fs, (x * 32767.0).astype(np.int16))
        audio = Summary.Audio(sample_rate=fs, num_channels=1,
                              length_frames=x.shape[0],
                              encoded_audio_string=buf.getvalue(),
                              content_type="audio/wav")
        self.tb._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)

    def _log_audio_samples(self, step, batch_idx, mix, tgt, est):
        """Loudness-matched validation audio in TensorBoard
        (reference universe.py:662-704)."""
        num = self.model.val_kwargs.get("num_tb_samples", 0)
        if self.tb is None or num <= 0 or batch_idx > 0:
            return
        from ..metrics.loudness import loudness

        fs = self.model.fs
        for idx in range(min(num, est.shape[0])):
            mix_i = mix[idx, :, 0]
            mix_norm = mix_i * 0.95 / max(np.max(np.abs(mix_i)), 1e-9)
            mix_loud = loudness(mix_i, fs)
            if not self._first_val_done:
                self._tb_audio(f"mix/{idx}", mix_norm, step, fs)
                tgt_loud = loudness(tgt[idx, 0], fs)
                gain = 10.0 ** ((mix_loud - tgt_loud) / 20.0)
                self._tb_audio(f"target/{idx}", tgt[idx, 0] * gain, step, fs)
            est_loud = loudness(est[idx, 0], fs)
            gain = 10.0 ** ((mix_loud - est_loud) / 20.0)
            self._tb_audio(f"enh/{idx}", est[idx, 0] * gain, step, fs)
        self._first_val_done = True

    # ------------------------------------------------------------------
    def _checkpointer(self):
        """Persistent AsyncCheckpointer: the storage write overlaps training
        (only the host copy of the state is synchronous), so a multi-GB
        checkpoint does not stall the step loop."""
        if getattr(self, "_async_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._async_ckptr = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler())
        return self._async_ckptr

    def _wait_for_saves(self):
        if getattr(self, "_async_ckptr", None) is not None:
            self._async_ckptr.wait_until_finished()
            self._commit_last_json()

    def _commit_last_json(self):
        """Point last.json / index.json / best.json at FINALIZED checkpoints
        only.  Written only after wait_until_finished(), so a crash during an
        in-flight async write can never leave the metadata referencing a
        partial checkpoint — resume falls back to the previous finalized step.

        index.json accumulates one entry per checkpoint with the monitored
        validation metric (validation.main_loss, e.g. val/pesq — the
        reference encodes it in the Lightning ModelCheckpoint filename,
        train.py:64-76); best.json points at the argbest entry, replacing
        the reference's pick-by-filename checkpoint selection."""
        pending = getattr(self, "_pending_last", None)
        if pending is not None and jax.process_index() == 0:
            ckpt_dir = self.output_dir / "checkpoints"
            step_, path_, metric = pending
            with open(ckpt_dir / "last.json", "w") as f:
                json.dump({"step": step_, "path": str(path_)}, f)

            main_name = self.model.val_kwargs.get("main_loss")
            index_path = ckpt_dir / "index.json"
            index = []
            if index_path.exists():
                with open(index_path) as f:
                    index = json.load(f)
            index = [e for e in index if e["step"] != step_]
            index.append({"step": step_, "path": str(path_),
                          "metric": main_name, "value": metric})
            with open(index_path, "w") as f:
                json.dump(index, f, indent=2)

            scored = [e for e in index if e.get("value") is not None]
            if scored:
                mode = self.model.val_kwargs.get("main_loss_mode", "min")
                pick = max if mode == "max" else min
                best = pick(scored, key=lambda e: e["value"])
                with open(ckpt_dir / "best.json", "w") as f:
                    json.dump(best, f)
        self._pending_last = None

    def save(self, step: int):
        # NOTE: in multi-host runs EVERY process must enter the orbax save
        # (its commit/finalize path synchronizes across processes); only the
        # last.json metadata write is rank-0 gated.
        ckptr = self._checkpointer()
        ckptr.wait_until_finished()  # at most one save in flight
        self._commit_last_json()
        path = self.output_dir / "checkpoints" / f"step_{step:08d}"
        ckptr.save(path.absolute(), jax.device_get(self.state), force=True)
        # monitored metric from the newest validation, staged with the save
        # and committed to index/best only after the write is finalized
        main_name = self.model.val_kwargs.get("main_loss")
        metric = getattr(self, "_last_val", {}).get(main_name)
        self._pending_last = (step, path, metric)
        log.info("saving checkpoint %s (async)", path)

    def restore(self, path: str):
        import orbax.checkpoint as ocp

        self._wait_for_saves()
        p = Path(path)
        if p.is_dir() and not (p / "last.json").exists() \
                and (p / "checkpoints" / "last.json").exists():
            p = p / "checkpoints"  # a run dir, not its checkpoints subdir
        if p.is_dir() and (p / "last.json").exists():
            with open(p / "last.json") as f:
                p = Path(json.load(f)["path"])
        # Template from shape/dtype metadata only: device_get-ing the whole
        # freshly-initialized state just to shape the restore is a multi-GB
        # device->host transfer, and bulk transfers are the axon tunnel's
        # known wedge point (r3: a resume hung >15 min in exactly that
        # device_get with the service itself healthy).
        template = jax.tree.map(
            lambda x: np.zeros(getattr(x, "shape", ()),
                               getattr(x, "dtype", np.int64)),
            self.state)
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(p.absolute(), item=template)
        self.state = shard_params(self.mesh, restored,
                                  min_last=self.tp_min_shard)
        log.info("restored checkpoint %s (step %d)", p,
                 int(self.state["step"]))
