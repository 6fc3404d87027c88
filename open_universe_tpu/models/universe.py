"""The UNIVERSE(++) diffusion model: functional core.

TPU-native re-design of the reference Lightning module
(/root/reference/open_universe/networks/universe/universe.py).  Everything is
a pure function over (params, rng-key, data): the iterative ``enhance``
sampler compiles to a single jitted program with a ``lax.scan`` over
diffusion steps; EMA/optimizer/validation state live in the training loop
(open_universe_tpu/train), not the model.

Supported feature surface (parity with the reference):
  * geometric sigma schedule; EDM network parameterization (universe.py:175-209)
  * six time-sampling modes incl. adaptive binning (universe.py:414-470)
  * score MSE + two MDN losses with NaN skipping (universe.py:472-542)
  * full sampler: warm start, fake analytic score probe, ensemble with
    mean/median/signal-median reduction, RMS keeping (universe.py:231-375)
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import utils
from ..nn.module import Module, Params
from ..utils.params import at_least_f32
from .condition import ConditionerNetwork
from .mdn import MixtureDensityNetworkLoss
from .score import ScoreNetwork
from .transforms import IdentityTransform


def _cfg(d: Optional[Dict[str, Any]], **defaults) -> Dict[str, Any]:
    out = dict(defaults)
    if d:
        out.update(d)
    return out


def finite_or_skip(loss_fn, est):
    """Jit-safe analog of the reference's eager per-step isnan skip
    (universe.py:526-539).  A plain ``where`` on a non-finite loss still
    back-propagates NaN — the zero cotangent multiplies inf/NaN partials
    saved from the bad forward — so when the loss is non-finite it is
    recomputed at zeroed estimates (finite partials; the input ``where``
    zeroes the gradient into the network) and gated out of the total
    (double-where).  Uses isfinite rather than isnan: an inf loss would
    otherwise make the total inf.  Returns (term for the total, raw value
    for metrics)."""
    raw = loss_fn(est)
    bad = ~jnp.isfinite(raw)
    safe = loss_fn(jnp.where(bad, jnp.zeros_like(est), est))
    return jnp.where(bad, 0.0, safe), raw


def randn_sigma(key, shape, sigma, dtype=jnp.float32):
    """Noise scaled per-batch by sigma: (B,) -> (B, T, C)."""
    z = jax.random.normal(key, shape, dtype)
    return z * sigma[:, None, None]


class Universe(Module):
    """UNIVERSE score-based speech enhancement model (MDN-loss variant)."""

    def __init__(
        self,
        fs: int = 16000,
        normalization_norm=2,
        score_model: Optional[ScoreNetwork] = None,
        condition_model: Optional[ConditionerNetwork] = None,
        diffusion: Optional[dict] = None,
        losses: Optional[dict] = None,
        training: Optional[dict] = None,
        validation: Optional[dict] = None,
        transform: Optional[Module] = None,
        normalization_kwargs: Optional[dict] = None,
        with_noise_target: bool = False,
        detach_cond: bool = False,
        edm: Optional[dict] = None,
        optimizer: Optional[dict] = None,
        scheduler: Optional[dict] = None,
        grad_clipper: Optional[dict] = None,
    ):
        # optimization configs are consumed by the training loop, not the model
        self.opt_kwargs = optimizer
        self.schedule_kwargs = scheduler
        self.grad_clip_kwargs = grad_clipper
        self.fs = fs
        self.normalization_norm = normalization_norm
        self.normalization_kwargs = _cfg(normalization_kwargs)
        self.with_noise_target = with_noise_target
        self.detach_cond = detach_cond

        self.diff_kwargs = _cfg(diffusion, schedule="geometric", sigma_min=5e-4,
                                sigma_max=5.0, n_steps=8, epsilon=1.3)
        self.losses_kwargs = _cfg(losses, weights={"score": 1.0, "signal": 1.0,
                                                   "latent": 1.0},
                                  mdn_n_comp=3, mdn_alpha_per_sample=True)
        self.train_kwargs = _cfg(training, audio_len=2.0,
                                 time_sampling="time_uniform",
                                 dynamic_mixing=False, ema_decay=0.999)
        self.val_kwargs = _cfg(validation, main_loss="val/pesq",
                               main_loss_mode="max", n_bins=5, max_enh_batches=4,
                               enh_losses={})

        self.score_model = score_model if score_model is not None else ScoreNetwork()
        self.condition_model = (condition_model if condition_model is not None
                                else ConditionerNetwork())

        self.with_edm = edm is not None
        self.edm_kwargs = _cfg(edm) if edm else {}

        self.n_channels = self.score_model.n_channels
        rate_factors = self.score_model.rate_factors
        self.n_stages = len(rate_factors)
        self.latent_n_channels = 2 ** self.n_stages * self.n_channels
        self.tot_ds = math.prod(rate_factors)

        self.transform = transform if transform is not None else IdentityTransform()

        self.init_losses()

    # ------------------------------------------------------------------ setup
    def init_losses(self):
        lk = self.losses_kwargs
        weights = lk.get("weights", {})
        cond_in = self.condition_model.input_channels
        num_targets = 2 if self.with_noise_target else 1
        audio_len = self.train_kwargs["audio_len"]

        if weights.get("signal", 0.0) > 0.0:
            self.loss_signal = MixtureDensityNetworkLoss(
                est_channels=self.n_channels,
                tgt_channels=cond_in * num_targets,
                n_comp=lk.get("mdn_n_comp", 3),
                sampling_rate=self.fs // cond_in,
                sample_len_s=audio_len,
                alpha_per_sample=lk.get("mdn_alpha_per_sample", False))
        else:
            self.loss_signal = None
        if weights.get("latent", 0.0) > 0.0:
            self.loss_latent = MixtureDensityNetworkLoss(
                est_channels=self.latent_n_channels,
                tgt_channels=self.condition_model.n_mels * num_targets,
                n_comp=lk.get("mdn_n_comp", 3),
                sampling_rate=self.fs // (cond_in * self.tot_ds),
                sample_len_s=audio_len,
                alpha_per_sample=lk.get("mdn_alpha_per_sample", False))
        else:
            self.loss_latent = None

    def model_param_keys(self) -> Tuple[str, ...]:
        """Sub-trees tracked by EMA / sampled at eval (loss modules excluded)."""
        return ("score_model", "condition_model")

    # ------------------------------------------------------------- primitives
    def _train_dtype(self):
        """Mixed-precision training policy (training.compute_dtype=bf16):
        networks run in bfloat16, losses/params/optimizer stay float32."""
        cd = self.train_kwargs.get("compute_dtype")
        if cd in ("bf16", "bfloat16"):
            return jnp.bfloat16
        return None

    def _cast_tree(self, tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    def normalize_batch(self, batch, norm=None):
        if norm is None:
            norm = self.normalization_norm
        return utils.normalize_batch(batch, norm=norm, **self.normalization_kwargs)

    def pad(self, x, pad=None):
        if pad is None:
            pad = self.tot_ds - x.shape[1] % self.tot_ds
        return jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0))), pad

    def unpad(self, x, pad):
        return x[:, pad // 2 : x.shape[1] - (pad - pad // 2)]

    def get_std_dev(self, time):
        if self.diff_kwargs["schedule"] == "geometric":
            s_min = self.diff_kwargs["sigma_min"]
            s_max = self.diff_kwargs["sigma_max"]
            return s_min * (s_max / s_min) ** time
        raise NotImplementedError(self.diff_kwargs["schedule"])

    def _edm_weights(self, sigma):
        level_db = self.edm_kwargs.get(
            "data_level_db", self.normalization_kwargs.get("level_db", 0.0))
        sigma_data = 10.0 ** (level_db / 20.0)
        sigma_norm = jnp.sqrt(sigma**2 + sigma_data**2)
        return {
            "skip": sigma_data**2 / (sigma**2 + sigma_data**2),
            "in": 1.0 / sigma_norm,
            "out": sigma * sigma_data / sigma_norm,
            "noise": self.edm_kwargs["noise"],
        }

    def score(self, params: Params, x, sigma, cond, with_speech_est=False,
              packed=False):
        """Score function; applies the EDM wrapper when configured."""
        if not self.with_edm:
            s = self.score_model(params["score_model"], x, sigma, cond,
                                 packed=packed)
            if with_speech_est:
                sig2 = (sigma**2)[:, None, None]
                return s, x + sig2 * s
            return s
        w = self._edm_weights(sigma)
        w_in = w["in"][:, None, None]
        w_out = w["out"][:, None, None]
        w_skip = w["skip"][:, None, None]
        net_out = self.score_model(
            params["score_model"], w_in * x, w["noise"] * sigma, cond,
            packed=packed)
        speech_est = w_skip * x + w_out * net_out
        score = (speech_est - x) / (sigma[:, None, None] ** 2)
        if with_speech_est:
            return score, speech_est
        return score

    def transform_is_identity(self) -> bool:
        return isinstance(self.transform, IdentityTransform)

    def aux_to_wav(self, params: Params, y_aux):
        return y_aux

    def _cond_train(self, cond_params, mix_trans, mix_wav):
        """Conditioner forward (train mode); separated for jax.checkpoint."""
        return self.condition_model(cond_params, mix_trans, x_wav=mix_wav,
                                    train=True)

    # ----------------------------------------------------------- time sampling
    def sample_sigma(self, key, batch_size: int, time_sampling="time_uniform",
                     t_min=0.0, t_max=1.0, pr_cum=None, bins=None):
        """Sample (sigma, time) per batch element; all six reference modes."""
        s_min = self.diff_kwargs["sigma_min"]
        s_max = self.diff_kwargs["sigma_max"]
        u = jax.random.uniform(key, (batch_size,))
        time = (t_max - t_min) * u + t_min

        if time_sampling == "time_uniform":
            pass
        elif time_sampling == "sigma_linear":
            sigma = (s_max - s_min) * time + s_min
            return sigma, time
        elif time_sampling == "diffsym":
            sigma = (s_max - s_min) * time + s_min
            sigma = s_max + s_min - sigma
            num = jnp.log10((s_max + s_min - sigma) / s_min)
            denom = math.log10(s_max / s_min)
            time = 1.0 - num / denom
        elif time_sampling == "adaptive":
            time = self._adaptive_time(key, batch_size, pr_cum, bins)
        elif time_sampling == "time_discrete":
            n_steps = self.diff_kwargs.get("n_steps", 32)
            steps = jnp.linspace(0.0, 1.0, n_steps)
            idx = jnp.argmin(jnp.abs(steps[:, None] - time[None, :]), axis=0)
            time = steps[idx]
        elif time_sampling.startswith("time_normal"):
            try:
                alpha = float(time_sampling.split("_")[2])
            except (IndexError, ValueError):
                alpha = 0.95
            time = utils.center_truncated_normal(
                key, area=alpha, minval=t_min, maxval=t_max, shape=(batch_size,))
        else:
            raise NotImplementedError(time_sampling)

        return self.get_std_dev(time), time

    def _adaptive_time(self, key, batch_size, pr_cum, bins):
        """Bin-weighted uniform time sampling from the validation histogram."""
        if pr_cum is None or bins is None:
            return jax.random.uniform(key, (batch_size,))
        k1, k2 = jax.random.split(key)
        n_bins = bins.shape[0] - 1
        dice = jax.random.uniform(k1, (batch_size,))
        # invert the cumulative distribution to pick a bin per sample
        bin_idx = jnp.clip(
            jnp.searchsorted(pr_cum, dice, side="right") - 1, 0, n_bins - 1)
        lo = bins[bin_idx]
        hi = bins[bin_idx + 1]
        return lo + (hi - lo) * jax.random.uniform(k2, (batch_size,))

    # ----------------------------------------------------------------- losses
    def compute_losses(self, params: Params, key, mix, target, train=True,
                       time_sampling="time_uniform", t_min=0.0, t_max=1.0,
                       pr_cum=None, bins=None):
        """mix/target: (B, T, C), already amplitude-normalized."""
        k_sigma, k_noise = jax.random.split(key)
        dt = self._train_dtype()
        if dt is not None:
            # networks in bf16; sigma must follow or x_t (and with it the
            # whole score U-Net) silently promotes back to f32.  The MDN loss
            # modules keep f32 params, so losses compute in f32.
            cast_keys = [k for k in self.model_param_keys() if k in params]
            params = {**params,
                      **{k: self._cast_tree(params[k], dt) for k in cast_keys}}
            mix = mix.astype(dt)
            target = target.astype(dt)
        tp = params.get("transform", {})
        mix_trans = self.transform(tp, mix)
        tgt_trans = self.transform(tp, target)

        if self.with_noise_target:
            noise = mix - target
            target_aux = jnp.concatenate((target, noise), axis=-1)
            target_aux_trans = jnp.concatenate(
                (tgt_trans, self.transform(tp, noise)), axis=-1)
        else:
            target_aux = target
            target_aux_trans = tgt_trans

        sigma, time = self.sample_sigma(k_sigma, mix.shape[0], time_sampling,
                                        t_min, t_max, pr_cum=pr_cum, bins=bins)
        sigma_c = sigma.astype(tgt_trans.dtype)

        z = jax.random.normal(k_noise, tgt_trans.shape, tgt_trans.dtype)
        x_t = tgt_trans + sigma_c[:, None, None] * z

        remat = train and self.train_kwargs.get("remat", False)
        cond_fn = (jax.checkpoint(self._cond_train)
                   if remat else self._cond_train)
        score_fn = jax.checkpoint(self.score) if remat else self.score

        cond, y_est, h_est = cond_fn(params["condition_model"], mix_trans, mix)
        if self.detach_cond:
            cond = [jax.lax.stop_gradient(c) for c in cond]

        score = score_fn(params, x_t, sigma_c, cond)
        l_score = jnp.mean(jnp.square(
            sigma[:, None, None] * at_least_f32(score)
            + at_least_f32(z)))

        if not train:
            return l_score

        weights = self.losses_kwargs["weights"]
        zero = jnp.zeros((), l_score.dtype)

        if weights.get("latent", 0.0) > 0.0 and h_est is not None:
            mel_target = self.condition_model.input_mel.compute_mel_spec(target_aux)
            norm = jnp.sqrt(jnp.sum(mel_target**2, axis=(-2, -1), keepdims=True))
            mel_target = mel_target / jnp.maximum(norm, 1e-5)
            l_latent_term, l_latent = finite_or_skip(
                lambda e: self.loss_latent(params["loss_latent"], e,
                                           mel_target), h_est)
        else:
            l_latent_term = l_latent = zero

        if weights.get("signal", 0.0) > 0.0:
            l_signal_term, l_signal = finite_or_skip(
                lambda e: self.loss_signal(params["loss_signal"], e,
                                           target_aux_trans), y_est)
        else:
            l_signal_term = l_signal = zero

        loss = (weights.get("score", 1.0) * l_score
                + weights.get("signal", 0.0) * l_signal_term
                + weights.get("latent", 0.0) * l_latent_term)
        return loss, l_score, l_signal, l_latent, time

    def training_losses(self, params: Params, key, mix, target,
                        pr_cum=None, bins=None):
        """Normalization + loss; entry point for the jitted train step.

        pr_cum/bins: traced arrays for 'adaptive' time sampling — the
        cumulative validation-score histogram built by Trainer.validate
        (reference universe.py:414-470,630-638).  Ignored in other modes.
        """
        k_mix, k_loss = jax.random.split(key)
        if self.train_kwargs.get("dynamic_mixing", False):
            noise = mix - target
            perm = jax.random.permutation(k_mix, mix.shape[0])
            mix = target + noise[perm]
        (mix, target), *_ = self.normalize_batch((mix, target))
        loss, l_score, l_signal, l_latent, t = self.compute_losses(
            params, k_loss, mix, target, train=True,
            time_sampling=self.train_kwargs["time_sampling"],
            pr_cum=pr_cum, bins=bins)
        metrics = {"train/loss": loss, "train/score": l_score,
                   "train/signal": l_signal, "train/latent": l_latent,
                   "train/time_mean": jnp.mean(t.astype(jnp.float32))}
        return loss, metrics

    # ---------------------------------------------------------------- sampler
    def enhance(
        self,
        params: Params,
        mix: jax.Array,
        key: Optional[jax.Array] = None,
        n_steps: Optional[int] = None,
        epsilon: Optional[float] = None,
        target: Optional[jax.Array] = None,
        fake_score_snr: Optional[float] = None,
        use_aux_signal: bool = False,
        keep_rms: bool = False,
        ensemble: Optional[int] = None,
        ensemble_stat: str = "median",
        warm_start: Optional[int] = None,
        compute_dtype: Optional[Any] = None,
        packed: Optional[bool] = None,
    ) -> jax.Array:
        """Iterative score-based enhancement (reference universe.py:231-375).

        mix: (T,), (B, T) or (B, T, C) waveform.  All sizing arguments are
        static; wrap in jax.jit with the corresponding static_argnames.

        compute_dtype: run the score/conditioner networks in this dtype
        (e.g. jnp.bfloat16 for ~1.4x throughput on TPU) while sampler state,
        normalization, and the STFT front-end stay float32.

        packed: lane-packed (time-packed) execution of the conv U-Nets
        (ops/packed.py; numerically exact).  None = auto: enabled at small
        batch where it measures up to 2.7x faster on v5e (see
        _enhance_impl); True/False force it (also OPEN_UNIVERSE_PACKED=1/0).
        """
        from ..ops import pallas as _pallas_config

        with _pallas_config.inference_scope():
            return self._enhance_impl(
                params, mix, key=key, n_steps=n_steps, epsilon=epsilon,
                target=target, fake_score_snr=fake_score_snr,
                use_aux_signal=use_aux_signal, keep_rms=keep_rms,
                ensemble=ensemble, ensemble_stat=ensemble_stat,
                warm_start=warm_start, compute_dtype=compute_dtype,
                packed=packed)

    def _enhance_impl(
        self,
        params: Params,
        mix: jax.Array,
        key: Optional[jax.Array] = None,
        n_steps: Optional[int] = None,
        epsilon: Optional[float] = None,
        target: Optional[jax.Array] = None,
        fake_score_snr: Optional[float] = None,
        use_aux_signal: bool = False,
        keep_rms: bool = False,
        ensemble: Optional[int] = None,
        ensemble_stat: str = "median",
        warm_start: Optional[int] = None,
        compute_dtype: Optional[Any] = None,
        packed: Optional[bool] = None,
    ) -> jax.Array:
        if compute_dtype is not None:
            params = {**params,
                      **{k: self._cast_tree(params[k], compute_dtype)
                         for k in self.model_param_keys() if k in params}}
        net_dtype = compute_dtype or jnp.float32
        if key is None:
            key = jax.random.key(0)
        if epsilon is None:
            epsilon = self.diff_kwargs["epsilon"]
        if n_steps is None:
            n_steps = self.diff_kwargs["n_steps"]

        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]
        elif x_ndim > 3:
            raise ValueError("input should have at most 3 dimensions")

        mix_rms = jnp.sqrt(jnp.mean(mix**2, axis=(-2, -1), keepdims=True))

        if ensemble is not None:
            mix_shape = mix.shape
            mix = jnp.tile(mix, (ensemble, 1, 1))

        mix_len = mix.shape[1]
        mix, pad = self.pad(mix)
        if target is not None:
            if target.ndim == 1:
                target = target[None, :, None]
            elif target.ndim == 2:
                target = target[:, :, None]
            if ensemble is not None:
                # the mix was ensemble-tiled above; the fake-score target
                # must follow or normalize_batch broadcasts (E*B) vs (B)
                target = jnp.tile(target, (ensemble, 1, 1))
            target, _ = self.pad(target, pad=pad)

        (mix, target), *_ = self.normalize_batch((mix, target))
        mix_wav = mix
        tp = params.get("transform", {})
        mix = self.transform(tp, mix)
        if target is not None:
            target_t = self.transform(tp, target)
        else:
            target_t = None

        score_snr = 5.0 if fake_score_snr is None else fake_score_snr

        # Lane-packed (time-packed) execution of the conv U-Nets
        # (ops/packed.py; numerically exact, tested).  Measured on v5e,
        # 2 s/16 kHz clips, bf16, throughput in audio-s/s/chip:
        #     batch      1     4     8     16    32    64    128
        #     default   182   198   ~400   601   513   764   1186
        #     packed    207   535   1089  1187  1197  1150   674
        # At batch < 128 XLA's batch-in-lanes conv layout starves (only B of
        # 128 lanes filled) and packed wins up to 2.7x — single-clip latency
        # drops from 11.0 to 9.7 ms; at B=128 the extra boundary relayouts
        # make it a net loss.  Auto policy: enable when eligible and the
        # (ensemble-expanded) batch is <= 64.  Explicit `packed=` or
        # OPEN_UNIVERSE_PACKED=1/0 overrides.
        import os

        # precedence: explicit packed= argument > OPEN_UNIVERSE_PACKED env >
        # batch-size auto policy.  NOTE the env var is read at TRACE time —
        # it is baked into the jit cache; changing it after a compile has no
        # effect on already-compiled shapes.
        if packed is None:
            env = os.environ.get("OPEN_UNIVERSE_PACKED")
            if env in ("0", "1"):
                packed = env == "1"
            else:
                packed = mix.shape[0] <= 64
        packed = (packed
                  and self.score_model.packed_eligible(mix.shape[1])
                  and self.condition_model.packed_eligible(mix.shape[1])
                  and self.transform_is_identity())

        def score_fn(x, s, cond, k):
            if target_t is None:
                return self.score(params, x.astype(net_dtype),
                                  s.astype(net_dtype), cond, packed=packed
                                  ).astype(jnp.float32)
            # quirk intentionally FIXED vs the reference: the analytic score
            # is computed against the TRANSFORMED target (x lives in the
            # transform domain); reference universe.py:276 calls
            # self.transform(target) but discards the result, so with a
            # non-identity transform its fake-score probe mixes domains
            true_score = -(x - target_t) / s[:, None, None] ** 2
            score_rms = jnp.sqrt(jnp.mean(true_score**2))
            noise_rms = score_rms * 10.0 ** (-score_snr / 20.0)
            return true_score + jax.random.normal(k, true_score.shape) * noise_rms

        # sampler coefficients (universe.py:300-311)
        delta_t = 1.0 / (n_steps - 1)
        gamma = (self.diff_kwargs["sigma_max"] / self.diff_kwargs["sigma_min"]) ** (
            -delta_t)
        eta = 1.0 - gamma**epsilon
        beta = math.sqrt(1.0 - gamma ** (2.0 * (epsilon - 1.0)))

        time = jnp.linspace(0.0, 1.0, n_steps)[::-1]
        sigma = self.get_std_dev(time).astype(mix.dtype)  # (n_steps,)
        bsz = mix.shape[0]

        cond, aux_signal, _ = self.condition_model(
            params["condition_model"], mix.astype(net_dtype),
            x_wav=mix_wav.astype(net_dtype), train=True, packed=packed)
        aux_signal = aux_signal.astype(jnp.float32)

        if use_aux_signal:
            x = self.aux_to_wav(params, aux_signal.astype(net_dtype)
                                ).astype(jnp.float32)
        else:
            k_init, k_loop = jax.random.split(key)
            if warm_start is None:
                s0 = jnp.broadcast_to(sigma[0], (bsz,))
                x = randn_sigma(k_init, mix.shape, s0, mix.dtype)
                n_start = 0
            else:
                sig = self.aux_to_wav(params, aux_signal)
                s0 = jnp.broadcast_to(sigma[warm_start], (bsz,))
                x = sig + randn_sigma(k_init, sig.shape, s0, mix.dtype)
                n_start = warm_start

            n_loop = n_steps - 1 - n_start
            step_keys = jax.random.split(k_loop, 2 * n_loop + 1)

            # EDM fast path: fold the network wrapper into the sampler
            # update.  With speech_est = w_skip*x + w_out*net_out and
            # score = (speech_est - x)/sigma^2, the step
            #     x <- x + sigma^2*eta*score + beta*z
            # is algebraically
            #     x <- (1 - eta + eta*w_skip)*x + eta*w_out*net_out + beta*z
            # which needs only TWO layout-crossing (B,T,1) elementwise ops
            # per step (the bf16 net input and the f32 update reading the
            # bf16 net output) instead of the ~5 the generic score()
            # wrapper materializes (bf16 speech_est/score intermediates in
            # XLA's batch-minor conv layout run at ~1/16 sublane
            # utilization; ~2% end-to-end on v5e at batch 128).
            # _disable_edm_fast exists for the equivalence test (and as an
            # escape hatch): both branches must produce the same samples.
            edm_fast = (self.with_edm and target_t is None
                        and not getattr(self, "_disable_edm_fast", False))

            if edm_fast:
                w = self._edm_weights(sigma)  # vectors over the schedule

                def body(x, inp):
                    s_next, w_in, w_out, w_skip, k_z, noise_s = inp
                    net_in = (w_in * x).astype(net_dtype)
                    net_out = self.score_model(
                        params["score_model"], net_in,
                        jnp.broadcast_to(noise_s, (bsz,)).astype(net_dtype),
                        cond, packed=packed)
                    cx = 1.0 - eta + eta * w_skip
                    cn = eta * w_out
                    z = jax.random.normal(k_z, x.shape, x.dtype)
                    x = cx * x + cn * net_out.astype(jnp.float32) \
                        + (beta * s_next) * z
                    return x, None

                noise_sig = w["noise"] * sigma  # net's sigma input per step
                xs = (sigma[n_start + 1 : n_steps],
                      w["in"][n_start : n_steps - 1],
                      w["out"][n_start : n_steps - 1],
                      w["skip"][n_start : n_steps - 1],
                      step_keys[n_loop : 2 * n_loop],
                      noise_sig[n_start : n_steps - 1])
                x, _ = jax.lax.scan(body, x, xs)

                # final denoise: x + sigma^2*score == speech_est
                net_in = (w["in"][-1] * x).astype(net_dtype)
                net_out = self.score_model(
                    params["score_model"], net_in,
                    jnp.broadcast_to(noise_sig[-1], (bsz,)).astype(net_dtype),
                    cond, packed=packed)
                x = w["skip"][-1] * x + w["out"][-1] * net_out.astype(
                    jnp.float32)
            else:
                def body(x, inp):
                    s_now, s_next, k_score, k_z = inp
                    s_now_b = jnp.broadcast_to(s_now, (bsz,))
                    score = score_fn(x, s_now_b, cond, k_score)
                    z = jax.random.normal(k_z, x.shape, x.dtype) * s_next
                    x = x + s_now**2 * eta * score + beta * z
                    return x, None

                xs = (sigma[n_start : n_steps - 1],
                      sigma[n_start + 1 : n_steps],
                      step_keys[:n_loop], step_keys[n_loop : 2 * n_loop])
                x, _ = jax.lax.scan(body, x, xs)

                s_last = jnp.broadcast_to(sigma[-1], (bsz,))
                score = score_fn(x, s_last, cond, step_keys[-1])
                x = x + sigma[-1] ** 2 * score

        x = self.transform(tp, x, inv=True)
        x = self.unpad(x, pad)
        if x.shape[1] < mix_len:
            x = jnp.pad(x, ((0, 0), (0, mix_len - x.shape[1]), (0, 0)))

        if keep_rms:
            x_rms = jnp.sqrt(jnp.mean(x**2, axis=(-2, -1), keepdims=True))
            x = x * (mix_rms if ensemble is None else jnp.tile(mix_rms, (ensemble, 1, 1))
                     ) / jnp.maximum(x_rms, 1e-5)

        scale = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        x = jnp.where(scale > 1.0, x / scale, x)

        if ensemble is not None:
            x = x.reshape((-1,) + mix_shape)
            if ensemble_stat == "mean":
                x = jnp.mean(x, axis=0)
            elif ensemble_stat == "median":
                x = jnp.median(x, axis=0)
            elif ensemble_stat == "signal_median":
                x = utils.signal_median(x)
            else:
                raise NotImplementedError(ensemble_stat)

        if x_ndim == 1:
            x = x[0, :, 0]
        elif x_ndim == 2:
            x = x[:, :, 0]
        return x
