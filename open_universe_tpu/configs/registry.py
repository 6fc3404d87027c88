"""Registry-based ``instantiate`` replacing hydra.utils.instantiate.

Both the reference's ``open_universe.*`` target names (so published
HuggingFace ``config.yaml`` files load unchanged, cf. reference
inference_utils/model_loader.py:112-114) and our own
``open_universe_tpu.*`` names resolve to the same factories.

Factories receive the raw (non-recursively-instantiated) config kwargs and
instantiate their own children, matching the reference's pervasive
``_recursive_=False`` usage.
"""
from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional

_REGISTRY: Dict[str, Callable] = {}


def register(*names):
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn
    return deco


def _strip(cfg: dict) -> dict:
    return {k: v for k, v in cfg.items()
            if k not in ("_target_", "_recursive_", "_convert_", "_partial_")}


def instantiate(cfg: Any, **overrides):
    """Instantiate a config node: dict with _target_ -> registered factory."""
    if cfg is None:
        return None
    if isinstance(cfg, dict) and "_target_" in cfg:
        target = cfg["_target_"]
        fn = _REGISTRY.get(target)
        if fn is None:
            raise KeyError(
                f"no factory registered for _target_={target!r}; "
                f"known: {sorted(_REGISTRY)[:20]}...")
        kwargs = _strip(cfg)
        kwargs.update(overrides)
        return fn(**kwargs)
    return cfg


def has_target(name: str) -> bool:
    return name in _REGISTRY


# --------------------------------------------------------------------------
# factories
# --------------------------------------------------------------------------
def _both(name: str):
    """Register under both the reference and our package names."""
    return (f"open_universe.{name}", f"open_universe_tpu.{name}")


@register(*_both("networks.universe.ScoreNetwork"))
def build_score_network(**kw):
    from ..models.score import ScoreNetwork

    precoding = kw.pop("precoding", None)
    if precoding:
        precoding = instantiate(precoding)
    return ScoreNetwork(precoding=precoding, **kw)


@register(*_both("networks.universe.ConditionerNetwork"))
def build_conditioner_network(**kw):
    from ..models.condition import ConditionerNetwork

    precoding = kw.pop("precoding", None)
    if precoding:
        precoding = instantiate(precoding)
    return ConditionerNetwork(precoding=precoding, **kw)


def _common_universe_kwargs(kw: dict) -> dict:
    out = dict(kw)
    out["score_model"] = instantiate(kw.get("score_model"))
    out["condition_model"] = instantiate(kw.get("condition_model"))
    if kw.get("transform"):
        out["transform"] = instantiate(kw["transform"])
    losses = copy.deepcopy(kw.get("losses") or {})
    # the reference's score_loss is always torch.nn.MSELoss; our models
    # hardcode the MSE (validated here so a silent mismatch can't happen)
    sl = losses.pop("score_loss", None)
    if sl and sl.get("_target_", "").rsplit(".", 1)[-1] not in ("MSELoss",):
        raise NotImplementedError(f"score_loss {sl} not supported (MSE only)")
    aux = losses.pop("aux_loss", None)
    if aux:
        losses["aux_loss_module"] = instantiate(aux)
    out["losses"] = losses
    return out


@register(*_both("networks.universe.Universe"))
def build_universe(**kw):
    from ..models.universe import Universe

    return Universe(**_common_universe_kwargs(kw))


@register(*_both("networks.universe.UniverseGAN"))
def build_universe_gan(**kw):
    from ..models.universe_gan import UniverseGAN

    return UniverseGAN(**_common_universe_kwargs(kw))


@register(*_both("layers.dyn_range_comp.IdentityTransform"))
def build_identity_transform(**kw):
    from ..models.transforms import IdentityTransform

    return IdentityTransform()


@register(*_both("layers.dyn_range_comp.CompressedMagSTFT"))
def build_compressed_mag_stft(**kw):
    from ..models.transforms import CompressedMagSTFT

    return CompressedMagSTFT(**kw)


@register(*_both("layers.dyn_range_comp.CompressedMagSTFTPadded"))
def build_compressed_mag_stft_padded(**kw):
    from ..models.transforms import CompressedMagSTFTPadded

    return CompressedMagSTFTPadded(**kw)


@register(*_both("losses.MultiResL1SpecLoss"))
def build_multires_loss(**kw):
    from ..losses.multires_stft import MultiResL1SpecLoss

    return MultiResL1SpecLoss(**kw)


@register(*_both("losses.MultiLoss"))
def build_multi_loss(**kw):
    from ..losses.combine import MultiLoss

    losses = {k: (v[0], instantiate(v[1])) for k, v in kw["losses"].items()}
    return MultiLoss(losses)


@register(*_both("metrics.EvalMetrics"))
def build_eval_metrics(**kw):
    from ..metrics.eval import EvalMetrics

    return EvalMetrics(**kw)


@register(*_both("datasets.NoisyDataset"))
def build_noisy_dataset(**kw):
    from ..data.dataset import NoisyDataset

    return NoisyDataset(**kw)


@register(*_both("datasets.DataModule"))
def build_datamodule(**kw):
    from ..data.dataset import DataModule

    return DataModule(**kw)


# passthrough configs consumed by the training loop
for _n in ("torch.optim.AdamW", "torch.optim.Adam", "torch.nn.MSELoss",
           "open_universe.utils.schedulers.LinearWarmupCosineAnnealingLR",
           "open_universe_tpu.train.optim.LinearWarmupCosineAnnealingLR",
           "open_universe.utils.FixedClipper",
           "open_universe.utils.autoclip_module.FixedClipper",
           "open_universe.utils.autoclip_module.AutoClipper",
           "open_universe_tpu.train.optim.FixedClipper",
           "open_universe_tpu.train.optim.AutoClipper"):
    def _passthrough(_name=_n, **kw):
        return {"_target_": _name, **kw}
    _REGISTRY[_n] = _passthrough


@register(*_both("networks.universe.UniverseLoRA"))
def build_universe_lora(**kw):
    from ..models.universe_lora import UniverseLoRA

    model = kw.pop("model")
    if isinstance(model, dict):
        model = instantiate(model)
    # losses/enh_losses configs are instantiated inside UniverseLoRA
    return UniverseLoRA(model=model, **kw)


@register(*_both("losses.PhonemeCTCLoss"))
def build_phoneme_ctc_loss(**kw):
    from ..losses.phoneme_loss import PhonemeCTCLoss

    return PhonemeCTCLoss(**kw)


@register(*_both("losses.PhonemeLoss"))
def build_phoneme_loss(**kw):
    from ..losses.phoneme_loss import PhonemeLoss

    return PhonemeLoss(**kw)


@register(*_both("losses.PhonemeEmbeddingLoss"))
def build_phoneme_embedding_loss(**kw):
    from ..losses.phoneme_loss import PhonemeEmbeddingLoss

    return PhonemeEmbeddingLoss(**kw)
