"""Model loading: local Lightning checkpoints, our own Trainer runs, or HF hub.

Mirrors the reference public API (inference_utils/model_loader.py): a model
spec is either a local ``*.ckpt`` path (config discovered at ``./config.yaml``
or ``../.hydra/config.yaml``), an HF repo ``repo[:revision]`` hosting
``weights.ckpt`` + ``config.yaml``, or — beyond the reference — a directory
of one of our own orbax Trainer runs (best.json/last.json selection).
Returns (model, params) with EMA weights folded in when present, weight norm
folded for inference speed.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml

from ..configs.registry import instantiate
from ..nn.module import Module
from .torch_convert import (
    apply_ema_shadow,
    convert_state_dict,
    fold_weight_norm,
)

log = logging.getLogger(__name__)

DEFAULT_MODEL = "line-corporation/open-universe:plusplus"


def ckpt_to_config_path(ckpt_path: Path) -> Path:
    """Config discovery rule of the reference (model_loader.py:33-48)."""
    for cand in (ckpt_path.parent / "config.yaml",
                 ckpt_path.parent.parent / ".hydra" / "config.yaml",
                 ckpt_path.parent / "hparams.yaml"):
        if cand.exists():
            return cand
    raise FileNotFoundError(f"no config.yaml found next to {ckpt_path}")


def _download_hf(repo: str, revision: Optional[str]) -> Tuple[Path, Path]:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is required for hub models") from e
    ckpt = hf_hub_download(repo_id=repo, filename="weights.ckpt",
                           revision=revision)
    cfg = hf_hub_download(repo_id=repo, filename="config.yaml",
                          revision=revision)
    return Path(ckpt), Path(cfg)


def _load_torch_ckpt(path: Path) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def _resolve_orbax_step(path: Path) -> Tuple[Path, Path]:
    """Resolve a Trainer run directory to (step_dir, config_path).

    Accepts a run dir (contains ``checkpoints/``), a ``checkpoints`` dir, or
    a single ``step_XXXXXXXX`` dir.  Within a checkpoints dir the selection
    order is best.json (argbest validation.main_loss, the reference's
    ModelCheckpoint monitor) then last.json (newest finalized)."""
    import json

    p = path
    if (p / "checkpoints").is_dir():
        p = p / "checkpoints"
    if p.name.startswith("step_"):
        step_dir = p
        ckpt_dir = p.parent
    else:
        ckpt_dir = p
        step_dir = None
        for meta in ("best.json", "last.json"):
            if (ckpt_dir / meta).exists():
                with open(ckpt_dir / meta) as f:
                    entry = json.load(f)
                cand = Path(entry["path"])
                if not cand.is_absolute():
                    # paths in the metadata are relative to the launch cwd;
                    # fall back to resolving against the checkpoints dir
                    if not cand.exists():
                        cand = ckpt_dir / cand.name
                step_dir = cand
                log.info("selected checkpoint %s via %s", step_dir.name, meta)
                break
        if step_dir is None:
            steps = sorted(ckpt_dir.glob("step_*"))
            if not steps:
                raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
            step_dir = steps[-1]
    cfg = ckpt_dir.parent / "config.yaml"
    if not cfg.exists():
        raise FileNotFoundError(f"no config.yaml found at {cfg}")
    return step_dir, cfg


def _load_orbax_run(path: Path, load_ema: bool) -> Tuple[Module,
                                                         Dict[str, Any]]:
    """Load (model, params) from one of our own Trainer run directories."""
    import orbax.checkpoint as ocp

    from ..train.ema import ema_apply

    step_dir, cfg_path = _resolve_orbax_step(path)
    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    model = instantiate(config.get("model", config))
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(step_dir.absolute())
    params = state["params"]
    if load_ema and state.get("ema") is not None:
        log.info("folding EMA shadow parameters")
        params = ema_apply(params, state["ema"])
    return model, params


def load_model(name_or_path: str, load_ema: bool = True,
               fold_wn: bool = True) -> Tuple[Module, Dict[str, Any]]:
    """Load a model + params from a local ckpt or the HF hub.

    Returns (model, params); run inference via
    ``model.enhance(params, mix, ...)``.
    """
    p = Path(name_or_path)
    if p.is_dir():
        # one of our own Trainer runs (orbax): run dir / checkpoints dir /
        # step dir; picks best.json (validation.main_loss) before last.json
        model, params = _load_orbax_run(p, load_ema)
        if fold_wn:
            params = fold_weight_norm(model, params)
        return model, jax_tree_asarray(params)
    if p.exists() and p.suffix == ".ckpt":
        ckpt_path, cfg_path = p, ckpt_to_config_path(p)
    else:
        if ":" in name_or_path:
            repo, rev = name_or_path.rsplit(":", 1)
        else:
            repo, rev = name_or_path, None
        ckpt_path, cfg_path = _download_hf(repo, rev)

    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    model_cfg = config.get("model", config)
    model = instantiate(model_cfg)

    ckpt = _load_torch_ckpt(ckpt_path)
    state_dict = ckpt.get("state_dict", ckpt)
    params, skipped = convert_state_dict(model, state_dict)
    real_skipped = [k for k in skipped
                    if not any(k.startswith(x) for x in ("enh_losses",))]
    if real_skipped:
        log.info("skipped %d checkpoint keys (buffers/metrics): %s...",
                 len(real_skipped), real_skipped[:5])

    ema = ckpt.get("ema")
    if load_ema and ema is not None and "shadow_params" in ema:
        log.info("loading EMA shadow parameters")
        subs = list(model.model_param_keys())
        if any(k.startswith("_edm_model.") for k in state_dict):
            subs = ["_edm_model" if s == "score_model" else s for s in subs]
        params = apply_ema_shadow(model, params, state_dict,
                                  ema["shadow_params"], subs)
    elif load_ema and ema is None:
        log.warning("EMA weights requested but not found in checkpoint")

    if fold_wn:
        params = fold_weight_norm(model, params)

    import jax.numpy as jnp

    params = {k: v for k, v in params.items()}
    params = jax_tree_asarray(params)
    return model, params


def jax_tree_asarray(tree):
    import jax.numpy as jnp
    import numpy as np

    if isinstance(tree, dict):
        return {k: jax_tree_asarray(v) for k, v in tree.items()}
    # np.array(copy=True): on the CPU backend jnp.asarray is ZERO-COPY for
    # aligned numpy inputs, and converted torch checkpoints arrive as
    # ``tensor.detach().numpy()`` VIEWS — without the copy, later in-place
    # torch mutation (an optimizer step, an EMA copy_to) silently mutates
    # the "converted" jax params
    return jnp.asarray(np.array(tree, copy=True))
