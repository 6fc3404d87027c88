"""Import the reference torch implementation from /root/reference for golden
parity tests, without its heavy dependency closure.

The reference package ``__init__`` imports metrics/datasets/losses whose deps
(pesq, pystoi, onnxruntime, torchaudio, lightning, hydra, ...) are absent in
this image.  We therefore (a) register lightweight stand-ins for the absent
*external* packages (tests/ref_shims/), and (b) register stub package objects
for ``open_universe`` and ``open_universe.networks`` so their ``__init__``
files never execute — the individual network modules are then imported
directly (their own imports are torch/numpy/scipy only, cf. reference
blocks.py:19-27).

Nothing here is used outside the test suite.
"""
import importlib
import sys
import types
from pathlib import Path

REF_ROOT = Path("/root/reference")
SHIM_PATH = str(Path(__file__).resolve().parent / "ref_shims")

_SHIMMED = ("omegaconf", "hydra", "torch_ema", "pytorch_lightning",
            "torchaudio", "huggingface_hub")


def _ensure_shims():
    for name in _SHIMMED:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except ImportError:
            if SHIM_PATH not in sys.path:
                sys.path.insert(0, SHIM_PATH)
            importlib.import_module(name)


def _stub_package(name: str, path: Path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def load_reference():
    """Returns a namespace with the reference network modules loaded."""
    if not REF_ROOT.exists():  # pragma: no cover
        import pytest

        pytest.skip("/root/reference not available")
    _ensure_shims()
    if str(REF_ROOT) not in sys.path:
        sys.path.insert(0, str(REF_ROOT))

    _stub_package("open_universe", REF_ROOT / "open_universe")
    _stub_package("open_universe.networks", REF_ROOT / "open_universe" / "networks")
    uni_pkg = _stub_package(
        "open_universe.networks.universe",
        REF_ROOT / "open_universe" / "networks" / "universe")

    ns = types.SimpleNamespace()
    ns.blocks = importlib.import_module("open_universe.networks.universe.blocks")
    ns.sigma_block = importlib.import_module(
        "open_universe.networks.universe.sigma_block")
    ns.mdn = importlib.import_module("open_universe.networks.universe.mdn")
    ns.score = importlib.import_module("open_universe.networks.universe.score")
    ns.condition = importlib.import_module(
        "open_universe.networks.universe.condition")
    ns.bigvgan = importlib.import_module("open_universe.networks.bigvgan")
    ns.universe = importlib.import_module(
        "open_universe.networks.universe.universe")
    ns.universe_gan = importlib.import_module(
        "open_universe.networks.universe.universe_gan")
    ns.dyn_range_comp = importlib.import_module(
        "open_universe.layers.dyn_range_comp")
    ns.utils = importlib.import_module("open_universe.utils")
    # adapter classes (torch-only imports)
    ns.lora = importlib.import_module("open_universe.lora")
    # the UniverseLoRA Lightning module (its inference_utils import chain
    # needs the huggingface_hub shim and the enhancement base class)
    ns.enhancement = importlib.import_module(
        "open_universe.networks.enhancement")
    ns.lora_model = importlib.import_module(
        "open_universe.networks.universe.lora")
    # losses/__init__ pulls in phoneme_loss -> transformers; import the
    # multires module directly under a stub package
    _stub_package("open_universe.losses", REF_ROOT / "open_universe" / "losses")
    ns.multires = importlib.import_module("open_universe.losses.multires_stft")

    # populate the stub package with the names the reference config
    # ``_target_`` strings resolve through (networks/universe/__init__.py
    # normally does this, but it also imports lora.py -> huggingface_hub)
    uni_pkg.ScoreNetwork = ns.score.ScoreNetwork
    uni_pkg.ConditionerNetwork = ns.condition.ConditionerNetwork
    uni_pkg.Universe = ns.universe.Universe
    uni_pkg.UniverseGAN = ns.universe_gan.UniverseGAN
    uni_pkg.UniverseLoRA = ns.lora_model.UniverseLoRA
    uni_pkg.MixtureDensityNetworkLoss = ns.mdn.MixtureDensityNetworkLoss
    return ns


_FLOAT_RE = None


def _coerce_floats(node):
    """yaml 1.1 parses dot-less scientific notation (``5e-4``) as a string;
    omegaconf (the reference's loader) parses it as a float.  Coerce."""
    global _FLOAT_RE
    import re

    if _FLOAT_RE is None:
        _FLOAT_RE = re.compile(r"^-?\d+(\.\d*)?[eE][-+]?\d+$")
    if isinstance(node, dict):
        return {k: _coerce_floats(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_floats(v) for v in node]
    if isinstance(node, str) and _FLOAT_RE.match(node):
        return float(node)
    return node


def reference_model_config(name="default", overrides=None):
    """A reference config/model/<name>.yaml resolved to a plain dict with
    its cross-group interpolations filled in (training.audio_len <-
    datamodule..., T_max <- trainer.max_steps) and the metric-dependent
    validation losses emptied."""
    import yaml

    with open(REF_ROOT / "config" / "model" / f"{name}.yaml") as f:
        cfg = _coerce_floats(yaml.safe_load(f))

    def fill(node):
        if isinstance(node, dict):
            return {k: fill(v) for k, v in node.items()}
        if isinstance(node, list):
            return [fill(v) for v in node]
        if isinstance(node, str) and node.startswith("${"):
            path = node[2:-1]
            if path.startswith("model."):
                target = cfg
                for part in path.split(".")[1:]:
                    target = target[part]
                return fill(target)
            if path == "trainer.max_steps":
                return 600000
            if path.endswith(("audio_len", "speech_len")):
                # universepp_24k.yaml:67 points at a datamodule dataset
                # ("distorted-speech") whose config is not shipped with the
                # reference; any fixed clip length works for parity tests
                return 2.0
            raise KeyError(f"unhandled interpolation {node}")
        return node

    cfg = fill(cfg)
    cfg["validation"]["enh_losses"] = {}
    for k, v in (overrides or {}).items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg
