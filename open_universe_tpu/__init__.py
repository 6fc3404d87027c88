"""open-universe-tpu: TPU-native universal score-based speech enhancement.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
line/open-universe (UNIVERSE and UNIVERSE++): conditional diffusion speech
enhancement with conv/GRU score + conditioner networks, GAN and MDN training
losses, LoRA fine-tuning, speech-quality metrics, and data-parallel training
over TPU meshes.
"""
__version__ = "0.1.0"

# reference package surface (open_universe/__init__.py:17-18), imported
# lazily so that `import open_universe_tpu` stays cheap and cannot trigger
# jax backend initialization as a side effect
_SUBMODULES = ("bin", "data", "datasets", "inference", "inference_utils",
               "layers", "lora", "losses", "metrics", "models", "networks",
               "nn", "ops", "parallel", "prepare", "train", "utils")


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
