"""Minimal ``hydra.utils.instantiate`` for driving the reference code from
plain/omegaconf-shim config dicts (reference score.py:275, universe.py:90-115,
universe_gan.py:127-133)."""
import importlib
import os


def to_absolute_path(path):
    return os.path.abspath(path)


def _locate(path: str):
    parts = path.split(".")
    # import the longest importable module prefix, then getattr the rest
    for split in range(len(parts), 0, -1):
        mod_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(mod_name)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot locate {path!r}")


def instantiate(cfg=None, *args, config=None, _recursive_=True,
                _convert_=None, **overrides):
    if cfg is None:
        cfg = config
    if cfg is None:
        return None
    if not isinstance(cfg, dict):
        return cfg  # already an object
    kwargs = {k: v for k, v in cfg.items() if not k.startswith("_")}
    kwargs.update(overrides)
    if _recursive_:
        kwargs = {
            k: instantiate(v, _recursive_=True)
            if isinstance(v, dict) and "_target_" in v
            else v
            for k, v in kwargs.items()
        }
    target = cfg["_target_"]
    return _locate(target)(*args, **kwargs)
