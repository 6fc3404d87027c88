"""Minimal omegaconf stand-in for importing the reference code offline.

Only what the reference network modules touch is implemented
(reference universe.py:739,781, universe_gan.py:37, gan.py config access):
attribute access, ``.get``, ``.items``, ``in``, and ``OmegaConf.to_container``.
"""


class DictConfig(dict):
    """dict with attribute access that recursively wraps nested dicts."""

    def __init__(self, data=None):
        super().__init__()
        for k, v in (data or {}).items():
            self[k] = _wrap(v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = _wrap(value)

    def get(self, name, default=None):
        return super().get(name, default)


class ListConfig(list):
    pass


def _wrap(v):
    if isinstance(v, DictConfig):
        return v
    if isinstance(v, dict):
        return DictConfig(v)
    if isinstance(v, list):
        return ListConfig(_wrap(x) for x in v)
    return v


def _unwrap(v):
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


class OmegaConf:
    @staticmethod
    def create(data=None):
        return _wrap(data if data is not None else {})

    @staticmethod
    def to_container(cfg, resolve=True):
        return _unwrap(cfg)

    @staticmethod
    def is_config(obj):
        return isinstance(obj, (DictConfig, ListConfig))
