"""API-parity alias: open_universe_tpu.lora mirrors open_universe.lora
(reference lora/__init__.py: inject / remove / freeze helpers).  The torch
version monkey-patches modules; here LoRA is a parameter-tree transform
(nn/lora.py): ``inject`` adds low-rank leaves, ``remove`` folds them back,
and ``trainable_mask_lora`` plays the role of
``freeze_parameters_except_lora_and_bias``."""
from .nn.lora import (  # noqa: F401
    inject,
    lora_delta,
    remove,
    trainable_mask_lora,
)

freeze_parameters_except_lora_and_bias = trainable_mask_lora
