"""Minimal huggingface_hub stand-in: lets the reference
``inference_utils.model_loader`` / ``networks/universe/lora.py`` import
offline (zero-egress image).  Any actual download attempt fails loudly."""


def hf_hub_download(*args, **kwargs):  # pragma: no cover
    raise RuntimeError("no network access in this environment "
                       f"(hf_hub_download{args!r} {kwargs!r})")
