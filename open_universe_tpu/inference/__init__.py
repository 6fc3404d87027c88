from .model_loader import DEFAULT_MODEL, ckpt_to_config_path, load_model  # noqa: F401
from .signature_to_parser import add_enhance_arguments  # noqa: F401
from .chunked import enhance_chunked, make_chunked_enhancer  # noqa: F401
