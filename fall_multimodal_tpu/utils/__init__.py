from fall_multimodal_tpu.utils.logging import create_logger
from fall_multimodal_tpu.utils.prng import key_chain

__all__ = ["create_logger", "key_chain"]
