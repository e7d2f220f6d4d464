from .gguf import GGUFFile
from .dequant import dequantize

__all__ = ["GGUFFile", "dequantize"]
