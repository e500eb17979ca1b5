from .memory import Codebook, codebook_distances, ema_update, init_codebook, quantize_topk

__all__ = [
    "Codebook",
    "codebook_distances",
    "ema_update",
    "init_codebook",
    "quantize_topk",
]
