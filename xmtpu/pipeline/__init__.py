from xmtpu.pipeline.graph import checklandmarks, delete_threshold
from xmtpu.pipeline.recover import recover_XM

__all__ = ["checklandmarks", "delete_threshold", "recover_XM"]
