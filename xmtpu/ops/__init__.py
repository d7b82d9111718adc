from xmtpu.ops import manifold
from xmtpu.ops.qop import QOperator, DenseQ, q_apply

__all__ = ["manifold", "QOperator", "DenseQ", "q_apply"]
