from .block import (
    BlockDiagonal,
    BlockDiagonalCholesky,
    BlockSymmetric,
    DiagonalCholesky,
    build_block_symmetric,
)
from .linalg import (
    CholeskyFactor,
    DirectInverse,
    ExplainedCovariance,
    truncated_psd_solve,
    vertical_stack,
)

__all__ = [k for k in dir() if not k.startswith("_")]
