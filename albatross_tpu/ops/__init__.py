from .block import (
    BlockDiagonal,
    BlockDiagonalCholesky,
    BlockSymmetric,
    DiagonalCholesky,
    block_accumulate,
    block_diag_solve,
    block_inner_product,
    block_product,
    block_subtract,
    block_sum,
    build_block_symmetric,
)
from .compensated import (
    accurate_log,
    accurate_log_guarded,
    accurate_sum_of_logs,
    blocked_cholesky_dw,
    compensated_nll,
    compensated_nll_dw,
    dot2,
    dw_sum,
    two_prod,
    two_sum,
)
from .linalg import (
    CholeskyFactor,
    DirectInverse,
    ExplainedCovariance,
    truncated_psd_solve,
    vertical_stack,
)

__all__ = [k for k in dir() if not k.startswith("_")]
