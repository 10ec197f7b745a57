from .cholesky import cholesky_blocked, pallas_cholesky

__all__ = ["cholesky_blocked", "pallas_cholesky"]
