from okvis2_tpu.ops.linalg import inv3x3, spd_solve, spd_inverse_sqrt

__all__ = ["inv3x3", "spd_solve", "spd_inverse_sqrt"]
