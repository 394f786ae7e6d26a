from okvis2_tpu.core import so3, se3
from okvis2_tpu.core.se3 import Transformation
