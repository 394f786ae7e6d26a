from okvis2_tpu.pipeline.frontend_pipeline import Frontend, FrontendConfig
from okvis2_tpu.pipeline.slam import SlamSystem

__all__ = ["Frontend", "FrontendConfig", "SlamSystem"]
