from okvis2_tpu.models.fast_scnn import FastSCNN, segment_image

__all__ = ["FastSCNN", "segment_image"]
