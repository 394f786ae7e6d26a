from okvis2_tpu.frontend.detection import detect_keypoints, DetectionConfig
from okvis2_tpu.frontend.descriptor import describe_keypoints, DESCRIPTOR_BITS
from okvis2_tpu.frontend.matching import hamming_distance_matrix, match_descriptors

__all__ = [
    "detect_keypoints",
    "DetectionConfig",
    "describe_keypoints",
    "DESCRIPTOR_BITS",
    "hamming_distance_matrix",
    "match_descriptors",
]
