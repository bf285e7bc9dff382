"""kbslam — TPU-native keyframe-based RGB-D visual SLAM.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
angelo-nutu/Keyframe-Based-SLAM (C++/OpenCV/Ceres): ORB frontend,
brute-force Hamming matching, PnP-RANSAC tracking, keyframe policy,
fixed-capacity map state, and sliding-window bundle adjustment — all as
pure jit-compiled functions with static shapes, plus a thin host shell
for ingress (ZMQ/TUM datasets) and Rerun visualization.
"""
from kbslam.config import SLAMConfig, DEFAULT_CONFIG, tiny_config  # noqa: F401
from kbslam.geom.se3 import SE3  # noqa: F401
from kbslam.geom.camera import Intrinsics  # noqa: F401

__version__ = "0.1.0"
