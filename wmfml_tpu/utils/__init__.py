from wmfml_tpu.utils.quaternion import (
    euler_zyx_to_quat,
    quat_canonicalize,
    quat_mul,
    quat_rot_x,
    quat_rot_z,
    quat_to_euler_zyx,
    task_augment_quat,
)
from wmfml_tpu.utils.misc import convert_index_to_angle, mean_confidence_interval

__all__ = [
    "euler_zyx_to_quat",
    "quat_canonicalize",
    "quat_mul",
    "quat_rot_x",
    "quat_rot_z",
    "quat_to_euler_zyx",
    "task_augment_quat",
    "convert_index_to_angle",
    "mean_confidence_interval",
]
