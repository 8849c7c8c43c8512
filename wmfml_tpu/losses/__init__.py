from wmfml_tpu.losses.losses import (
    LossFunc,
    azimuth_loss,
    contrastive_loss,
    contrastive_loss_anp,
    degree_loss,
    euclidean_distance_loss,
    mean_square_loss,
    nt_xent,
    quaternion_loss,
)

__all__ = [
    "LossFunc",
    "azimuth_loss",
    "contrastive_loss",
    "contrastive_loss_anp",
    "degree_loss",
    "euclidean_distance_loss",
    "mean_square_loss",
    "nt_xent",
    "quaternion_loss",
]
