from hairgs_tpu.losses.photometric import (
    l1_loss,
    l2_loss,
    bce_with_logits,
    bidirectional_angle_difference,
    mask_loss_from_channel,
    orientation_loss_from_channels,
    compute_losses,
)
from hairgs_tpu.losses.strand import angle_smoothness_loss, strand_joints_magnet_loss
