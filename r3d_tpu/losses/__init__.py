from r3d_tpu.losses.classification import (
    cross_entropy_loss,
    weighted_cross_entropy_loss,
    focal_loss,
    accuracy_counts,
)
from r3d_tpu.losses.duration import normalize_duration, duration_loss
from r3d_tpu.losses.temporal import temporal_cluster_loss, temporal_contrastive_loss
from r3d_tpu.losses.supcon import supcon_loss
