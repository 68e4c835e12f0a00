from editor_tpu.losses.make_loss import make_loss  # noqa: F401
from editor_tpu.losses.softmax import cross_entropy_label_smooth, label_smoothing_ce  # noqa: F401
from editor_tpu.losses.triplet import (  # noqa: F401
    batch_hard_triplet,
    euclidean_dist,
    hard_example_mining,
    weighted_regularized_triplet,
)
from editor_tpu.losses.center import center_loss, center_loss_init  # noqa: F401
