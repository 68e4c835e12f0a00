from editor_tpu.solver.schedule import cosine_lr_schedule, make_scheduler  # noqa: F401
from editor_tpu.solver.optimizer import make_optimizer, param_group_labels  # noqa: F401
