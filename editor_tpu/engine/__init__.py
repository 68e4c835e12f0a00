from editor_tpu.engine.train import TrainState, build_train_step, make_train_state  # noqa: F401
from editor_tpu.engine.evaluate import build_eval_step, do_inference  # noqa: F401
