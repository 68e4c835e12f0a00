from editor_tpu.utils.logger import setup_logger  # noqa: F401
from editor_tpu.utils.meter import AverageMeter  # noqa: F401
