"""editor_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-modal object ReID framework.

Capability parity target: 924973292/EDITOR (CVPR 2024 "Magic Tokens"), re-designed
TPU-first. See SURVEY.md for the blueprint and per-module reference citations.
"""

__version__ = "0.1.0"

from editor_tpu.config import Config, load_config  # noqa: F401
