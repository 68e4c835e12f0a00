from editor_tpu.models.editor import (  # noqa: F401
    EditorConfig,
    EditorTrainOutput,
    count_params,
    editor_apply,
    editor_config_from,
    editor_init,
)
from editor_tpu.models.vit import (  # noqa: F401
    ViTConfig,
    deit_small_config,
    vit_apply,
    vit_base_config,
    vit_init,
    vit_small_config,
)
