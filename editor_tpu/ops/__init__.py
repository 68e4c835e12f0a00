from editor_tpu.ops.masked_attention import masked_attention  # noqa: F401
from editor_tpu.ops.wavelets import (  # noqa: F401
    iswt2,
    swt2,
    wavedec1,
    wavedec2,
    waverec1,
    waverec2,
)
