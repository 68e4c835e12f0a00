from editor_tpu.data.datasets import (  # noqa: F401
    DATASET_FACTORY,
    DatasetSplits,
    load_dataset,
    print_dataset_statistics,
)
from editor_tpu.data.loader import BatchLoader, ReIDDataModule, decode_item  # noqa: F401
from editor_tpu.data.sampler import PKSampler, SoftmaxSampler  # noqa: F401
from editor_tpu.data.transforms import (  # noqa: F401
    make_eval_transform,
    make_train_augment,
)
