"""Host data pipeline + on-device augmentation graph."""

from nnue_vision_tpu.data.datasets import (  # noqa: F401
    AVAILABLE_DATASETS,
    GenericVisionDataset,
    get_dataset_info,
)
from nnue_vision_tpu.data.loaders import create_data_loaders  # noqa: F401
from nnue_vision_tpu.data.augment import augment_batch, normalize_images  # noqa: F401
