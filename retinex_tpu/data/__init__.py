"""Host-side input pipeline + device-side batched augmentation."""

from retinex_tpu.data.augment import augment_batch  # noqa: F401
from retinex_tpu.data.dataset import (  # noqa: F401
    LowLightDataset,
    LowLightTestDataset,
    get_test_loader,
    get_train_loader,
    list_image_files,
)
