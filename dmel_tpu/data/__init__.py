"""L1 — datasets: synthetic Gauss-pulse, AudioMNIST, ESC-50, splits."""

from dmel_tpu.data.synthetic import (  # noqa: F401
    GaussPulseDataset,
    make_gauss_pulse_dataset,
    fmconst_np,
    gauss_pulse_np,
)
from dmel_tpu.data.audio import (  # noqa: F401
    ArrayDataset,
    load_wav,
    resample,
    audio_mnist_big,
    audio_mnist_legacy,
    esc50,
    parse_esc50_csv,
)
from dmel_tpu.data.splits import (  # noqa: F401
    Subset,
    random_split,
    random_split_lengths,
    AUDIO_MNIST_TRAIN_SPEAKERS,
    AUDIO_MNIST_VALID_SPEAKERS,
    AUDIO_MNIST_TEST_SPEAKERS,
)
from dmel_tpu.data.fsd import fsd50k  # noqa: F401
from dmel_tpu.data.loader import BatchLoader  # noqa: F401
from dmel_tpu.data.registry import get_dataset_by_config  # noqa: F401
