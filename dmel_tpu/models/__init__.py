"""L2 — flax models: TF front-end layers + classifiers + PANNs."""

from dmel_tpu.models.layers import (  # noqa: F401
    MelSpectrogramLayer,
    MultiSigmaMelSpectrogramLayer,
    SpectrogramLayer,
)
from dmel_tpu.models.classifiers import (  # noqa: F401
    MelLinearNet,
    MelMlpNet,
    MelConvNet,
    MelPANNsNet,
    LinearNet,
    MlpNet,
    BatchNormLinearNet,
    ConvNet,
)
from dmel_tpu.models.panns import (  # noqa: F401
    Cnn6,
    Cnn14,
    ConvBlock,
    ConvBlock5x5,
    AttBlock,
)
from dmel_tpu.models.registry import (  # noqa: F401
    get_model_by_config,
    n_classes_for,
)
