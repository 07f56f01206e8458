from emsanet_tpu.datasets.base import (  # noqa: F401
    DatasetConfig,
    DepthStats,
    SampleIdentifier,
    SemanticLabel,
    SemanticLabelList,
    build_dataset_config,
)
from emsanet_tpu.datasets.registry import (  # noqa: F401
    KNOWN_DATASETS,
    get_dataset,
    get_dataset_config,
    parse_datasets,
)
