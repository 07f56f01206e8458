from emsanet_tpu.models.emsanet import (  # noqa: F401
    EMSANet,
    build_fused_params,
    create_model,
    init_model,
)
from emsanet_tpu.models.layers import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    NonBottleneck1D,
    SqueezeExcitation,
    get_block_class,
)
