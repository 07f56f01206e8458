from emsanet_tpu.models.emsanet import EMSANet, create_model, init_model  # noqa: F401
from emsanet_tpu.models.layers import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    NonBottleneck1D,
    SqueezeExcitation,
    get_block_class,
)
