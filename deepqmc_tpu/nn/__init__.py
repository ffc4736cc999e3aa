"""Pure-JAX neural-network micro-framework for the TPU build."""

from .core import (  # noqa: F401
    Frame,
    Module,
    Transformed,
    array_init,
    constant_init,
    current_frame,
    current_path,
    get_param,
    named_jit_block,
    next_rng_key,
    ones_init,
    tag_dense,
    transform,
    variance_scaling,
    zeros_init,
)
from .modules import (  # noqa: F401
    GLU,
    MLP,
    Embed,
    Identity,
    LayerNorm,
    Linear,
    MultiHeadAttention,
    ResidualConnection,
    SumPool,
    ssp,
)
