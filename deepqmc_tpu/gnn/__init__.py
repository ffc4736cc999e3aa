"""Graph neural networks over electrons and nuclei."""

from .electron_gnn import (  # noqa: F401
    ElectronEmbedding,
    ElectronGNN,
    ElectronGNNLayer,
    NucleiEmbedding,
    PermutationInvariantEmbedding,
)
