"""MCMC sampling of electron (and nuclear) configurations."""

from .combined_samplers import (  # noqa: F401
    MoleculeIdxSampler,
    MultiElectronicStateSampler,
    MultiNuclearGeometrySampler,
)
from .electron_samplers import (  # noqa: F401
    DecorrSampler,
    LangevinSampler,
    MetropolisSampler,
    ResampledSampler,
)
from .combined_samplers import IdleNucleiSampler, no_elec_warp  # noqa: F401
from .sampling_utils import (  # noqa: F401
    chain,
    clean_force,
    combine_samplers,
    equilibrate,
    initialize_sampler_state,
    initialize_sampling,
)

__all__ = [
    'MetropolisSampler',
    'LangevinSampler',
    'DecorrSampler',
    'ResampledSampler',
    'chain',
    'combine_samplers',
    'equilibrate',
    'initialize_sampling',
    'initialize_sampler_state',
    'MoleculeIdxSampler',
    'MultiNuclearGeometrySampler',
]
