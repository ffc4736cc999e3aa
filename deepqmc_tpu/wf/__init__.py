"""Wave-function ansatz zoo."""

from .base import init_wf_params, instantiate_ansatz  # noqa: F401
from .nn_wave_function import NeuralNetworkWaveFunction  # noqa: F401
