"""A minimal functional module system (pure JAX, no haiku dependency).

The reference builds its ansatz zoo on dm-haiku.  For the TPU build we use a
self-contained ~200-line equivalent with two extra capabilities the stock
libraries lack and our own KFAC implementation needs:

- *activation capture*: :meth:`Transformed.apply_instrumented` records the
  input of every :class:`~deepqmc_tpu.nn.modules.Linear` layer;
- *output perturbations*: zero-valued probes added to every dense layer output,
  so one backward pass yields the per-layer pre-activation sensitivities that
  form the second Kronecker factor of the Fisher.

Usage matches haiku: modules are constructed *inside* the transformed function,
parameters are addressed by ``module/path`` -> ``param_name``, and
``transform`` turns the closure into a pure ``(init, apply)`` pair.
"""

import re
import threading
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ()

_local = threading.local()


def _snake_case(name: str) -> str:
    return re.sub(r'(?<=[a-z0-9])(?=[A-Z])', '_', name).lower()


class _Scope:
    def __init__(self, path: str):
        self.path = path
        self.child_counts: dict[str, int] = {}

    def child_path(self, name: str) -> str:
        n = self.child_counts.get(name, 0)
        self.child_counts[name] = n + 1
        unique = name if n == 0 else f'{name}_{n}'
        return f'{self.path}/{unique}' if self.path else unique


class Frame:
    """One trace of a transformed function (init or apply)."""

    def __init__(self, mode: str, params: Optional[dict] = None, rng=None):
        assert mode in ('init', 'apply')
        self.mode = mode
        self.params = params if params is not None else {}
        self.rng = rng
        self.scopes = [_Scope('')]
        self.captures: Optional[dict] = None
        self.perturbations: Optional[dict] = None
        self.call_counts: dict[str, int] = {}

    def next_rng(self):
        assert self.rng is not None, 'rng only available inside init'
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def __enter__(self):
        stack = getattr(_local, 'frames', None)
        if stack is None:
            stack = _local.frames = []
        stack.append(self)
        return self

    def __exit__(self, *exc):
        _local.frames.pop()


def current_frame() -> Frame:
    stack = getattr(_local, 'frames', None)
    if not stack:
        raise RuntimeError(
            'nn primitives must be used inside nn.transform(init/apply)'
        )
    return stack[-1]


def current_path() -> str:
    return current_frame().scopes[-1].path


class _PushScope:
    """Pushes a module's persistent scope so children/params nest under it."""

    def __init__(self, frame: Frame, scope: _Scope):
        self.frame, self.scope = frame, scope

    def __enter__(self):
        self.frame.scopes.append(self.scope)

    def __exit__(self, *exc):
        self.frame.scopes.pop()


class ModuleMeta(type):
    """Assigns unique module paths at construction, pushes them during calls.

    Each instance owns one :class:`_Scope` shared between its ``__init__`` and
    all its calls, so children constructed in either place draw unique names
    from the same counter (deterministic paths given deterministic trace
    order, which ``transform`` guarantees).
    """

    def __init__(cls, name, bases, ns):
        super().__init__(name, bases, ns)
        if '__call__' in ns:
            orig_call = ns['__call__']

            def wrapped_call(self, *args, **kwargs):
                frame = current_frame()
                with _PushScope(frame, self._nn_scope):
                    return orig_call(self, *args, **kwargs)

            cls.__call__ = wrapped_call

    def __call__(cls, *args, **kwargs):
        inst = cls.__new__(cls)
        frame = current_frame()
        explicit = kwargs.get('name', None)
        parent = frame.scopes[-1]
        if explicit:
            # explicit names are used verbatim (haiku semantics): constructing
            # a module with the same name twice shares its parameters
            inst._nn_path = f'{parent.path}/{explicit}' if parent.path else explicit
        else:
            inst._nn_path = parent.child_path(_snake_case(cls.__name__))
        inst._nn_scope = _Scope(inst._nn_path)
        with _PushScope(frame, inst._nn_scope):
            inst.__init__(*args, **kwargs)
        return inst


class Module(metaclass=ModuleMeta):
    """Base class for neural network modules."""

    def __init__(self, name: Optional[str] = None):
        pass

    @property
    def module_path(self) -> str:
        return self._nn_path


def get_param(name: str, shape, init: Callable, dtype=None) -> jax.Array:
    """Fetch (apply) or create (init) a parameter in the current module scope."""
    frame = current_frame()
    path = current_path()
    dtype = dtype or jnp.result_type(float)
    if frame.mode == 'init':
        bundle = frame.params.setdefault(path, {})
        if name not in bundle:
            bundle[name] = init(tuple(shape), dtype)
        return bundle[name]
    try:
        return frame.params[path][name]
    except KeyError as e:
        raise KeyError(f'Missing parameter {path}/{name}') from e


def next_rng_key():
    return current_frame().next_rng()


def tag_dense(x_in: jax.Array, out: jax.Array) -> jax.Array:
    """Instrumentation hook called by dense layers after the matmul.

    Records the layer input (for the KFAC activation factor) and adds the
    zero-valued output perturbation (whose gradient is the pre-activation
    sensitivity).  Perturbations are per call: ``frame.perturbations[path]``
    is a list indexed by the call count, so weight-shared layers get distinct
    sensitivities per application.  A no-op in regular applies.
    """
    frame = current_frame()
    path = current_path()
    call_idx = frame.call_counts.get(path, 0)
    frame.call_counts[path] = call_idx + 1
    if frame.captures is not None:
        frame.captures.setdefault(path, []).append((x_in, out.shape))
    if frame.perturbations is not None and path in frame.perturbations:
        entries = frame.perturbations[path]
        if call_idx < len(entries):
            out = out + entries[call_idx]
    return out


def named_jit_block(name: str, fn: Callable, *args):
    """Run ``fn(*args)`` under a named jit boundary in plain applies.

    The boundary hands jaxpr interpreters (the forward-Laplacian engine,
    fwdlap.py) a whole block — e.g. attention + MLP + residuals — as ONE
    pjit eqn they can swap for a fused kernel instead of interpreting
    primitive by primitive.  Skipped during init (parameters must not be
    created under a trace) and during instrumented applies (KFAC capture
    lists must not hold inner-trace values); in those modes ``fn`` runs
    inline, so parameter paths and numerics are identical either way.
    """
    frame = current_frame()
    if (
        frame.mode != 'apply'
        or frame.captures is not None
        or frame.perturbations is not None
    ):
        return fn(*args)
    fn.__name__ = name
    return jax.jit(fn)(*args)


class Transformed(NamedTuple):
    init: Callable
    apply: Callable
    apply_instrumented: Callable


def transform(f: Callable) -> Transformed:
    """Turn a module-using closure into a pure (init, apply) pair."""

    def init(rng, *args, **kwargs) -> dict:
        with Frame('init', rng=rng) as frame:
            f(*args, **kwargs)
        return frame.params

    def apply(params, *args, **kwargs):
        with Frame('apply', params=params):
            return f(*args, **kwargs)

    def apply_instrumented(params, perturbations, *args, **kwargs):
        """Apply with dense-layer capture; returns (out, captures).

        ``captures`` maps dense-layer path -> list of (input, out_shape) per
        call of that layer during the trace.
        """
        with Frame('apply', params=params) as frame:
            frame.captures = {}
            frame.perturbations = perturbations
            out = f(*args, **kwargs)
            return out, frame.captures

    return Transformed(init, apply, apply_instrumented)


# --- initializers -----------------------------------------------------------

TRUNCATED_NORMAL_STDDEV_FACTOR = 0.87962566103423978


def variance_scaling(scale=1.0, mode='fan_in', distribution='truncated_normal'):
    """haiku-compatible VarianceScaling initializer."""

    def init(shape, dtype):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        fan_out = shape[-1]
        fan = {
            'fan_in': fan_in,
            'fan_out': fan_out,
            'fan_avg': (fan_in + fan_out) / 2,
        }[mode]
        var = scale / max(1.0, fan)
        rng = next_rng_key()
        if distribution == 'truncated_normal':
            stddev = jnp.sqrt(var) / TRUNCATED_NORMAL_STDDEV_FACTOR
            return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)
        if distribution == 'normal':
            return jnp.sqrt(var) * jax.random.normal(rng, shape, dtype)
        if distribution == 'uniform':
            lim = jnp.sqrt(3.0 * var)
            return jax.random.uniform(rng, shape, dtype, -lim, lim)
        raise ValueError(f'Unknown distribution: {distribution}')

    return init


def zeros_init():
    return lambda shape, dtype: jnp.zeros(shape, dtype)


def ones_init():
    return lambda shape, dtype: jnp.ones(shape, dtype)


def constant_init(value):
    return lambda shape, dtype: jnp.full(shape, value, dtype)


def array_init(value):
    """Initialize from a fixed array (e.g. physics-informed envelopes)."""
    return lambda shape, dtype: jnp.broadcast_to(
        jnp.asarray(value, dtype), shape
    ).copy()
