"""Config engine: Hydra-compatible YAML composition + object instantiation.

Hydra/OmegaConf are deliberately not dependencies; this module implements the
subset the reference's config surface uses (SURVEY.md §2.9):

- ``_target_`` / ``_partial_`` object configs with recursive instantiation;
- ``defaults`` lists with config groups (``task``, ``ansatz``, ``hamil``,
  ``task/opt``, ``task/sampler_factory``, ``hamil/mol``);
- ``${path.to.key}`` interpolation and the ``${eval:"..."}`` resolver used
  for lambda-valued hyperparameters (reference conf/ansatz/default.yaml:15);
- CLI override grammar: ``key.sub=value``, ``group=option``,
  ``group/sub=option``, ``+new.key=value``, ``~key`` (delete);
- ``???`` mandatory-value markers.

Reference configs (``deepqmc.*`` targets) run unchanged: target paths are
remapped onto this package via :data:`TARGET_ALIASES`.
"""

import importlib
import re
from functools import partial
from pathlib import Path
from typing import Any, Optional, Union

import yaml

__all__ = ['compose', 'instantiate', 'load_yaml']


class MissingValueError(ValueError):
    pass


MISSING = '???'

# remap reference target paths (and third-party ones the reference names)
# onto this package, so `deepqmc ...` experiment configs work verbatim
TARGET_ALIASES = {
    'deepqmc.hkext.MLP': 'deepqmc_tpu.nn.MLP',
    'deepqmc.hkext.GLU': 'deepqmc_tpu.nn.GLU',
    'deepqmc.hkext.SumPool': 'deepqmc_tpu.nn.SumPool',
    'deepqmc.hkext.Identity': 'deepqmc_tpu.nn.Identity',
    'deepqmc.hkext.ResidualConnection': 'deepqmc_tpu.nn.ResidualConnection',
    'deepqmc.hkext.ssp': 'deepqmc_tpu.nn.ssp',
    'deepqmc.physics.laplacian': 'deepqmc_tpu.physics.loop_laplacian',
    'haiku.Linear': 'deepqmc_tpu.nn.Linear',
    'kfac_jax.Optimizer': 'deepqmc_tpu.kfac.KFAC',
}


def resolve_target(path: str):
    """Import the object named by a dotted path (with legacy remapping)."""
    path = TARGET_ALIASES.get(path, path)
    if path.startswith('deepqmc.'):
        path = 'deepqmc_tpu.' + path[len('deepqmc.') :]
    module_path, _, name = path.rpartition('.')
    try:
        module = importlib.import_module(module_path)
    except ImportError:
        # maybe the last two components are Class.method
        mod2, _, cls = module_path.rpartition('.')
        module = importlib.import_module(mod2)
        return getattr(getattr(module, cls), name)
    return getattr(module, name)


def load_yaml(path: Union[str, Path]) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


# --- composition ------------------------------------------------------------


def _deep_merge(base, override):
    """Merge override into base (dicts recursively, others replaced)."""
    if isinstance(base, dict) and isinstance(override, dict):
        out = dict(base)
        for k, v in override.items():
            out[k] = _deep_merge(out[k], v) if k in out else v
        return out
    return override


def _load_group_config(conf_dirs, group: str, name: str):
    for conf_dir in conf_dirs:
        path = Path(conf_dir) / group / f'{name}.yaml'
        if path.exists():
            return load_yaml(path)
    raise FileNotFoundError(
        f'No config {group}/{name}.yaml in any of {list(map(str, conf_dirs))}'
    )


def _process_defaults(
    cfg: dict, group_prefix: str, conf_dirs, selections: Optional[dict] = None
) -> dict:
    """Expand a node's ``defaults`` list (hydra semantics, restricted).

    ``selections`` maps group paths (e.g. ``'hamil/mol'``) to override names;
    matching defaults entries use the overridden selection (and are removed
    from the dict, so leftovers can be reported).
    """
    selections = selections if selections is not None else {}
    if not isinstance(cfg, dict) or 'defaults' not in cfg:
        return cfg
    cfg = dict(cfg)
    defaults = cfg.pop('defaults')
    merged: dict = {}
    self_seen = False
    for entry in defaults:
        if entry == '_self_':
            merged = _deep_merge(merged, cfg)
            self_seen = True
            continue
        if isinstance(entry, str):
            continue  # e.g. 'optional ...' markers: ignored
        (key, name), = entry.items()
        if key.startswith('override hydra') or key.startswith('optional'):
            continue
        sub_group = f'{group_prefix}/{key}' if group_prefix else key
        name = selections.pop(sub_group, name)
        if name is None:
            continue
        sub_cfg = _load_group_config(conf_dirs, sub_group, name)
        sub_cfg = _process_defaults(sub_cfg, sub_group, conf_dirs, selections)
        merged = _deep_merge(merged, {key.split('@')[0]: sub_cfg})
    if not self_seen:
        merged = _deep_merge(merged, cfg)
    return merged


def _set_path(cfg: dict, dotted: str, value, *, allow_new: bool):
    keys = dotted.split('.')
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            if not allow_new:
                raise KeyError(f'Unknown config path: {dotted}')
            node[k] = {}
        node = node[k]
    if not allow_new and keys[-1] not in node:
        raise KeyError(
            f'Unknown config key: {dotted} (prefix with + to add new keys)'
        )
    node[keys[-1]] = value


def _delete_path(cfg: dict, dotted: str):
    keys = dotted.split('.')
    node = cfg
    for k in keys[:-1]:
        node = node[k]
    node.pop(keys[-1], None)


def _is_group_override(key: str, raw_value: str, conf_dirs) -> bool:
    """A group selection like ``hamil/mol=H2`` or ``ansatz=psiformer``."""
    if '.' in key or '=' in raw_value:
        return False
    return any(
        (Path(d) / key / f'{raw_value}.yaml').exists() for d in conf_dirs
    )


def apply_override(cfg: dict, override: str, conf_dirs):
    """Apply one non-group CLI override string to the composed config."""
    if override.startswith('~'):
        _delete_path(cfg, override[1:].replace('/', '.'))
        return
    allow_new = override.startswith('+')
    if allow_new:
        override = override[1:]
    key, _, raw_value = override.partition('=')
    value = yaml.safe_load(raw_value) if raw_value != '' else ''
    _set_path(cfg, key.replace('/', '.'), value, allow_new=allow_new)


def default_conf_dir() -> Path:
    from importlib import resources

    return Path(str(resources.files('deepqmc_tpu').joinpath('conf')))


def compose(
    config_name: str = 'config',
    overrides: Optional[list[str]] = None,
    conf_dir: Union[str, Path, None] = None,
    user_conf_dir: Union[str, Path, None] = 'conf',
) -> dict:
    """Load + compose the config tree and apply CLI overrides."""
    conf_dirs = []
    if user_conf_dir and Path(user_conf_dir).is_dir():
        conf_dirs.append(Path(user_conf_dir))
    conf_dirs.append(Path(conf_dir) if conf_dir else default_conf_dir())
    root = None
    for d in conf_dirs:
        path = Path(d) / f'{config_name}.yaml'
        if path.exists():
            root = load_yaml(path)
            break
    if root is None:
        raise FileNotFoundError(f'{config_name}.yaml not found in {conf_dirs}')
    # split group selections (recompose the defaults tree) from value edits
    selections = {}
    value_overrides = []
    for override in overrides or []:
        key, _, raw_value = override.lstrip('+~').partition('=')
        if not override.startswith(('~',)) and _is_group_override(
            key, raw_value, conf_dirs
        ):
            selections[key] = raw_value
        else:
            value_overrides.append(override)
    cfg = _process_defaults(root, '', conf_dirs, selections)
    for group, name in selections.items():
        # selections for groups absent from any defaults list: set directly
        sub_cfg = _process_defaults(
            _load_group_config(conf_dirs, group, name), group, conf_dirs
        )
        _set_path(cfg, group.replace('/', '.'), sub_cfg, allow_new=True)
    for override in value_overrides:
        apply_override(cfg, override, conf_dirs)
    return cfg


# --- instantiation ----------------------------------------------------------

_INTERP_RE = re.compile(r'^\$\{([^}]*)\}$')


def _resolve_interpolation(expr: str, root):
    if expr.startswith('eval:'):
        code = yaml.safe_load(expr[len('eval:') :])
        return eval(code)  # noqa: S307 (the reference exposes the same resolver)
    if expr.rstrip(':') == 'process_idx_suffix':
        # reference custom resolver (conf/custom_resolvers.py:9-14)
        from .train import process_idx_suffix

        return process_idx_suffix()
    if expr.rstrip(':') == 'mode_subdir':
        # reference custom resolver (conf/custom_resolvers.py:17-20)
        try:
            evaluate = bool(root['task']['evaluate'])
        except (KeyError, TypeError):
            evaluate = False
        return 'evaluation' if evaluate else 'training'
    node = root
    for k in expr.split('.'):
        node = node[k]
    return instantiate(node, root=root)


def instantiate(node, root=None, **kwargs):
    """Recursively turn ``_target_`` config nodes into live objects."""
    if root is None:
        root = node
    if isinstance(node, str):
        m = _INTERP_RE.match(node)
        if m:
            return _resolve_interpolation(m.group(1), root)
        if node == MISSING:
            raise MissingValueError('Mandatory value ??? was not provided')
        return node
    if isinstance(node, list):
        return [instantiate(v, root=root) for v in node]
    if not isinstance(node, dict):
        return node
    if '_target_' in node:
        target = resolve_target(node['_target_'])
        is_partial = node.get('_partial_', False)
        node_kwargs = {
            k: instantiate(v, root=root)
            for k, v in node.items()
            if k not in ('_target_', '_partial_', '_convert_')
        }
        node_kwargs.update(kwargs)
        if is_partial:
            return partial(target, **node_kwargs)
        return target(**node_kwargs)
    return {k: instantiate(v, root=root) for k, v in node.items()}
