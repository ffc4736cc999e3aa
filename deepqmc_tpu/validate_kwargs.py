"""Semantic validation of task configs (reference: validate_kwargs.py:9-57).

Organized as a rule table: each rule inspects the composed task config and
returns ``None`` (fine), a warning string, or raises for hard errors.
"""

import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


def _dig(cfg: dict, *path, default=None):
    """Nested ``get`` tolerating None at any level."""
    node = cfg
    for key in path:
        node = (node or {}).get(key)
        if node is None:
            return default
    return node


def _rule_fix_spin(cfg: dict) -> Optional[str]:
    spin_penalized = _dig(cfg, 'loss_function_factory', 'spin_penalty')
    cas = _dig(cfg, 'pretrain_kwargs', 'scf_kwargs', 'cas')
    fix_spin = _dig(cfg, 'pretrain_kwargs', 'scf_kwargs', 'fix_spin')
    if spin_penalized and cfg.get('pretrain_steps') and cas and not fix_spin:
        return (
            'Variational training involves spin penalty. Consider adding the'
            ' fix_spin argument for the SCF baseline used for pretraining.'
        )
    return None


def _rule_excited_needs_cas(cfg: dict) -> Optional[str]:
    multi_state = cfg.get('electronic_states', 1) not in (1, None)
    if multi_state and not _dig(cfg, 'pretrain_kwargs', 'scf_kwargs', 'cas'):
        return (
            'No CAS specified, all electronic states will be pretrained to the'
            ' HF ground state.'
        )
    return None


def _rule_walker_divisibility(cfg: dict) -> Optional[str]:
    n_dev = jax.device_count()
    walkers = cfg.get('electron_batch_size', 0)
    assert not walkers % n_dev, (
        f'Electron batch size ({walkers}) cannot be'
        f' evenly split across {n_dev} devices!'
    )
    return None


def _rule_molecule_batch(cfg: dict) -> Optional[str]:
    mols = cfg.get('mols')
    if isinstance(mols, dict):
        from .config import instantiate

        mols = instantiate(mols)
    n_mols = len(mols) if mols is not None else 1
    mol_batch = cfg.get('molecule_batch_size', 0)
    assert mol_batch <= n_mols, (
        f'Molecule batch size ({mol_batch}) is larger than'
        f' the number of molecules in the dataset ({n_mols})!'
    )
    return None


RULES = (
    _rule_fix_spin,
    _rule_excited_needs_cas,
    _rule_walker_divisibility,
    _rule_molecule_batch,
)


def validate_kwargs(cfg: dict):
    """Check that the configured options are mutually sensible."""
    for rule in RULES:
        message = rule(cfg)
        if message:
            log.warning(message)
