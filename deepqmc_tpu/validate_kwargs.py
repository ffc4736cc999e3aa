"""Semantic validation of task configs (reference: validate_kwargs.py:9-57)."""

import logging

import jax

log = logging.getLogger(__name__)


def validate_pretrain_kwargs(cfg: dict):
    if (
        (cfg.get('loss_function_factory') or {}).get('spin_penalty', False)
        and cfg.get('pretrain_steps', False)
        and (cfg.get('pretrain_kwargs') or {}).get('scf_kwargs', {}).get('cas', False)
        and not cfg['pretrain_kwargs']['scf_kwargs'].get('fix_spin', False)
    ):
        log.warning(
            'Variational training involves spin penalty. Consider adding the'
            ' fix_spin argument for the SCF baseline used for pretraining.'
        )
    if cfg.get('electronic_states', 1) not in (1, None) and not (
        (cfg.get('pretrain_kwargs') or {}).get('scf_kwargs', {}).get('cas', None)
    ):
        log.warning(
            'No CAS specified, all electronic states will be pretrained to the'
            ' HF ground state.'
        )


def validate_batch_size(cfg: dict):
    n_dev = jax.device_count()
    assert not cfg.get('electron_batch_size', 0) % n_dev, (
        f'Electron batch size ({cfg.get("electron_batch_size")}) cannot be'
        f' evenly split across {n_dev} devices!'
    )
    mols = cfg.get('mols')
    if isinstance(mols, dict):
        from .config import instantiate

        mols = instantiate(mols)
    len_mols = len(mols) if mols is not None else 1
    assert cfg.get('molecule_batch_size', 0) <= len_mols, (
        f'Molecule batch size ({cfg.get("molecule_batch_size")}) is larger than'
        f' the number of molecules in the dataset ({len_mols})!'
    )


def validate_kwargs(cfg: dict):
    """Check that the configured options are mutually sensible."""
    validate_pretrain_kwargs(cfg)
    validate_batch_size(cfg)
