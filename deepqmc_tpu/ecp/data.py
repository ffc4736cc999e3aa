"""Effective-core-potential parameter registry and parsers.

The reference obtains Gaussian ECP parameters ('bfd', 'ccECP') from pyscf's
built-in database at runtime (ecp/gaussian_type_ecp.py:17-84).  pyscf is not
a dependency of the TPU build and ECP parameter tables are licensed data we
do not vendor, so parameters are supplied through either:

- :func:`register_ecp_params` — programmatic registration;
- a directory of parameter files in the standard GAMESS-US ``ECP`` text
  format (as published by pseudopotentiallibrary.org), pointed to by the
  ``DEEPQMC_TPU_ECP_DIR`` environment variable or the ``ecp_dir`` argument.

Parameter layout matches pyscf's ``_ecp`` convention: per element,
``(n_core, local, nonlocal)`` with ``local`` = three lists of ``[alpha,
beta]`` pairs for the r^-1, r^0 and r^1 Gaussian classes, and ``nonlocal`` =
per-l lists of ``[alpha, beta]`` pairs.
"""

import logging
import os
import re
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

__all__ = ['get_ecp_params', 'register_ecp_params', 'parse_gamess_ecp']

ELEMENTS = (
    'H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe Co Ni '
    'Cu Zn Ga Ge As Se Br Kr'
).split()
Z_OF = {sym.lower(): i + 1 for i, sym in enumerate(ELEMENTS)}

# registry: (ecp_type.lower(), z) -> (n_core, local, nonlocal)
_REGISTRY: dict = {}


def register_ecp_params(ecp_type: str, z: int, n_core: int, local, nonlocal_):
    """Register ECP parameters for one element.

    ``local``: [coulomb_terms, const_terms, linear_terms], each a list of
    [alpha, beta]; ``nonlocal_``: per-l list of lists of [alpha, beta].
    """
    _REGISTRY[(ecp_type.lower(), int(z))] = (n_core, local, nonlocal_)


def parse_gamess_ecp(text: str):
    """Parse one element's ECP from GAMESS-US format text.

    Format (pseudopotentiallibrary.org):

        <SYM>-ECP GEN <n_core> <l_max>
        <n_terms> ----- ul potential (local, l = l_max channel) -----
        <coeff> <r-power> <exponent>
        ...
        <n_terms> ----- s-ul potential -----
        ...

    Returns (symbol, n_core, local, nonlocal) in pyscf-like layout.
    """
    lines = [
        ln.strip() for ln in text.splitlines() if ln.strip() and not ln.startswith('#')
    ]
    header = lines[0].split()
    sym = header[0].split('-')[0]
    n_core, l_max = int(header[2]), int(header[3])
    idx = 1
    channels = []
    while idx < len(lines):
        n_terms = int(lines[idx].split()[0])
        idx += 1
        terms = []
        for _ in range(n_terms):
            coeff, power, exponent = lines[idx].split()[:3]
            terms.append((float(coeff), int(power), float(exponent)))
            idx += 1
        channels.append(terms)
    # channel 0 is the local (l = l_max) part; the rest are l = 0..l_max-1
    local = [[], [], []]  # r^-1, r^0, r^1 classes
    for coeff, power, exponent in channels[0]:
        cls = power - 1  # GAMESS power n means r^(n-2)
        assert 0 <= cls <= 2, f'unsupported local r-power {power}'
        local[cls].append([exponent, coeff])
    nonlocal_ = []
    for terms in channels[1:]:
        chan = []
        for coeff, power, exponent in terms:
            assert power == 2, f'unsupported nonlocal r-power {power}'
            chan.append([exponent, coeff])
        nonlocal_.append(chan)
    return sym, n_core, local, nonlocal_


def _load_dir(ecp_dir: Path, ecp_type: str):
    pattern = re.compile(r'\.(gamess|ecp|txt)$', re.IGNORECASE)
    for f in sorted(Path(ecp_dir).glob('*')):
        if not pattern.search(f.name):
            continue
        try:
            sym, n_core, local, nonlocal_ = parse_gamess_ecp(f.read_text())
        except Exception as exc:
            log.warning(f'Could not parse ECP file {f}: {exc}')
            continue
        z = Z_OF.get(sym.lower())
        if z:
            register_ecp_params(ecp_type, z, n_core, local, nonlocal_)


def _load_packaged(ecp_type: str):
    """Register the verified tables shipped under ecp/tables/.

    Files are named ``<SYM>.<ecp_type>.gamess``; see tables/README.md for
    provenance and verification status of each.
    """
    tables = Path(__file__).parent / 'tables'
    for f in sorted(tables.glob(f'*.{ecp_type}.gamess')):
        sym, n_core, local, nonlocal_ = parse_gamess_ecp(f.read_text())
        z = Z_OF.get(sym.lower())
        if z and (ecp_type.lower(), z) not in _REGISTRY:
            register_ecp_params(ecp_type, z, n_core, local, nonlocal_)
    # provisional tables: correct core structure and functional-form
    # identities, but Gaussian parameters unverified against any oracle in
    # this offline build — loaded last, with a loud warning
    for f in sorted((tables / 'provisional').glob(f'*.{ecp_type}.gamess')):
        sym, n_core, local, nonlocal_ = parse_gamess_ecp(f.read_text())
        z = Z_OF.get(sym.lower())
        if z and (ecp_type.lower(), z) not in _REGISTRY:
            log.warning(
                f'Using PROVISIONAL {ecp_type} ECP parameters for {sym}: the '
                'core structure is correct but the Gaussian terms are '
                'unverified (see deepqmc_tpu/ecp/tables/README.md). For '
                'production, supply the published file via DEEPQMC_TPU_ECP_DIR.'
            )
            register_ecp_params(ecp_type, z, n_core, local, nonlocal_)


def get_ecp_params(
    ecp_type: str, z: int, ecp_dir: Optional[str] = None
) -> tuple[int, list, list]:
    """Parameters (n_core, local, nonlocal) for one element, or raise."""
    key = (ecp_type.lower(), int(z))
    if key not in _REGISTRY:
        _load_packaged(ecp_type)
    if key not in _REGISTRY:
        ecp_dir = ecp_dir or os.environ.get('DEEPQMC_TPU_ECP_DIR')
        if ecp_dir:
            _load_dir(Path(ecp_dir), ecp_type)
    if key not in _REGISTRY:
        raise ValueError(
            f'No {ecp_type!r} ECP parameters available for element Z={z}. '
            'Register them with deepqmc_tpu.ecp.register_ecp_params or point '
            'DEEPQMC_TPU_ECP_DIR at a directory of GAMESS-format ECP files '
            '(e.g. from pseudopotentiallibrary.org).'
        )
    return _REGISTRY[key]
