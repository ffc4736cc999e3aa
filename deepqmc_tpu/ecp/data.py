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
# provenance of each registry entry: 'user' (programmatic) > 'dir'
# (DEEPQMC_TPU_ECP_DIR / ecp_dir) > 'refit' (opt-in packaged refit) >
# 'packaged'; higher-precedence sources overwrite lower ones
_SOURCE: dict = {}
_SOURCE_RANK = {'packaged': 0, 'refit': 1, 'dir': 2, 'user': 3}
# directories already parsed, per ecp_type, to avoid re-reading on every call
_LOADED_DIRS: set = set()


def register_ecp_params(
    ecp_type: str, z: int, n_core: int, local, nonlocal_, _source: str = 'user'
):
    """Register ECP parameters for one element.

    ``local``: [coulomb_terms, const_terms, linear_terms], each a list of
    [alpha, beta]; ``nonlocal_``: per-l list of lists of [alpha, beta].
    Programmatic registration takes precedence over any file-loaded table.
    """
    key = (ecp_type.lower(), int(z))
    # a stale _SOURCE entry for a key that was popped from the registry
    # (tests do this) must not block re-registration
    if key in _REGISTRY and _SOURCE_RANK[_source] < _SOURCE_RANK.get(
        _SOURCE.get(key, ''), -1
    ):
        return
    _REGISTRY[key] = (n_core, local, nonlocal_)
    _SOURCE[key] = _source


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
            register_ecp_params(ecp_type, z, n_core, local, nonlocal_, _source='dir')


def _register_table_file(f: Path, ecp_type: str, source: str):
    text = f.read_text()
    sym, n_core, local, nonlocal_ = parse_gamess_ecp(text)
    z = Z_OF.get(sym.lower())
    if not z:
        return
    key = (ecp_type.lower(), z)
    already = key in _REGISTRY and (
        _SOURCE_RANK.get(_SOURCE.get(key, ''), -1) >= _SOURCE_RANK[source]
    )
    if not already and 'IN-HOUSE' in text:
        log.warning(
            f'The packaged {ecp_type} ECP table for {sym} is an IN-HOUSE '
            'LDA refit, NOT the published file (provenance: '
            'deepqmc_tpu/ecp/tables/README.md). Energies for systems '
            f'containing {sym} are not directly comparable to published '
            f'{ecp_type} literature values; supply the published file via '
            'DEEPQMC_TPU_ECP_DIR for production use.'
        )
    register_ecp_params(ecp_type, z, n_core, local, nonlocal_, _source=source)


def _load_packaged(ecp_type: str):
    """Register the tables shipped under ecp/tables/.

    Files are named ``<SYM>.<ecp_type>.gamess``; see tables/README.md for
    provenance and verification status of each. In-house refit alternatives
    under ``tables/refit/`` override the published defaults only when
    explicitly opted into via ``DEEPQMC_TPU_ECP_USE_REFIT`` (a comma list of
    element symbols, or ``all``).
    """
    tables = Path(__file__).parent / 'tables'
    for f in sorted(tables.glob(f'*.{ecp_type}.gamess')):
        _register_table_file(f, ecp_type, 'packaged')
    use_refit = os.environ.get('DEEPQMC_TPU_ECP_USE_REFIT', '')
    if use_refit:
        wanted = {s.strip().lower() for s in use_refit.split(',')}
        for f in sorted((tables / 'refit').glob(f'*.{ecp_type}.gamess')):
            sym = f.name.split('.')[0]
            if 'all' in wanted or sym.lower() in wanted:
                log.info(f'Opt-in in-house refit {ecp_type} table for {sym}')
                _register_table_file(f, ecp_type, 'refit')


def get_ecp_params(
    ecp_type: str, z: int, ecp_dir: Optional[str] = None
) -> tuple[int, list, list]:
    """Parameters (n_core, local, nonlocal) for one element, or raise.

    Precedence (highest first): programmatic :func:`register_ecp_params`,
    files in ``ecp_dir`` / ``DEEPQMC_TPU_ECP_DIR``, opt-in packaged refits,
    packaged tables — so a user-supplied published file always overrides a
    packaged (possibly in-house-refit) table.
    """
    key = (ecp_type.lower(), int(z))
    ecp_dir = ecp_dir or os.environ.get('DEEPQMC_TPU_ECP_DIR')
    if ecp_dir:
        dir_key = (str(Path(ecp_dir).resolve()), ecp_type.lower())
        if dir_key not in _LOADED_DIRS:
            _load_dir(Path(ecp_dir), ecp_type)
            _LOADED_DIRS.add(dir_key)
    if key not in _REGISTRY or _SOURCE.get(key) in ('packaged', 'refit'):
        _load_packaged(ecp_type)
    if key not in _REGISTRY:
        raise ValueError(
            f'No {ecp_type!r} ECP parameters available for element Z={z}. '
            'Register them with deepqmc_tpu.ecp.register_ecp_params or point '
            'DEEPQMC_TPU_ECP_DIR at a directory of GAMESS-format ECP files '
            '(e.g. from pseudopotentiallibrary.org).'
        )
    return _REGISTRY[key]
