"""Validate packaged ECP tables against all-electron valence physics.

For each packaged table (deepqmc_tpu/ecp/tables/), solve the spherically
averaged exchange-only LDA atom all-electron and with the ECP
(deepqmc_tpu.ecp.radial_atom) and compare:

- valence orbital eigenvalues (same mean-field method both sides),
- ionization-like total-energy differences between occupation patterns
  (core energy cancels exactly on the AE side).

The agreement band is calibrated on tables independently verified against
the reference implementation's goldens (C/N/O ccECP, C bfd — see
tests/test_ecp.py and ecp/tables/README.md) and then applied to tables with
no other oracle (Sc).  Writes docs/evidence/ecp_valence_check.json.

Usage: python scripts/verify_ecp_valence.py [--elements C,N,O,Li,Sc]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepqmc_tpu.ecp.data import get_ecp_params
from deepqmc_tpu.ecp.radial_atom import solve_atom

SHELL_NAMES = {0: 's', 1: 'p', 2: 'd'}

# Spherically averaged occupation patterns.  Each element: the AE
# configuration, the list of (name, occupation-change) Delta-E probes, and
# per-element core sizes come from the tables themselves.
ATOMS = {
    'Li': {
        'z': 3,
        'ae': {0: [2, 1]},
        'probes': [('IP(2s)', {0: -1})],  # Li -> Li+
    },
    'C': {
        'z': 6,
        'ae': {0: [2, 2], 1: [2]},
        'probes': [('IP(2p)', {1: -1}), ('2IP(2p)', {1: -2})],
    },
    'N': {
        'z': 7,
        'ae': {0: [2, 2], 1: [3]},
        'probes': [('IP(2p)', {1: -1})],
    },
    'O': {
        'z': 8,
        'ae': {0: [2, 2], 1: [4]},
        'probes': [('IP(2p)', {1: -1})],
    },
    'Sc': {
        'z': 21,
        'ae': {0: [2, 2, 2, 2], 1: [6, 6], 2: [1]},
        'probes': [
            ('IP(4s)', {0: -1}),  # Sc -> Sc+ (4s^1 3d^1)
            ('2IP(4s)', {0: -2}),  # -> Sc2+ (3d^1)
            ('s->d transfer', {0: -1, 2: +1}),  # 4s^2 3d^1 -> 4s^1 3d^2
        ],
    },
}

CORE_SHELLS = {2: {0: [2]}, 10: {0: [2, 2], 1: [6]}}  # n_core -> AE core occs


def _apply_probe(occs, delta):
    """New occupation dict with the outermost shell of channel l changed."""
    out = {l: list(fs) for l, fs in occs.items()}
    for l, df in delta.items():
        fs = out.setdefault(l, [])
        if df > 0 and (not fs or fs[-1] >= 4 * l + 2):
            fs.append(0)
        fs[-1] += df
        assert 0 <= fs[-1] <= 4 * l + 2
        if fs[-1] == 0:
            fs.pop()
            if not fs:
                del out[l]
    return out


def _valence_occs(ae_occs, n_core):
    """Strip the AE core shells off the configuration."""
    core = CORE_SHELLS[n_core]
    out = {}
    for l, fs in ae_occs.items():
        rest = fs[len(core.get(l, [])) :]
        if rest:
            out[l] = rest
    return out


def check_element(sym, ecp_type, grid_kwargs):
    atom = ATOMS[sym]
    z = atom['z']
    params = get_ecp_params(ecp_type, z)
    n_core = params[0]
    ae_occs = atom['ae']
    val_occs = _valence_occs(ae_occs, n_core)
    core = CORE_SHELLS[n_core]

    ae = solve_atom(z, ae_occs, **grid_kwargs)
    pp = solve_atom(z, val_occs, ecp_params=params, **grid_kwargs)
    assert ae.converged and pp.converged

    rows = []
    for l, fs in val_occs.items():
        n_core_l = len(core.get(l, []))
        for n in range(len(fs)):
            name = f'{SHELL_NAMES[l]}[{n}]'
            e_ae = ae.eigenvalues[(l, n + n_core_l)]
            e_pp = pp.eigenvalues[(l, n)]
            rows.append(
                {
                    'kind': 'eigenvalue',
                    'shell': name,
                    'ae': e_ae,
                    'ecp': e_pp,
                    'dev_mha': (e_pp - e_ae) * 1e3,
                }
            )
    for probe_name, delta in atom['probes']:
        ae2 = solve_atom(z, _apply_probe(ae_occs, delta), **grid_kwargs)
        pp2 = solve_atom(
            z, _apply_probe(val_occs, delta), ecp_params=params, **grid_kwargs
        )
        assert ae2.converged and pp2.converged
        d_ae = ae2.e_total - ae.e_total
        d_pp = pp2.e_total - pp.e_total
        rows.append(
            {
                'kind': 'delta_e',
                'shell': probe_name,
                'ae': d_ae,
                'ecp': d_pp,
                'dev_mha': (d_pp - d_ae) * 1e3,
            }
        )
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--elements', default=None, help='e.g. C:ccECP,Sc:ccECP')
    p.add_argument('--n-grid', type=int, default=2600)
    p.add_argument('--rmin', type=float, default=1e-7)
    args = p.parse_args()
    pairs = (
        [tuple(e.split(':')) for e in args.elements.split(',')]
        if args.elements
        else [
            ('C', 'ccECP'),
            ('N', 'ccECP'),
            ('O', 'ccECP'),
            ('Li', 'ccECP'),
            ('C', 'bfd'),
            ('Li', 'bfd'),
            ('Sc', 'ccECP'),
        ]
    )
    grid_kwargs = {'n_grid': args.n_grid, 'rmin': args.rmin}
    results = {}
    for sym, ecp_type in pairs:
        rows = check_element(sym, ecp_type, grid_kwargs)
        results[f'{sym}:{ecp_type}'] = rows
        print(f'\n== {sym} {ecp_type} ==')
        for row in rows:
            print(
                f'  {row["kind"]:>10} {row["shell"]:>14}  '
                f'AE {row["ae"]:+10.5f}  ECP {row["ecp"]:+10.5f}  '
                f'dev {row["dev_mha"]:+8.1f} mHa'
            )
        worst = max(abs(r['dev_mha']) for r in rows)
        print(f'  worst |dev| = {worst:.1f} mHa')
    out = Path('docs/evidence/ecp_valence_check.json')
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f'\nwrote {out}')


if __name__ == '__main__':
    main()
