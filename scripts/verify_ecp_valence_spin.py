"""Spin-polarized (x-only LSDA) corroboration of the ECP valence check.

The restricted oracle (scripts/verify_ecp_valence.py) flags an +87.8 mHa 2s
deviation for the published N ccECP table — ~5x the C/O band — with the
*hypothesis* that the spin-restricted, spherically averaged solver is simply
least trustworthy at N's half-filled 2p^3 shell (maximal Hund polarization).
This driver tests that hypothesis one level up: the same AE-vs-ECP
comparison with the spin-polarized solver (radial_atom.solve_atom_spin),
where each spin channel carries its own exchange.  If the N anomaly
collapses into the C/O band here, the restricted-solver explanation stands;
if it persists, the table itself is suspect.

Writes docs/evidence/ecp_valence_spin_check.json.

Usage: python scripts/verify_ecp_valence_spin.py [--elements C:ccECP,...]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepqmc_tpu.ecp.data import get_ecp_params
from deepqmc_tpu.ecp.radial_atom import solve_atom_spin

SHELL_NAMES = {0: 's', 1: 'p', 2: 'd'}

# Hund ground-state spin configurations (spherically averaged per channel).
# Each entry: z, AE occupations per spin, and Delta-E probes as per-spin
# occupation changes.
ATOMS = {
    'C': {
        'z': 6,
        'ae_up': {0: [1, 1], 1: [2]},
        'ae_down': {0: [1, 1]},
        'probes': [('IP(2p)', ({1: -1}, {}))],
    },
    'N': {
        'z': 7,
        'ae_up': {0: [1, 1], 1: [3]},
        'ae_down': {0: [1, 1]},
        'probes': [('IP(2p)', ({1: -1}, {}))],
    },
    'O': {
        'z': 8,
        'ae_up': {0: [1, 1], 1: [3]},
        'ae_down': {0: [1, 1], 1: [1]},
        'probes': [('IP(2p)', ({}, {1: -1}))],
    },
    'Sc': {
        'z': 21,
        'ae_up': {0: [1, 1, 1, 1], 1: [3, 3], 2: [1]},
        'ae_down': {0: [1, 1, 1, 1], 1: [3, 3]},
        'probes': [('IP(4s)', ({0: -1}, {}))],
    },
}

CORE_SHELLS = {2: {0: [1]}, 10: {0: [1, 1], 1: [3]}}  # n_core -> PER-SPIN core


def _apply_probe(occs, delta):
    out = {l: list(fs) for l, fs in occs.items()}
    for l, df in delta.items():
        fs = out.setdefault(l, [])
        if df > 0 and (not fs or fs[-1] >= 2 * l + 1):
            fs.append(0)
        fs[-1] += df
        assert 0 <= fs[-1] <= 2 * l + 1  # per-spin channel capacity
        if fs[-1] == 0:
            fs.pop()
            if not fs:
                del out[l]
    return out


def _valence(occs, n_core):
    core = CORE_SHELLS[n_core]
    out = {}
    for l, fs in occs.items():
        rest = fs[len(core.get(l, [])) :]
        if rest:
            out[l] = rest
    return out


def check_element(sym, ecp_type, grid_kwargs):
    atom = ATOMS[sym]
    z = atom['z']
    params = get_ecp_params(ecp_type, z)
    n_core = params[0]
    core = CORE_SHELLS[n_core]
    ae_occs = (atom['ae_up'], atom['ae_down'])
    val_occs = tuple(_valence(o, n_core) for o in ae_occs)

    ae, ae_eps = solve_atom_spin(z, *ae_occs, **grid_kwargs)
    pp, pp_eps = solve_atom_spin(z, *val_occs, ecp_params=params, **grid_kwargs)
    assert ae.converged and pp.converged

    rows = []
    for s, label in ((0, 'up'), (1, 'down')):
        for l, fs in val_occs[s].items():
            n_core_l = len(core.get(l, []))
            for n in range(len(fs)):
                name = f'{SHELL_NAMES[l]}[{n}]{label}'
                e_ae = ae_eps[s][(l, n + n_core_l)]
                e_pp = pp_eps[s][(l, n)]
                rows.append(
                    {
                        'kind': 'eigenvalue',
                        'shell': name,
                        'ae': e_ae,
                        'ecp': e_pp,
                        'dev_mha': (e_pp - e_ae) * 1e3,
                    }
                )
    for probe_name, (d_up, d_down) in atom['probes']:
        ae2, _ = solve_atom_spin(
            z,
            _apply_probe(ae_occs[0], d_up),
            _apply_probe(ae_occs[1], d_down),
            **grid_kwargs,
        )
        pp2, _ = solve_atom_spin(
            z,
            _apply_probe(val_occs[0], d_up),
            _apply_probe(val_occs[1], d_down),
            ecp_params=params,
            **grid_kwargs,
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
    p.add_argument('--elements', default=None, help='e.g. N:ccECP,Sc:ccECP')
    p.add_argument('--n-grid', type=int, default=2600)
    p.add_argument('--rmin', type=float, default=1e-7)
    args = p.parse_args()
    pairs = (
        [tuple(e.split(':')) for e in args.elements.split(',')]
        if args.elements
        else [('C', 'ccECP'), ('N', 'ccECP'), ('O', 'ccECP'), ('Sc', 'ccECP')]
    )
    grid_kwargs = {'n_grid': args.n_grid, 'rmin': args.rmin}
    results = {}
    for sym, ecp_type in pairs:
        rows = check_element(sym, ecp_type, grid_kwargs)
        results[f'{sym}:{ecp_type}'] = rows
        print(f'\n== {sym} {ecp_type} (spin-polarized) ==')
        for row in rows:
            print(
                f'  {row["kind"]:>10} {row["shell"]:>14}  '
                f'AE {row["ae"]:+10.5f}  ECP {row["ecp"]:+10.5f}  '
                f'dev {row["dev_mha"]:+8.1f} mHa'
            )
        worst = max(abs(r['dev_mha']) for r in rows)
        print(f'  worst |dev| = {worst:.1f} mHa')
    out = Path('docs/evidence/ecp_valence_spin_check.json')
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f'\nwrote {out}')


if __name__ == '__main__':
    main()
