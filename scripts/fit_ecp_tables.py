"""Refit packaged ECP tables that fail the AE valence check; write new files.

Drives :mod:`deepqmc_tpu.ecp.fit` for elements whose packaged Gaussian
parameters are untrusted (see scripts/verify_ecp_valence.py): computes
high-accuracy all-electron LDA-x targets, refits the free ECP parameters,
reports before/after deviations (including a held-out probe NOT used in the
fit), and writes the refit GAMESS file plus a JSON evidence record.

--check-recovery C runs the methodology control: perturb the *verified*
carbon table, refit, and confirm the procedure recovers parameters whose
valence deviations return to the verified-table band.

Usage:
  python scripts/fit_ecp_tables.py --element N            # refit N.ccECP
  python scripts/fit_ecp_tables.py --element Sc           # refit Sc.ccECP
  python scripts/fit_ecp_tables.py --check-recovery C     # control run
"""

import argparse
import copy
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepqmc_tpu.ecp.data import get_ecp_params
from deepqmc_tpu.ecp.fit import fit_ecp_params
from deepqmc_tpu.ecp.radial_atom import solve_atom

AE_GRID = {'n_grid': 2600, 'rmin': 1e-7}
FIT_GRID = {'n_grid': 1100, 'rmin': 1e-5}

# Per element: AE occupations, the valence view (per ECP core), the
# eigenvalue map {(l, n_valence): (l, n_ae)}, fit probes and one held-out
# probe, each probe given as (name, ae_occs_after, valence_occs_after).
ELEMENTS = {
    'C': {
        'z': 6,
        'ae': {0: [2, 2], 1: [2]},
        'val': {0: [2], 1: [2]},
        'eig_map': {(0, 0): (0, 1), (1, 0): (1, 0)},
        'probes': [
            ('IP(2p)', {0: [2, 2], 1: [1]}, {0: [2], 1: [1]}),
            ('2IP(2p)', {0: [2, 2]}, {0: [2]}),
            ('s->p', {0: [2, 1], 1: [3]}, {0: [1], 1: [3]}),
        ],
        'held_out': ('IP(2s)', {0: [2, 1], 1: [2]}, {0: [1], 1: [2]}),
    },
    'N': {
        'z': 7,
        'ae': {0: [2, 2], 1: [3]},
        'val': {0: [2], 1: [3]},
        'eig_map': {(0, 0): (0, 1), (1, 0): (1, 0)},
        'probes': [
            ('IP(2p)', {0: [2, 2], 1: [2]}, {0: [2], 1: [2]}),
            ('2IP(2p)', {0: [2, 2], 1: [1]}, {0: [2], 1: [1]}),
            ('3IP(2p)', {0: [2, 2]}, {0: [2]}),
            ('s->p', {0: [2, 1], 1: [4]}, {0: [1], 1: [4]}),
        ],
        'held_out': ('IP(2s)', {0: [2, 1], 1: [3]}, {0: [1], 1: [3]}),
    },
    'Sc': {
        'z': 21,
        'ae': {0: [2, 2, 2, 2], 1: [6, 6], 2: [1]},
        'val': {0: [2, 2], 1: [6], 2: [1]},
        'eig_map': {
            (0, 0): (0, 2),  # 3s
            (0, 1): (0, 3),  # 4s
            (1, 0): (1, 1),  # 3p
            (2, 0): (2, 0),  # 3d
        },
        'probes': [
            ('IP(4s)', {0: [2, 2, 2, 1], 1: [6, 6], 2: [1]}, {0: [2, 1], 1: [6], 2: [1]}),
            ('2IP(4s)', {0: [2, 2, 2], 1: [6, 6], 2: [1]}, {0: [2], 1: [6], 2: [1]}),
            ('s->d', {0: [2, 2, 2, 1], 1: [6, 6], 2: [2]}, {0: [2, 1], 1: [6], 2: [2]}),
            ('d->s', {0: [2, 2, 2, 2], 1: [6, 6]}, {0: [2, 2], 1: [6]}),
        ],
        'held_out': (
            '3IP(3d)',
            {0: [2, 2, 2], 1: [6, 6]},
            {0: [2], 1: [6]},
        ),
    },
}


def _cached_ae_solve(z, occs):
    """Disk-cached AE solve (the Sc AE configs take minutes each)."""
    key = f'{z}_' + '_'.join(
        f'{l}-' + '-'.join(map(str, fs)) for l, fs in sorted(occs.items())
    )
    cache = Path(f'/tmp/ae_cache_{key}_{AE_GRID["n_grid"]}.json')
    if cache.exists():
        from deepqmc_tpu.ecp.radial_atom import AtomSolution

        data = json.loads(cache.read_text())
        return AtomSolution(
            e_total=data['e_total'],
            eigenvalues={tuple(map(int, k.split(','))): v
                         for k, v in data['eigenvalues'].items()},
            orbitals={}, r=None, occs=occs, iterations=0, converged=True,
        )
    sol = solve_atom(z, occs, **AE_GRID)
    cache.write_text(json.dumps({
        'e_total': sol.e_total,
        'eigenvalues': {f'{l},{n}': v for (l, n), v in sol.eigenvalues.items()},
    }))
    return sol


def ae_targets(spec):
    """High-accuracy AE eigenvalue/probe targets for one element."""
    ae = _cached_ae_solve(spec['z'], spec['ae'])
    assert ae.converged
    eig = {k_val: ae.eigenvalues[k_ae] for k_val, k_ae in spec['eig_map'].items()}
    probes, probe_names = [], []
    for name, ae_occs, val_occs in spec['probes']:
        sol = _cached_ae_solve(spec['z'], ae_occs)
        assert sol.converged
        probes.append((val_occs, sol.e_total - ae.e_total))
        probe_names.append(name)
    name, ho_ae_occs, ho_val_occs = spec['held_out']
    ho = _cached_ae_solve(spec['z'], ho_ae_occs)
    held_out = (name, ho_val_occs, ho.e_total - ae.e_total)
    return ae, eig, probes, probe_names, held_out


def measure(z, params, val_occs, eig_targets, probes, probe_names, held_out):
    """Deviation table [mHa] of an ECP parameter set vs the AE targets."""
    base = solve_atom(z, val_occs, ecp_params=params, **AE_GRID)
    rows = [
        (f'eig{k}', (base.eigenvalues[k] - v) * 1e3)
        for k, v in eig_targets.items()
    ]
    for name, (occs_after, d_ae) in zip(probe_names, probes):
        sol = solve_atom(z, occs_after, ecp_params=params, **AE_GRID)
        rows.append((name, (sol.e_total - base.e_total - d_ae) * 1e3))
    ho_name, ho_occs, ho_d_ae = held_out
    sol = solve_atom(z, ho_occs, ecp_params=params, **AE_GRID)
    rows.append((f'{ho_name} [held out]', (sol.e_total - base.e_total - ho_d_ae) * 1e3))
    return rows


def write_gamess(path, sym, ecp_type, n_core, local, nonlocal_, header_note):
    l_max = len(nonlocal_)
    lines = [f'# {ln}' for ln in header_note.splitlines()]
    lines.append(f'{sym}-{ecp_type} GEN {n_core} {l_max}')
    loc_rows = (
        [(beta, 1, alpha) for alpha, beta in local[0]]
        + [(beta, 3, alpha) for alpha, beta in local[2]]
        + [(beta, 2, alpha) for alpha, beta in local[1]]
    )
    lines.append(str(len(loc_rows)))
    for beta, power, alpha in loc_rows:
        lines.append(f'{beta:.8f} {power} {alpha:.8f}')
    for chan in nonlocal_:
        lines.append(str(len(chan)))
        for alpha, beta in chan:
            lines.append(f'{beta:.8f} 2 {alpha:.8f}')
    Path(path).write_text('\n'.join(lines) + '\n')


def run(sym, ecp_type, init_params, write=True, label='refit', tether=0.03):
    spec = ELEMENTS[sym]
    z = spec['z']
    print(f'== {sym} {ecp_type}: computing AE targets ==', flush=True)
    ae, eig, probes, probe_names, held_out = ae_targets(spec)
    print('before:', flush=True)
    before = measure(z, init_params, spec['val'], eig, probes, probe_names, held_out)
    for name, dev in before:
        print(f'  {name:>22} {dev:+8.1f} mHa')
    print('fitting...', flush=True)
    params, res = fit_ecp_params(
        z, init_params, spec['val'], eig, probes,
        grid_kwargs=FIT_GRID, tether=tether, verbose=True,
    )
    print('after:', flush=True)
    after = measure(z, params, spec['val'], eig, probes, probe_names, held_out)
    for name, dev in after:
        print(f'  {name:>22} {dev:+8.1f} mHa')
    evidence = {
        'element': sym,
        'ecp_type': ecp_type,
        'label': label,
        'before_mha': dict(before),
        'after_mha': dict(after),
        'params': {
            'n_core': params[0],
            'local': np.asarray(
                [[list(map(float, t)) for t in cls] for cls in params[1]],
                dtype=object,
            ).tolist(),
            'nonlocal': [
                [list(map(float, t)) for t in chan] for chan in params[2]
            ],
        },
    }
    out = Path(f'docs/evidence/ecp_fit_{sym}_{label}.json')
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(evidence, indent=1))
    print(f'wrote {out}')
    if write:
        # refits land in the OPT-IN directory, never over the published
        # defaults (advisor round 2: keep published provenance the default)
        path = Path('deepqmc_tpu/ecp/tables/refit') / f'{sym}.{ecp_type}.gamess'
        note = (
            f'IN-HOUSE LDA-REFIT table (not the published {ecp_type} file).\n'
            'Gaussian parameters re-optimized against all-electron\n'
            'exchange-only-LDA valence eigenvalues and ionization-like\n'
            'Delta-E probes (scripts/fit_ecp_tables.py; evidence in\n'
            f'docs/evidence/ecp_fit_{sym}_{label}.json). The functional\n'
            f'form, core size and origin-regularity identities of {ecp_type}\n'
            'are preserved. Replace with the published file via\n'
            'DEEPQMC_TPU_ECP_DIR for production use.'
        )
        write_gamess(path, sym, ecp_type, params[0], params[1], params[2], note)
        print(f'wrote {path}')
    return params, before, after


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--element', default=None)
    p.add_argument('--ecp-type', default='ccECP')
    p.add_argument('--check-recovery', default=None, metavar='ELEMENT')
    p.add_argument(
        '--tether',
        type=float,
        default=0.03,
        help='weight of the stay-near-initial-parameters regularizer; use a '
        'small value (~0.003) when the initial parameters are known-bad '
        'placeholders that the fit must move far from',
    )
    p.add_argument(
        '--enrich',
        action='store_true',
        help='add extra Gaussian terms (incl. a d-projector channel) before '
        'fitting — for elements whose minimal parameterization cannot '
        'reproduce AE valence physics (transition metals)',
    )
    args = p.parse_args()
    if args.check_recovery:
        sym = args.check_recovery
        params = copy.deepcopy(get_ecp_params(args.ecp_type, ELEMENTS[sym]['z']))
        # perturb the verified table, then confirm the fit recovers it
        perturbed = copy.deepcopy(params)
        perturbed[2][0][0][1] *= 1.3  # s-projector coefficient +30%
        perturbed[1][1][0][0] *= 1.2  # local r^0 exponent +20%
        run(sym, args.ecp_type, perturbed, write=False, label='recovery_check')
    else:
        sym = args.element
        params = copy.deepcopy(get_ecp_params(args.ecp_type, ELEMENTS[sym]['z']))
        if args.enrich:
            # seeds are NONZERO: a zero-coefficient Gaussian has a (nearly)
            # zero jacobian column — its exponent is a dead direction and
            # trust-region steps stall before the term can grow
            n_core, local, nonlocal_ = params
            local[1].append([3.0, 1.0])  # second r^0 local term
            nonlocal_[0].append([4.0, 5.0])  # second s-projector term
            if len(nonlocal_) > 1:
                nonlocal_[1].append([3.5, 5.0])  # second p-projector term
            # d-projector channel: the d shell otherwise feels only the
            # local part, which has too little freedom for 3d physics;
            # exponents bracket the 3d density peak (r ~ 1 bohr)
            nonlocal_.append([[3.0, 2.0], [0.8, -1.0]])
            params = (n_core, local, nonlocal_)
        run(sym, args.ecp_type, params, tether=args.tether)


if __name__ == '__main__':
    main()
