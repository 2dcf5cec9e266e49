"""
Native split-valence double-zeta + polarization ('tpu-dzvp') generation
(ints/basisopt.make_gth_dzvp_basis) -- the reference inherits
gth-dzvp(-molopt-sr) from CP2K tables via PySCF (its NiO-FM workload,
/root/reference/examples/dmet/04-dmet-nio-fm/nio_fm.py:37); here the
set is CONSTRUCTED from the same GTH atomic Hartree-Fock that builds
tpu-szv, so the only oracle needed is the variational principle plus
structural sanity.
"""

import numpy as np


def _gth_rhf(atoms, basis_data, nelec):
    """Minimal closed-shell GTH RHF on MoleGeneral integrals."""
    from libdmet_preview_tpu.ints.md import MoleGeneral
    from libdmet_preview_tpu.ints.gth import gth_pp_molecular

    name = next(iter(basis_data))[1]
    mol = MoleGeneral(atoms, basis=name, basis_data=basis_data)
    S = mol.intor_ovlp()
    T = mol.intor_kin()
    V, zions = gth_pp_molecular(mol)
    eri = mol.intor_eri()
    hcore = T + V
    coords = np.asarray(mol.coords)
    e_nuc = 0.0
    for i in range(len(atoms)):
        for j in range(i):
            e_nuc += zions[i] * zions[j] / np.linalg.norm(
                coords[i] - coords[j])

    s_val, s_vec = np.linalg.eigh(S)
    keep = s_val > 1e-9
    X = s_vec[:, keep] / np.sqrt(s_val[keep])
    nocc = nelec // 2
    dm = np.zeros_like(S)
    e_old = np.inf
    for it in range(200):
        J = np.einsum("pqrs, rs -> pq", eri, dm)
        K = np.einsum("prqs, rs -> pq", eri, dm)
        F = hcore + J - 0.5 * K
        _, C_o = np.linalg.eigh(X.T @ F @ X)
        C = X @ C_o
        dm_new = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        dm = dm_new if it < 2 else 0.7 * dm_new + 0.3 * dm
        E = 0.5 * np.einsum("pq, pq ->", hcore + F, dm) + e_nuc
        if abs(E - e_old) < 1e-10 and it > 4:
            break
        e_old = E
    return E, S


def test_dzvp_h2_variational():
    """H2/GTH: the generated double-zeta+pol basis must lie variationally
    below the generated minimal basis, by a chemically visible margin,
    and stay numerically well conditioned."""
    from libdmet_preview_tpu.ints.basisopt import (
        make_gth_valence_basis, make_gth_dzvp_basis)

    atoms = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.4))]
    szv = {("H", "tpu-szv"): make_gth_valence_basis("H")}
    dzvp = {("H", "tpu-dzvp"): make_gth_dzvp_basis("H")}
    E_szv, _ = _gth_rhf(atoms, szv, 2)
    E_dzvp, S = _gth_rhf(atoms, dzvp, 2)
    # split valence + polarization buys > 10 mHa on H2 at equilibrium
    assert E_dzvp < E_szv - 0.010
    # RHF/GTH H2 near the basis-set limit is about -1.13; dzvp must be
    # within ~25 mHa of it (szv sits ~45 mHa above)
    assert E_dzvp < -1.105
    assert np.linalg.eigvalsh(S).min() > 1e-6


def test_dzvp_structure_and_pol_exponents():
    """Structural checks: one extra free function per split channel, a
    polarization shell of l_max+1, and dipole-rule exponents in the
    literature ballpark (H p ~ 1, O d ~ 0.5-2) -- WITHOUT transcribing
    any table."""
    from libdmet_preview_tpu.ints.basisopt import (
        make_gth_valence_basis, make_gth_dzvp_basis)

    for sym, l_pol_expected, lo, hi in [("H", 1, 0.3, 3.0),
                                        ("O", 2, 0.3, 3.0)]:
        szv = make_gth_valence_basis(sym)
        dz = make_gth_dzvp_basis(sym)
        # one split (outer zeta) per valence channel + one pol shell
        n_channels = len({l for l, _ in szv})
        assert len(dz) == len(szv) + n_channels + 1
        l_pol, prims = dz[-1]
        assert l_pol == l_pol_expected
        assert len(prims) == 1
        assert lo < prims[0][0] < hi
        # outer zetas are single free primitives
        frees = [prims for l, prims in dz
                 if len(prims) == 1 and l != l_pol]
        assert len(frees) == n_channels


def test_dzvp_o_atom_variational():
    """Pseudo-atomic O: dzvp lies below szv for the open-shell-averaged
    atom as well (uses the spherically averaged atomic HF as the
    oracle engine on both sets)."""
    from libdmet_preview_tpu.ints.basisopt import (
        make_gth_valence_basis, make_gth_dzvp_basis)

    # O2 molecule closed-shell surrogate: variational comparison on the
    # same geometry (RHF singlet O2 is not the physical ground state but
    # is a perfectly good variational comparison point)
    atoms = [("O", (0.0, 0.0, 0.0)), ("O", (0.0, 0.0, 2.28))]
    szv = {("O", "tpu-szv"): make_gth_valence_basis("O")}
    dzvp = {("O", "tpu-dzvp"): make_gth_dzvp_basis("O")}
    E_szv, _ = _gth_rhf(atoms, szv, 12)
    E_dzvp, _ = _gth_rhf(atoms, dzvp, 12)
    assert E_dzvp < E_szv - 0.010
