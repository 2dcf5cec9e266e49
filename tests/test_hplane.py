"""
HPlane: the reference's 2D hydrogen-plane ab initio helper
(/root/reference/libdmet/system/lattice.py:1284 HPlane) through the
native periodic engine, exercising the 2D BvK translation group.

Oracles:
  * stripe (translation-symmetric) assembly == dense assembly of the
    same supercell (translation declaration must not change physics),
  * a [2, 1] plane of single H cells == the 2-cell H chain with the
    periodic axis rotated x<->z (rotation invariance of the Ewald-
    periodized integrals).
"""

import numpy as np


def _dense_clone(cell):
    from libdmet_preview_tpu.ints.pbc import PbcCell
    c = PbcCell([(s, x) for s, x in cell.atoms], cell.a, unit="B",
                basis="sto-3g")
    return c


def test_hplane_stripe_vs_dense():
    from libdmet_preview_tpu.ints.pbc import make_hplane_supercell
    cell = make_hplane_supercell(nkx=2, nky=2, nHx=1, nHy=1,
                                 Rx=2.0, Ry=2.4, vac=8.0)
    assert cell.ncells_tr == 4 and cell.nao == 4
    dense = _dense_clone(cell)
    assert np.max(np.abs(cell.intor_ovlp() - dense.intor_ovlp())) < 1e-10
    assert np.max(np.abs(cell.intor_hcore() - dense.intor_hcore())) < 1e-8


def test_hplane_matches_rotated_hchain():
    from libdmet_preview_tpu.ints.pbc import (make_hplane_supercell,
                                              make_hchain_supercell)
    plane = make_hplane_supercell(nkx=2, nky=1, nHx=1, nHy=1,
                                  Rx=1.8, Ry=8.0, vac=8.0)
    chain = make_hchain_supercell(nk=2, nH=1, R=1.8, vac=8.0,
                                  basis="sto-3g")
    for op in ("intor_ovlp", "intor_hcore"):
        A, B = getattr(plane, op)(), getattr(chain, op)()
        assert np.max(np.abs(A - B)) < 1e-8, op
    assert abs(plane.energy_nuc() - chain.energy_nuc()) < 1e-9
