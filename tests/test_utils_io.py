"""
Utility-layer tests: structure I/O, DMRG extrapolation, DCA coarse
graining, lattice plotting (reference utils/test suites)."""

import os
import numpy as np
import pytest


def test_poscar_roundtrip(tmp_path):
    from libdmet_preview_tpu.utils.iotools import write_poscar, read_poscar
    cell = np.diag([4.0, 5.0, 6.0])
    symbols = ["Cu", "O", "O"]
    frac = np.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    path = str(tmp_path / "POSCAR")
    write_poscar(path, cell, symbols, frac)
    cell2, sym2, frac2 = read_poscar(path)
    assert np.allclose(cell2, cell)
    assert sym2 == symbols
    assert np.allclose(frac2, frac)


def test_xyz_roundtrip(tmp_path):
    from libdmet_preview_tpu.utils.iotools import write_xyz, read_xyz
    symbols = ["H", "H"]
    coords = np.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.74]])
    path = str(tmp_path / "h2.xyz")
    write_xyz(path, symbols, coords)
    sym2, coords2 = read_xyz(path)
    assert sym2 == symbols and np.allclose(coords2, coords)


def test_extrapolate_M():
    from libdmet_preview_tpu.utils.extrapolate import extrapolate_M
    Ms = np.asarray([400, 800, 1600, 3200])
    E_inf, a = -1.2345, 0.8
    Es = E_inf + a / Ms
    E_fit, coeffs = extrapolate_M(Ms, Es)
    assert abs(E_fit - E_inf) < 1e-10


def test_dca_coarse_grain():
    from libdmet_preview_tpu.utils.dca import dca_coarse_grain
    from libdmet_preview_tpu.ops import zlinalg
    # 1D tight-binding dispersion on 12 k-points -> 4 cluster momenta
    nk, nc = 12, 4
    ks = 2 * np.pi * np.fft.fftfreq(nk)
    H = (-2 * np.cos(ks))[:, None, None]
    GK_re, GK_im = dca_coarse_grain((H, np.zeros_like(H)), (nk,), (nc,))
    Ks = 2 * np.pi * np.fft.fftfreq(nc)
    # patch average of -2 cos(k) around K: -2 cos(K) * sinc factor
    # check monotone structure + exact patch means
    for iK, K in enumerate(Ks):
        members = [k for k in ks if
                   abs((k - K + np.pi) % (2 * np.pi) - np.pi) <=
                   np.pi / nc + 1e-9]
        want = np.mean([-2 * np.cos(k) for k in members])
        assert abs(GK_re[iK, 0, 0] - want) < 1e-9


def test_lattice_plot_smoke(tmp_path):
    pytest.importorskip("matplotlib")
    from libdmet_preview_tpu.utils.lattice_plot import (plot_lattice,
                                                        plot_dos)
    coords = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float)
    ax = plot_lattice(coords, charges=[1, 1, 1, 1],
                      spins=[0.3, -0.3, -0.3, 0.3],
                      bonds=[(0, 1, 0.5), (0, 2, 0.5)],
                      filename=str(tmp_path / "latt.png"))
    assert os.path.exists(str(tmp_path / "latt.png"))
    ax2 = plot_dos(np.linspace(-2, 2, 20),
                   filename=str(tmp_path / "dos.png"))
    assert os.path.exists(str(tmp_path / "dos.png"))


def test_cubegen_density_normalization(tmp_path):
    """Cube density integrates to the electron count (H2/STO-6G)."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF
    from libdmet_preview_tpu.utils import cubegen
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-6g")
    S, h, g = mol.intor_ovlp(), mol.intor_hcore(), mol.intor_eri()
    Ham = Integral(2, True, False, mol.energy_nuc(), {"cd": h[None]},
                   {"ccdd": g[None]}, ovlp=S)
    scf = SCF()
    scf.set_system(2, 0, False, True)
    scf.set_integral(Ham)
    E, dm = scf.HF(tol=1e-10)
    dm_tot = dm[0] + dm[1]
    nx = ny = nz = 50
    path = str(tmp_path / "rho.cube")
    rho = cubegen.density(mol, path, dm_tot, nx=nx, ny=ny, nz=nz,
                          margin=6.0)
    lo, steps, pts = cubegen._grid(mol, nx, ny, nz, margin=6.0)
    dv = steps[0] * steps[1] * steps[2]
    n_int = np.sum(rho) * dv
    assert abs(n_int - 2.0) < 5e-2
    assert (tmp_path / "rho.cube").exists()


def test_integral_mmap_roundtrip(tmp_path):
    """mmap Integral dump/load (reference integral.py:792-860): tensors
    come back memory-mapped and exact."""
    from libdmet_preview_tpu.models.integral import (Integral, save_mmap,
                                                     load_mmap)
    rng = np.random.RandomState(0)
    h = rng.randn(1, 4, 4)
    g = rng.randn(1, 4, 4, 4, 4)
    Ham = Integral(4, True, False, 0.5, {"cd": h}, {"ccdd": g})
    prefix = str(tmp_path / "ham")
    save_mmap(prefix, Ham)
    back = load_mmap(prefix)
    # Integral normalizes to base ndarray VIEWS; the buffer stays
    # file-backed (no copy) -- walk .base to the memmap
    b = back.H2["ccdd"]
    while b.base is not None and not isinstance(b, np.memmap):
        b = b.base
    assert isinstance(b, np.memmap)
    assert np.abs(np.asarray(back.H1["cd"]) - h).max() == 0.0
    assert np.abs(np.asarray(back.H2["ccdd"]) - g).max() == 0.0
    assert back.H0 == 0.5


def test_emb_eri_chol_outcore(tmp_path):
    """Outcore (HDF5 dataset) result mode of the Cholesky embedding-ERI
    transform equals the incore result."""
    from libdmet_preview_tpu.ops.eri_transform import (cholesky_eri,
                                                       get_emb_eri_chol)
    rng = np.random.RandomState(2)
    A = rng.randn(5, 3, 3)
    A = A + A.transpose(0, 2, 1)
    g = np.einsum("xpq, xrs -> pqrs", A, A)
    L = cholesky_eri(g, tol=1e-12)
    basis = rng.randn(1, 2, 3, 4)   # fake 2-cell stripe... nsite must be 3
    basis = rng.randn(1, 1, 3, 4)
    incore = get_emb_eri_chol(L, basis)
    path = str(tmp_path / "eri.h5")
    dset = get_emb_eri_chol(L, basis, outcore=path)
    assert np.abs(np.asarray(dset) - incore).max() < 1e-12
    dset.file.close()


def test_dos_k_projected():
    """k-resolved + orbital-projected DOS integrates to the right state
    counts (reference utils/plot.py:825-1006 get_dos_k capability)."""
    import numpy as np
    from libdmet_preview_tpu.utils.analysis import get_dos_k
    rng = np.random.RandomState(0)
    nk, nao = 4, 3
    e = rng.randn(nk, nao)
    ws, dos = get_dos_k(e, sigma=0.05, nw=3000)
    dw = ws[1] - ws[0]
    # each k panel integrates to nao states
    assert np.allclose(dos.sum(axis=1) * dw, nao, atol=1e-2)
    # projection on ALL orbitals with an orthogonal C == plain DOS
    C = np.linalg.qr(rng.randn(nao, nao))[0]
    Ck = np.broadcast_to(C, (nk, nao, nao))
    ws2, dos2 = get_dos_k(e, Ck, ws=ws, sigma=0.05)
    assert np.abs(dos2 - dos).max() < 1e-8


def test_ghf_fcidump_roundtrip(tmp_path):
    """GHF (spin-orbital) FCIDUMP writer: the general block reads back as
    a restricted dump with the same integrals (IGENERAL header)."""
    import numpy as np
    from libdmet_preview_tpu.models.integral import (Integral,
                                                     dump_FCIDUMP_ghf,
                                                     read_FCIDUMP)
    rng = np.random.RandomState(1)
    n = 4
    h1 = rng.randn(n, n)
    h1 = h1 + h1.T
    A = rng.randn(n * n, n * n)
    eri = (A @ A.T).reshape(n, n, n, n)
    eri = 0.5 * (eri + eri.transpose(1, 0, 2, 3))
    eri = 0.5 * (eri + eri.transpose(0, 1, 3, 2))
    eri = 0.5 * (eri + eri.transpose(2, 3, 0, 1))
    Ham = Integral(n, True, False, 0.7, {"cd": h1[None]},
                   {"ccdd": eri[None]})
    p = str(tmp_path / "GDUMP")
    dump_FCIDUMP_ghf(p, Ham, nelec=2)
    assert "IGENERAL=1" in open(p).read()
    back = read_FCIDUMP(p)
    assert abs(back.H0 - 0.7) < 1e-10
    assert np.abs(np.asarray(back.H1["cd"][0]) - h1).max() < 1e-10
    assert np.abs(np.asarray(back.H2["ccdd"][0]) - eri).max() < 1e-9


def test_cubegen_general_l(tmp_path):
    """General-l AO evaluation in cubegen: the numerical norm of each AO
    matches the analytic overlap diagonal (p shells included)."""
    import numpy as np
    from libdmet_preview_tpu.ints.md import MoleGeneral
    from libdmet_preview_tpu.utils import cubegen
    A = 1.0 / 0.52917720859
    mol = MoleGeneral([("O", (0, 0, 0)), ("H", (0, 0, A))],
                      basis="sto-3g")
    n = 61
    L = 11.0
    x = (np.arange(n) + 0.5) / n * L - L / 2
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    pts[:, 2] += 0.5 * A
    w = (L / n) ** 3
    ao = cubegen.eval_ao(mol, pts)
    S_num = w * ao.T @ ao
    S_ana = mol.intor_ovlp()
    # skip AO 0 (the O 1s core; the uniform test grid underresolves its
    # tight primitives) -- valence s and the three 2p components
    assert np.abs(np.diag(S_num)[1:] - np.diag(S_ana)[1:]).max() < 2e-3
    # cube write path for an orbital built on p AOs
    c = np.zeros(mol.nao)
    c[2] = 1.0   # an O 2p component
    cubegen.orbital(mol, str(tmp_path / "orb.cube"), c, nx=12, ny=12,
                    nz=12)
    assert (tmp_path / "orb.cube").exists()
