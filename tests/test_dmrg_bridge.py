"""
DMRG bridge (solvers/dmrg.py) without the external binary: a FAKE
executable reads the generated dmrg.conf + FCIDUMP, solves the problem
with the in-process FCI, and writes Block-format outputs ("Sweep Energy"
line + binary spin-orbital onepdm) -- exercising the schedule generator,
config writer, subprocess launch and binary pdm readback end to end
(the reference needs real StackBlock/Block2 binaries for any of this,
/root/reference/libdmet/solver/block.py:281-900).
"""

import os
import stat
import sys
import textwrap

import numpy as np
import pytest


FAKE = textwrap.dedent("""\
    #!/usr/bin/env python
    import sys, os, re
    import numpy as np
    sys.path.insert(0, %(repo)r)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import libdmet_preview_tpu
    from libdmet_preview_tpu.models.integral import read_FCIDUMP
    from libdmet_preview_tpu.solvers.fci import fci_kernel

    conf_path = sys.argv[-1]
    conf = open(conf_path).read()
    nelec = int(re.search(r"nelec (\\d+)", conf).group(1))
    spin = int(re.search(r"spin (\\d+)", conf).group(1))
    assert "schedule" in conf and "sweep_tol" in conf
    assert "onepdm" in conf
    fcidump = re.search(r"orbitals (.*)", conf).group(1).strip()
    prefix = re.search(r"prefix (.*)", conf).group(1).strip()
    Ham = read_FCIDUMP(fcidump)
    h1 = np.asarray(Ham.H1["cd"])[0]
    eri = np.asarray(Ham.H2["ccdd"])[0]
    norb = Ham.norb
    from libdmet_preview_tpu.solvers.fci import make_rdm1s
    na = (nelec + spin) // 2
    e, ci = fci_kernel(h1, eri, norb, (na, nelec - na), ecore=Ham.H0,
                       tol=1e-11)
    rdm1_spat = np.asarray(make_rdm1s(ci, norb, (na, nelec - na)))
    # Block-style outputs: sweep energy + binary interleaved-spin 1-pdm
    so = np.zeros((2 * norb, 2 * norb))
    so[::2, ::2] = rdm1_spat[0] if rdm1_spat.ndim == 3 else rdm1_spat / 2
    so[1::2, 1::2] = rdm1_spat[-1] if rdm1_spat.ndim == 3 else rdm1_spat / 2
    os.makedirs(os.path.join(prefix, "node0"), exist_ok=True)
    with open(os.path.join(prefix, "node0", "onepdm.0.0.bin"), "wb") as f:
        f.write(b"HDR!")               # binary reader takes the TAIL
        f.write(so.astype(np.float64).tobytes())
    print("Sweep Energy = %%.12f" %% e)
""")


def test_block_bridge_with_fake_executable(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.solvers.dmrg import BlockDMRG, Schedule
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = tmp_path / "fake_block2"
    exe.write_text(FAKE % {"repo": repo})
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    # small interacting Hamiltonian
    rng = np.random.RandomState(0)
    n = 4
    h1 = rng.randn(n, n) * 0.5
    h1 = h1 + h1.T
    eri = np.zeros((n,) * 4)
    np.fill_diagonal(eri, 2.0)
    Ham = Integral(n, True, False, 0.3, {"cd": h1[None]},
                   {"ccdd": eri[None]})

    solver = BlockDMRG([sys.executable, str(exe), "{conf}"], max_M=600,
                       workdir=str(tmp_path / "wd"), twopdm=False)
    sched = Schedule(sweep_tol=1e-7)
    sched.gen_initial(100, 600)
    solver.schedule = sched
    rdm1, E = solver.run(Ham, nelec=4)

    fci = FCI(restricted=True, tol=1e-11)
    rdm1_ref, E_ref = fci.run(Ham, nelec=4)
    assert abs(E - E_ref) < 1e-8
    assert np.abs(rdm1[0] - rdm1_ref[0]).max() < 1e-7

    # restart schedule path after an optimized run
    sched2 = Schedule(sweep_tol=1e-7).gen_restart(600)
    text = sched2.get_schedule()
    assert "schedule" in text and "sweep_tol" in text


def test_schedule_text_format():
    from libdmet_preview_tpu.solvers.dmrg import Schedule
    s = Schedule(max_iter=30, sweep_tol=1e-6)
    s.gen_initial(250, 1500)
    text = s.get_schedule()
    assert text.count("\n") > 5
    assert "twodot_to_onedot" in text or "twodot" in text
    # ladder is monotone and ends at max M twice
    assert s.arrayM[-1] == s.arrayM[-2] == 1500
    assert all(a <= b for a, b in zip(s.arrayM, s.arrayM[1:]))
    assert s.arrayNoise[-1] == 0.0
    s2 = Schedule().gen_extrapolate(2000)
    assert "onedot" in s2.get_schedule()


def test_pdm_binary_roundtrip(tmp_path):
    from libdmet_preview_tpu.solvers.dmrg import (read1pdm_bin,
                                                  read2pdm_bin, read1pdm)
    rng = np.random.RandomState(1)
    norb = 3
    so1 = rng.randn(2 * norb, 2 * norb)
    p = tmp_path / "onepdm.bin"
    p.write_bytes(b"junkhdr" + so1.astype(np.float64).tobytes())
    out = read1pdm_bin(str(p), norb)
    assert np.allclose(out[0], so1[::2, ::2])
    assert np.allclose(out[1], so1[1::2, 1::2])
    so2 = rng.randn(*(2 * norb,) * 4)
    p2 = tmp_path / "twopdm.bin"
    p2.write_bytes(so2.astype(np.float64).tobytes())
    out2 = read2pdm_bin(str(p2), norb, raw_data=True)
    assert np.allclose(out2, so2.transpose(0, 3, 1, 2))
    # text 1-pdm
    t = tmp_path / "spatial_onepdm.0.0.txt"
    m = rng.randn(norb, norb)
    lines = ["%d" % norb] + ["%d %d %.12f" % (i, j, m[i, j])
                             for i in range(norb) for j in range(norb)]
    t.write_text("\n".join(lines))
    assert np.allclose(read1pdm(str(t)), m)


def test_dmrgscf_composition_with_fake_executable(tmp_path):
    """DMRG-SCF: CASCI with the Block-DMRG bridge as the active-space
    solver (reference casscf.py:137 DMRGSCF wrapper role) via the fake
    executable -- the CASCI(2,2) energy with the DMRG 'binary' equals
    the CASCI(2,2) energy with the in-process FCI solver."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.solvers.dmrg import BlockDMRG, Schedule
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.casci import CASCI

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = tmp_path / "fake_block2"
    exe.write_text(FAKE % {"repo": repo})
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    rng = np.random.RandomState(3)
    n = 4
    h1 = rng.randn(n, n) * 0.4
    h1 = h1 + h1.T + np.diag([-2.0, -1.0, 0.5, 1.0])
    eri = np.zeros((n,) * 4)
    np.fill_diagonal(eri, 1.5)
    Ham = Integral(n, True, False, 0.1, {"cd": h1[None]},
                   {"ccdd": eri[None]})

    dmrg = BlockDMRG([sys.executable, str(exe), "{conf}"], max_M=600,
                     workdir=str(tmp_path / "wd"), twopdm=False)
    sched = Schedule(sweep_tol=1e-7)
    sched.gen_initial(100, 600)
    dmrg.schedule = sched

    mc_dmrg = CASCI(ncas=2, nelecas=2, fcisolver=dmrg)
    rdm1_d, E_d = mc_dmrg.run(Ham, nelec=4)
    mc_fci = CASCI(ncas=2, nelecas=2)
    rdm1_f, E_f = mc_fci.run(Ham, nelec=4)
    assert abs(E_d - E_f) < 1e-7
    assert np.abs(np.asarray(rdm1_d) - np.asarray(rdm1_f)).max() < 1e-6


def test_gso_dmrgci_composition_with_fake_executable(tmp_path):
    """GCASCI with the Block bridge as active-space solver (reference
    gso_dmrgci.py DmrgCI role): the GSO spin-orbital CAS problem is
    dumped as an all-alpha FCIDUMP (nelec particles, Sz=nelec -- the
    Block2 GHF convention), solved by the fake binary, and the energy
    matches the in-process GHF-FCI GCASCI."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, GCASCI
    from libdmet_preview_tpu.solvers.dmrg import BlockDMRG, Schedule
    from libdmet_preview_tpu.ops import spinless

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = tmp_path / "fake_block2"
    exe.write_text(FAKE % {"repo": repo})
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    nao, U = 3, 2.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    GH1_c, GH0 = spinless.transform_H1_k(((h[None]),
                                          (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(U / 2.0, nao)
    eye_basis = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye_basis[:, :nao, :],
                                            eye_basis[:, nao:, :], GV2)
    GHam = Integral(nso, True, False, GH0 + GV0 - U / 2.0 * nao,
                    {"cd": H1_so[None]}, {"ccdd": g_so[None]})

    nelec, nelecas, ncas = nao, nao - 1, nso - 1
    dmrg = BlockDMRG([sys.executable, str(exe), "{conf}"], max_M=400,
                     workdir=str(tmp_path / "wd"), restricted=False,
                     Sz=nelecas, spin_adapted=False, twopdm=False)
    dmrg.schedule = Schedule(sweep_tol=1e-8).gen_initial(100, 400)
    cas_dmrg = GCASCI(ncas=ncas, nelecas=nelecas, fcisolver=dmrg)
    rdm_d, E_d = cas_dmrg.run(GHam, nelec=nelec)

    cas_fci = GCASCI(ncas=ncas, nelecas=nelecas, tol=1e-12)
    rdm_f, E_f = cas_fci.run(GHam, nelec=nelec)
    assert abs(E_d - E_f) < 1e-7
    assert np.abs(np.asarray(rdm_d) - np.asarray(rdm_f)).max() < 1e-6
    assert abs(np.trace(rdm_d[0]) - nelec) < 1e-8
