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
    # Self-contained fake Block binary: parses dmrg.conf + FCIDUMP and
    # solves the problem with an INDEPENDENT dense numpy FCI (no jax, no
    # package import -- a genuine cross-check of the bridge, and ~10 s
    # faster per call than importing the library stack).
    import sys, os, re, itertools
    import numpy as np

    conf_path = sys.argv[-1]
    conf = open(conf_path).read()
    nelec = int(re.search(r"nelec (\\d+)", conf).group(1))
    spin = int(re.search(r"spin (\\d+)", conf).group(1))
    assert "schedule" in conf and "sweep_tol" in conf
    assert "onepdm" in conf
    fcidump = re.search(r"orbitals (.*)", conf).group(1).strip()
    prefix = re.search(r"prefix (.*)", conf).group(1).strip()

    # --- minimal FCIDUMP reader (chemist notation, 8-fold symm) ---
    txt = open(fcidump).read()
    m = re.search(r"NORB\\s*=\\s*(\\d+)", txt)
    norb = int(m.group(1))
    body = txt[txt.upper().index("&END") + 4:].split()
    h1 = np.zeros((norb, norb))
    eri = np.zeros((norb,) * 4)
    ecore = 0.0
    for off in range(0, len(body), 5):
        v, i, j, k, l = (float(body[off]),) + tuple(
            int(x) for x in body[off + 1:off + 5])
        if i == j == k == l == 0:
            ecore = v
        elif k == l == 0:
            p, q = i - 1, j - 1
            h1[p, q] = h1[q, p] = v
        else:
            p, q, r, s = i - 1, j - 1, k - 1, l - 1
            for (a, b) in ((p, q), (q, p)):
                for (c, d) in ((r, s), (s, r)):
                    eri[a, b, c, d] = eri[c, d, a, b] = v

    # --- dense FCI over (na, nb) determinants ---
    na = (nelec + spin) // 2
    nb = nelec - na
    def strings(n, k):
        return [frozenset(c) for c in itertools.combinations(range(n), k)]
    SA, SB = strings(norb, na), strings(norb, nb)
    det = [(a, b) for a in SA for b in SB]
    idx = {d: i for i, d in enumerate(det)}
    nd = len(det)

    def sign_excite(occ, p, q):
        # remove q, add p in the SORTED occupation list; fermion sign
        occ = sorted(occ)
        iq = occ.index(q)
        occ2 = occ[:iq] + occ[iq + 1:]
        ip = sum(1 for x in occ2 if x < p)
        return (-1) ** (iq + ip), frozenset(occ2 + [p])

    H = np.zeros((nd, nd))
    for I, (a, b) in enumerate(det):
        # diagonal
        e = sum(h1[p, p] for p in a) + sum(h1[p, p] for p in b)
        occs = [(a, a), (b, b)]
        for p in a:
            for q in a:
                e += 0.5 * (eri[p, p, q, q] - eri[p, q, q, p])
            for q in b:
                e += eri[p, p, q, q]
        for p in b:
            for q in b:
                e += 0.5 * (eri[p, p, q, q] - eri[p, q, q, p])
        H[I, I] = e
        # single excitations (same spin channel)
        for chan, occ, other in (("a", a, b), ("b", b, a)):
            for q in occ:
                for p in range(norb):
                    if p in occ:
                        continue
                    sgn, occ2 = sign_excite(occ, p, q)
                    d2 = (occ2, b) if chan == "a" else (a, occ2)
                    J = idx[d2]
                    val = h1[p, q]
                    for r in occ:
                        if r == q:
                            continue
                        val += eri[p, q, r, r] - eri[p, r, r, q]
                    for r in other:
                        val += eri[p, q, r, r]
                    H[J, I] += sgn * val
        # double excitations: same-spin (aa, bb)
        for chan, occ in (("a", a), ("b", b)):
            for q in occ:
                for s in occ:
                    if s <= q:
                        continue
                    for p in range(norb):
                        if p in occ:
                            continue
                        for r in range(norb):
                            if r in occ or r <= p:
                                continue
                            s1, o1 = sign_excite(occ, p, q)
                            s2, o2 = sign_excite(o1, r, s)
                            d2 = (o2, b) if chan == "a" else (a, o2)
                            J = idx[d2]
                            val = eri[p, q, r, s] - eri[r, q, p, s]
                            H[J, I] += s1 * s2 * val
        # opposite-spin doubles
        for q in a:
            for p in range(norb):
                if p in a:
                    continue
                s1, a2 = sign_excite(a, p, q)
                for s in b:
                    for r in range(norb):
                        if r in b:
                            continue
                        s2, b2 = sign_excite(b, r, s)
                        J = idx[(a2, b2)]
                        H[J, I] += s1 * s2 * eri[p, q, r, s]

    ew, ev = np.linalg.eigh(H)
    e = ew[0] + ecore
    c = ev[:, 0]
    # spin-resolved 1-pdm <p+ q>
    rdm_a = np.zeros((norb, norb))
    rdm_b = np.zeros((norb, norb))
    for I, (a, b) in enumerate(det):
        for p in a:
            rdm_a[p, p] += c[I] * c[I]
        for p in b:
            rdm_b[p, p] += c[I] * c[I]
        for chan, occ in (("a", a), ("b", b)):
            for q in occ:
                for p in range(norb):
                    if p in occ:
                        continue
                    sgn, occ2 = sign_excite(occ, p, q)
                    d2 = (occ2, b) if chan == "a" else (a, occ2)
                    J = idx[d2]
                    if chan == "a":
                        rdm_a[p, q] += sgn * c[J] * c[I]
                    else:
                        rdm_b[p, q] += sgn * c[J] * c[I]

    so = np.zeros((2 * norb, 2 * norb))
    so[::2, ::2] = rdm_a
    so[1::2, 1::2] = rdm_b
    os.makedirs(os.path.join(prefix, "node0"), exist_ok=True)
    with open(os.path.join(prefix, "node0", "onepdm.0.0.bin"), "wb") as f:
        f.write(b"HDR!")               # binary reader takes the TAIL
        f.write(so.astype(np.float64).tobytes())

    if "twopdm" in conf:
        # 2-pdm via dense operator matrices A_pq = p+ q per channel:
        # same-spin chemist G[p,q,r,s] = <p+q r+s> - d_qr <p+s>,
        # opposite-spin G_ab[p,q,r,s] = <p+q_a r+s_b> (channels commute)
        def op_mats(chan):
            A = np.zeros((norb, norb, nd, nd))
            for I, (a, b) in enumerate(det):
                occ = a if chan == "a" else b
                for q in occ:
                    A[q, q, I, I] += 1.0
                    for p in range(norb):
                        if p in occ:
                            continue
                        sgn, occ2 = sign_excite(occ, p, q)
                        d2 = (occ2, b) if chan == "a" else (a, occ2)
                        A[p, q, idx[d2], I] += sgn
            return A
        Aa, Ab = op_mats("a"), op_mats("b")
        ca = np.einsum("pqJI, I -> pqJ", Aa, c)     # A_pq |c>
        cb = np.einsum("pqJI, I -> pqJ", Ab, c)
        caT = np.einsum("pqJI, J -> pqI", Aa, c)    # A_pq^T |c>
        cbT = np.einsum("pqJI, J -> pqI", Ab, c)
        r1a = np.einsum("J, pqJ -> pq", c, ca)
        r1b = np.einsum("J, pqJ -> pq", c, cb)
        Gaa = (np.einsum("pqJ, rsJ -> pqrs", caT, ca)
               - np.einsum("qr, ps -> pqrs", np.eye(norb), r1a))
        Gbb = (np.einsum("pqJ, rsJ -> pqrs", cbT, cb)
               - np.einsum("qr, ps -> pqrs", np.eye(norb), r1b))
        if nb == 0:
            out2 = Gaa[None]           # single-species (GSO) block
        else:
            Gab = np.einsum("pqJ, rsJ -> pqrs", caT, cb)
            out2 = np.stack([Gaa, Gbb, Gab])
        np.save(os.path.join(prefix, "2pdm.npy"), out2)
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


def test_gso_dmrgscf_composition_with_fake_executable(tmp_path):
    """GCASSCF with the Block bridge as active-space solver (reference
    gmc1step.py DMRG-SCF + bcs_dmrgscf.py roles): the orbital-optimized
    GSO CAS problem re-dumps an all-alpha FCIDUMP each macro iteration,
    the fake binary returns energy + 1/2-pdms, and the converged result
    matches the in-process GHF-FCI GCASSCF."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import GCASSCF
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

    nelec, nelecas, ncas = nao, nao - 1, nso - 2
    dmrg = BlockDMRG([sys.executable, str(exe), "{conf}"], max_M=400,
                     workdir=str(tmp_path / "wd"), restricted=False,
                     Sz=nelecas, spin_adapted=False, twopdm=True)
    dmrg.schedule = Schedule(sweep_tol=1e-8).gen_initial(100, 400)
    scf_dmrg = GCASSCF(ncas=ncas, nelecas=nelecas, fcisolver=dmrg,
                       tol=1e-6, max_cycle=8)
    rdm_d, E_d = scf_dmrg.run(GHam, nelec=nelec)

    scf_fci = GCASSCF(ncas=ncas, nelecas=nelecas, tol=1e-6, max_cycle=8)
    rdm_f, E_f = scf_fci.run(GHam, nelec=nelec)
    assert abs(E_d - E_f) < 1e-6
    assert np.abs(np.asarray(rdm_d) - np.asarray(rdm_f)).max() < 1e-5
    assert abs(np.trace(rdm_d[0]) - nelec) < 1e-7
