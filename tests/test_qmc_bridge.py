"""
SHCI / AFQMC / DQMC interface depth (solvers/qmc.py) without the real
binaries: FAKE executables read the generated inputs (FCIDUMP + JSON
config, sparse Hamiltonian dump, Cholesky h5) and write the full output
surface (result.json + RDM csv, measurement series, per-rank weighted
RDM files) solved with the in-process FCI -- exercising config writing,
subprocess launch, energy/RDM readback, reblocking statistics and the
mixed-estimator extrapolation end to end (reference needs real
Dice/Arrow/DQMC binaries: /root/reference/libdmet/solver/shci.py:35-430,
afqmc.py:11-400, dqmc.py:184-583).
"""

import os
import stat
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake(tmp_path, name, body):
    path = tmp_path / name
    path.write_text(textwrap.dedent("""\
        #!/usr/bin/env python
        import sys, os, json
        import numpy as np
        sys.path.insert(0, %r)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    """ % REPO) + textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def _ham(n=4, U=4.0):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    return hubbard_integral(n, U=U, restricted=True)


def test_blocking_analysis_ar1():
    """Reblocking on an AR(1) series recovers the TRUE error of the mean
    (sigma^2/N * (1+phi)/(1-phi)) while the naive block-1 estimate
    underestimates it by ~sqrt((1+phi)/(1-phi))."""
    from libdmet_preview_tpu.solvers.qmc import blocking_analysis
    rng = np.random.default_rng(0)
    phi, sig, N = 0.9, 1.0, 1 << 16
    eps = rng.normal(0, sig, N)
    x = np.empty(N)
    x[0] = eps[0]
    for t in range(1, N):
        x[t] = phi * x[t - 1] + eps[t]
    var_x = sig ** 2 / (1 - phi ** 2)
    true_err = np.sqrt(var_x / N * (1 + phi) / (1 - phi))
    mean, err, table = blocking_analysis(x)
    assert abs(mean) < 5 * true_err
    assert 0.7 * true_err < err < 1.4 * true_err
    naive = table[0][2]
    assert naive < 0.4 * true_err          # naive underestimates badly


def test_blocking_weighted_mean():
    """Weighted blocking: the mean is the weighted mean; constant series
    has zero error."""
    from libdmet_preview_tpu.solvers.qmc import blocking_analysis
    x = np.array([1.0, 3.0] * 32)
    w = np.array([3.0, 1.0] * 32)
    mean, err, _ = blocking_analysis(x, w)
    assert abs(mean - 1.5) < 1e-12
    m2, e2, _ = blocking_analysis(np.full(64, 2.5))
    assert abs(m2 - 2.5) < 1e-12 and e2 < 1e-12


def test_shci_fake_binary(tmp_path):
    """SHCI bridge: config.json + FCIDUMP written, result.json energy
    and 1rdm/2rdm csv read back; energies/RDMs match in-process FCI."""
    from libdmet_preview_tpu.solvers.qmc import SHCI
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.models.integral import restore_eri
    exe = _fake(tmp_path, "shci", """
        from libdmet_preview_tpu.models.integral import read_FCIDUMP
        from libdmet_preview_tpu.solvers.fci import FCI
        conf = json.load(open("config.json"))
        assert conf["system"] == "chem" and conf["get_1rdm_csv"]
        Ham = read_FCIDUMP("FCIDUMP")
        nelec = conf["n_up"] + conf["n_dn"]
        solver = FCI(restricted=True, tol=1e-12)
        rdm1, E = solver.run(Ham, nelec=nelec)
        json.dump({"energy_total": E, "n_dets": 123},
                  open("result.json", "w"))
        n = Ham.norb
        with open("1rdm.csv", "w") as f:
            f.write("i,j,val\\n")
            for i in range(n):
                for j in range(i + 1):
                    f.write("%d,%d,%.14g\\n" % (i, j, 2 * rdm1[0][i, j]))
        if conf.get("get_2rdm_csv"):
            G = solver.make_rdm2(Ham)[0]
            with open("2rdm.csv", "w") as f:
                f.write("p,q,r,s,val\\n")
                for p in range(n):
                    for q in range(n):
                        for r in range(n):
                            for s in range(n):
                                if abs(G[p, q, r, s]) > 1e-14:
                                    f.write("%d,%d,%d,%d,%.14g\\n"
                                            % (p, q, r, s, G[p, q, r, s]))
    """)
    Ham = _ham()
    solver = SHCI(executable=exe, workdir=str(tmp_path / "wd"),
                  restricted=True)
    rdm1, E = solver.run(Ham, nelec=4, calc_rdm2=True)
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    assert abs(E - E_fci) < 1e-9
    assert abs(np.trace(rdm1[0]) * 2 - 4) < 1e-8
    assert np.abs(rdm1[0] - rdm1[0].T).max() < 1e-12
    # rdm2 readback: energy reconstruction
    h1 = np.asarray(Ham.H1["cd"][0])
    g = restore_eri(np.asarray(Ham.H2["ccdd"][0]), Ham.norb, 1)
    E_rdm = (2.0 * np.einsum("pq, qp", h1, rdm1[0])
             + 0.5 * np.einsum("pqrs, pqrs", g, solver.twopdm[0])
             + float(Ham.H0))
    assert abs(E_rdm - E_fci) < 1e-8


def test_afqmc_fake_binary(tmp_path):
    """AFQMC bridge: sparse Hamiltonian + options dumped; the fake
    binary emits a correlated measurement series centered on the FCI
    energy and a cicj matrix dump; the bridge's blocking mean lands on
    the FCI energy within its own reported error bar."""
    from libdmet_preview_tpu.solvers.qmc import AFQMC
    from libdmet_preview_tpu.solvers import FCI
    exe = _fake(tmp_path, "afqmc", """
        from libdmet_preview_tpu.solvers.external import read_afqmc_ham
        from libdmet_preview_tpu.models.integral import Integral
        from libdmet_preview_tpu.solvers.fci import FCI
        H1, U, H0 = read_afqmc_ham("model_param.dat")
        n = H1.shape[-1]
        H2 = np.zeros((3, n, n, n, n))
        for i in range(n):
            H2[:, i, i, i, i] = U[i]
        Ham = Integral(n, False, False, H0, {"cd": H1}, {"ccdd": H2})
        opts = json.load(open("method_param.json"))
        solver = FCI(restricted=False, tol=1e-12)
        rdm1, E = solver.run(Ham, nelec=opts["nelec"])
        rng = np.random.default_rng(opts["seed"] % (2**31))
        N = 4096
        x = np.empty(N); x[0] = 0.0
        for t in range(1, N):
            x[t] = 0.8 * x[t - 1] + rng.normal(0, 0.05)
        with open("measurements.dat", "w") as f:
            f.write("# sweep energy weight\\n")
            for t in range(N):
                f.write("%d %.12f %.6f\\n" % (t, E + x[t],
                                              1.0 + 0.1 * rng.random()))
        with open("cicj.dat", "w") as f:
            f.write("# re im err\\n")
            for s in range(2):
                for i in range(n):
                    for j in range(n):
                        f.write("%.12f 0.0 1e-4\\n" % rdm1[s][i, j])
    """)
    Ham = _ham()
    solver = AFQMC(executable=exe, workdir=str(tmp_path / "wd"))
    rdm1, E = solver.run(Ham, nelec=4)
    _, E_fci = FCI(restricted=False, tol=1e-12).run(Ham, nelec=4)
    assert solver.e_err > 0
    assert abs(E - E_fci) < 6 * solver.e_err
    assert abs(E - E_fci) < 0.02
    assert rdm1.shape == (2, 4, 4)
    assert abs(np.trace(rdm1[0]) + np.trace(rdm1[1]) - 4) < 1e-6


def test_dqmc_fake_binary(tmp_path):
    """DQMC bridge: Cholesky h5 + JSON input dumped; per-rank weighted
    RDM files averaged correctly, hermitized, and the mixed-estimator
    extrapolation applied."""
    from libdmet_preview_tpu.solvers.qmc import DQMC
    from libdmet_preview_tpu.solvers import FCI
    exe = _fake(tmp_path, "DQMC", """
        import h5py
        from libdmet_preview_tpu.models.integral import Integral
        from libdmet_preview_tpu.solvers.fci import FCI
        conf = json.load(open(sys.argv[-1]))
        with h5py.File(conf["integrals"], "r") as f:
            n = int(f["norb"][()])
            L = f["chol"][()].reshape(-1, n, n)
            H1 = np.asarray([f["hcore_a"][()], f["hcore_b"][()]])
            e0 = float(f["e0"][()])
        g = np.einsum("xpq, xrs -> pqrs", L, L)
        Ham = Integral(n, False, False, e0, {"cd": H1},
                       {"ccdd": np.asarray([g, g, g])})
        solver = FCI(restricted=False, tol=1e-12)
        rdm1, E = solver.run(Ham, nelec=conf["nelec"])
        rng = np.random.default_rng(7)
        with open("samples.dat", "w") as f:
            for t in range(2048):
                f.write("%d %.12f 1.0\\n" % (t, E + rng.normal(0, 0.01)))
        # two ranks with different weights; rank RDMs biased +/- so only
        # the correct weighted average recovers the FCI rdm1
        d = 0.01 * np.eye(n); d[0, 1] = d[1, 0] = 0.004
        for s, tag in ((0, "up"), (1, "dn")):
            for rank, (w, sgn) in enumerate(((3.0, 1.0), (1.0, -3.0))):
                with open("rdm_%s_%d.dat" % (tag, rank), "w") as f:
                    f.write("%.6f\\n" % w)
                    np.savetxt(f, rdm1[s] + sgn * d)
    """)
    Ham = _ham()
    solver = DQMC(executable=exe, workdir=str(tmp_path / "wd"))
    rdm1, E = solver.run(Ham, nelec=4)
    fci = FCI(restricted=False, tol=1e-12)
    rdm1_fci, E_fci = fci.run(Ham, nelec=4)
    assert abs(E - E_fci) < 0.005
    # weighted average (3*(+d) + 1*(-3d))/4 = exact rdm1
    assert np.abs(rdm1 - np.asarray(rdm1_fci)).max() < 1e-8
    # extrapolation 2D - D_mf
    rdm1_x, _ = solver.run(Ham, nelec=4, rdm1_mf=rdm1_fci, extrap=True)
    assert np.abs(rdm1_x - np.asarray(rdm1_fci)).max() < 1e-8
