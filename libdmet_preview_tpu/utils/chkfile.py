"""
Checkpoint / resume for the DMET self-consistency loop
(reference pattern: per-iteration np.save of
[Mu, last_dmu, vcor.param, rhoEmb, basis, rhoImp]
in examples/dmet/02-dmet-hchain.py:163-165 and the restart reader
dmet/HubbardBCS.py:152-175 -- promoted here to a first-class typed API).
"""

import os

import numpy as np

from libdmet_preview_tpu.utils import logger as log


def save_dmet_iter(filename, mu, last_dmu, vcor_param, rho_emb=None,
                   basis=None, rho_imp=None, extra=None):
    """Write one DMET iteration's restartable state to an npz file."""
    data = {"mu": np.asarray(mu), "last_dmu": np.asarray(last_dmu),
            "vcor_param": np.asarray(vcor_param)}
    if rho_emb is not None:
        data["rho_emb"] = np.asarray(rho_emb)
    if basis is not None:
        data["basis"] = np.asarray(basis)
    if rho_imp is not None:
        data["rho_imp"] = np.asarray(rho_imp)
    if extra:
        for k, v in extra.items():
            data["extra_" + k] = np.asarray(v)
    np.savez(filename, **data)


def load_dmet_iter(filename):
    """Read a DMET iteration checkpoint -> dict (missing keys absent)."""
    if not os.path.exists(filename):
        if os.path.exists(filename + ".npz"):
            filename = filename + ".npz"
        else:
            raise FileNotFoundError(filename)
    with np.load(filename) as f:
        out = {k: f[k] for k in f.files}
    return out


def restart_from_dmet_iter(vcor, filename):
    """Restore a Vcor object's parameters (+ returns mu, last_dmu)
    (reference HubbardBCS.restart_from_dmet_iter)."""
    data = load_dmet_iter(filename)
    vcor.update(np.asarray(data["vcor_param"]))
    log.info("DMET restart from %s: mu = %s, last_dmu = %s", filename,
             data["mu"], data["last_dmu"])
    return float(data["mu"]), float(data["last_dmu"])
