"""Impurity solvers (reference facade analog: solver/impurity_solver.py)."""
from libdmet_preview_tpu.solvers.fci import FCI
from libdmet_preview_tpu.solvers.scf import SCF, SCFSolver
from libdmet_preview_tpu.solvers.cc import CCSD, MP2, BCCSD
from libdmet_preview_tpu.solvers.casci import CASCI
from libdmet_preview_tpu.solvers.external import (
    ExternalFCIDUMPSolver, Block2Solver, SHCISolver)
