"""Impurity solvers (reference facade analog: solver/impurity_solver.py)."""
from libdmet_preview_tpu.solvers.fci import FCI
from libdmet_preview_tpu.solvers.scf import SCF, SCFSolver, GGHF, GGHF_mu
from libdmet_preview_tpu.solvers.cc import (LCCSD, LCCD, CCSD_ITE,
    CCSD, CCD, MP2, BCCSD, TCCSD, RCCSD, UCCSD, GCCSD, UCCD, GCCD,
    UTCCSD, GTCCSD)
from libdmet_preview_tpu.solvers.oo import OOMP2, OOCCD
from libdmet_preview_tpu.solvers.casci import (CASCI, CASSCF, UCASCI,
                                               UCASSCF, GCASCI, GCASSCF,
                                               project_active_space)
from libdmet_preview_tpu.solvers.dmrg import BlockDMRG, Schedule
from libdmet_preview_tpu.solvers.external import (
    ExternalFCIDUMPSolver, Block2Solver, SHCISolver, AFQMCSolver,
    DQMCSolver)
from libdmet_preview_tpu.solvers.gw import get_vsig_emb
from libdmet_preview_tpu.solvers.ksdft import RKS, UKS
