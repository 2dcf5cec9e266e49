"""
libdmet_preview_tpu: a TPU-native density-matrix-embedding-theory (DMET) framework.

Brand-new implementation of the capabilities of gkclab/libdmet_preview
(reference layout: /root/reference/libdmet), re-architected for TPU:

  * all per-k-point loops are batched (vmap) `eigh`/`svd`/einsum calls that XLA
    tiles onto the MXU,
  * k<->R transforms are `jnp.fft` over the cell axes,
  * the correlation-potential fit is a differentiable least-squares with an
    analytic occ-virt perturbation gradient evaluated on device,
  * impurity solvers (FCI, CCSD, SCF) are jit-compiled amplitude/sigma
    iterations instead of external C kernels,
  * multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` over the k-point
    axis (replacing the reference's MPI pool, eri_transform_mpi.py / mfd_mpi.py).

DMET works in float64 (energies to 1e-7 Ha); x64 mode is enabled at import.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from libdmet_preview_tpu import utils
from libdmet_preview_tpu import models
from libdmet_preview_tpu import ops
from libdmet_preview_tpu import solvers
from libdmet_preview_tpu import dmet
from libdmet_preview_tpu import lo
from libdmet_preview_tpu import ints
from libdmet_preview_tpu import parallel
