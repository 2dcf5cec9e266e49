from libdmet_preview_tpu.solvers.fci import FCI
