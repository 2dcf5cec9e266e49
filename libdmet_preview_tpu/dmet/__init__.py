from libdmet_preview_tpu.dmet import hubbard as Hubbard
from libdmet_preview_tpu.dmet import hubbard_gso as HubbardGSO
from libdmet_preview_tpu.dmet import hubbard_bcs as HubbardBCS
from libdmet_preview_tpu.dmet import quad_fit
from libdmet_preview_tpu.dmet.loop import run_dmet, DmetResult
