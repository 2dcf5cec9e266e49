from libdmet_preview_tpu.lo.lowdin import lowdin_orth, vec_lowdin, check_orthonormal
from libdmet_preview_tpu.lo.iao import get_iao, get_iao_virt
from libdmet_preview_tpu.lo.scdm import scdm
from libdmet_preview_tpu.lo.localize import localize_pm, localize_er
from libdmet_preview_tpu.lo.mo_match import (find_closest_mo, get_mo_ovlp,
                                             trans_mo)
from libdmet_preview_tpu.lo.wannier import (proj_wannier,
                                            get_C_ao_lo_wannier, W90)
