from libdmet_preview_tpu.lo.lowdin import lowdin_orth, vec_lowdin, check_orthonormal
from libdmet_preview_tpu.lo.iao import get_iao, get_iao_virt
from libdmet_preview_tpu.lo.scdm import scdm
from libdmet_preview_tpu.lo.localize import localize_pm, localize_er
