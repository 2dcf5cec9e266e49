from libdmet_preview_tpu.utils import logger
from libdmet_preview_tpu.utils.misc import (
    max_abs, mdot, add_spin_dim, Iterable, pack_tril, unpack_tril,
    tril_diag_indices, triu_diag_indices, format_idx,
)
from libdmet_preview_tpu.utils import analysis
from libdmet_preview_tpu.utils import chkfile
from libdmet_preview_tpu.utils import config
from libdmet_preview_tpu.utils import profile
from libdmet_preview_tpu.utils import iotools
from libdmet_preview_tpu.utils import extrapolate
from libdmet_preview_tpu.utils import dca
