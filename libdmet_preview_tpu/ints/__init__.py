from libdmet_preview_tpu.ints import gto
