from libdmet_preview_tpu.parallel import kmesh
