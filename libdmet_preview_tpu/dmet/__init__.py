from libdmet_preview_tpu.dmet import hubbard as Hubbard
