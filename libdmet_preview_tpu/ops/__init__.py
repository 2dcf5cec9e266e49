from libdmet_preview_tpu.ops import fourier
