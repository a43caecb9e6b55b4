from keymorph_tpu.ops import coords, resample  # noqa: F401
