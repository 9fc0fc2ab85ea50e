from zutis_tpu.ops.resize import interpolate, resize_2d  # noqa: F401
