from cosa_tpu.native.build import load_native  # noqa: F401
