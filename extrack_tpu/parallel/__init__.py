from extrack_tpu.parallel import mesh  # noqa: F401
