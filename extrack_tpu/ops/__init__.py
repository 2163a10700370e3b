from extrack_tpu.ops import pallas_engine  # noqa: F401
