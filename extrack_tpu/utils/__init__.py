from extrack_tpu.utils import observe  # noqa: F401
