from extrack_tpu.core import gaussian, tables, engine, oracle  # noqa: F401
