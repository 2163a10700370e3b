# tests/ is a package so `from tests.test_engine import ...` resolves under
# BOTH `python -m pytest` (repo root on sys.path) and a bare `pytest`
# invocation (pytest inserts the package's parent — the repo root).
