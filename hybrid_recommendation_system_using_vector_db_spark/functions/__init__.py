from . import vector, texttools, hashing  # noqa: F401
